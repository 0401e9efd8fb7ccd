"""Optimizers: AdamW + linear warmup/decay with per-regime param freezing.

The reference selects one of three optimizer factories by config
(avsl/whisper_flamingo_ft_ami.py:642-651):

* ``whisper_optimizer`` — all parameters, AdamW, warmup + linear decay;
* ``whisper_video_projection_optimizer`` — only video-projection params;
* ``whisper_flamingo_projection_optimizer`` — gated cross-attention
  sublayers + video projection (the add_gated_x_attn regime, which also
  freezes the AV-HuBERT video model and everything in the encoder except
  the projection — whisper_flamingo_ft_ami.py:506-517).

TPU-native expression: ``optax.multi_transform`` over path-derived labels;
frozen groups get ``optax.set_to_zero()`` so the whole step stays one jit
program (no requires_grad mutation)."""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, Sequence, Tuple

import jax
import optax

TRAIN = "train"
FROZEN = "frozen"

# param-path patterns (regex, matched against "/"-joined path)
VIDEO_MODEL_PATTERNS = (r"video_model", r"visual_encoder")
VIDEO_PROJECTION_PATTERNS = (r"video_projection",)
GATED_X_ATTN_PATTERNS = (r"x_attn", r"x_mlp")


def _path_str(path: Tuple) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def label_params(params: Any, trainable_patterns: Sequence[str],
                 frozen_patterns: Sequence[str] = ()) -> Any:
    """Label each param TRAIN/FROZEN. A param trains iff it matches a
    trainable pattern and no frozen pattern (frozen wins)."""
    t_res = [re.compile(p) for p in trainable_patterns]
    f_res = [re.compile(p) for p in frozen_patterns]

    def label(path, _):
        s = _path_str(path)
        if any(r.search(s) for r in f_res):
            return FROZEN
        if any(r.search(s) for r in t_res):
            return TRAIN
        return FROZEN

    return jax.tree_util.tree_map_with_path(label, params)


def linear_warmup_decay(lr: float, warmup_steps: int, total_steps: int) -> optax.Schedule:
    """Linear warmup to ``lr`` then linear decay to 0 at ``total_steps``."""
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
            optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1)),
        ],
        boundaries=[max(warmup_steps, 1)],
    )


def _adamw(cfg, t_total: int) -> optax.GradientTransformation:
    sched = linear_warmup_decay(
        float(cfg.learning_rate), int(cfg.warmup_steps), int(t_total)
    )
    return optax.chain(
        optax.clip_by_global_norm(getattr(cfg, "clip_norm", 1.0) or 1.0),
        optax.adamw(
            sched,
            b1=0.9,
            b2=getattr(cfg, "adam_beta2", 0.999),
            eps=float(getattr(cfg, "adam_epsilon", 1e-8)),
            weight_decay=float(getattr(cfg, "weight_decay", 0.01)),
        ),
    )


def _partitioned(optimizer: optax.GradientTransformation, labels: Any):
    return optax.multi_transform(
        {TRAIN: optimizer, FROZEN: optax.set_to_zero()}, labels
    )


def whisper_optimizer(params: Any, cfg, t_total: int):
    """All-params AdamW (optionally still freezing the video model)."""
    frozen = VIDEO_MODEL_PATTERNS if getattr(cfg, "freeze_video_model", False) else ()
    labels = label_params(params, trainable_patterns=(r".*",), frozen_patterns=frozen)
    return _partitioned(_adamw(cfg, t_total), labels), labels


def whisper_video_projection_optimizer(params: Any, cfg, t_total: int):
    """Train only the video projection (video_projection_train_only)."""
    labels = label_params(params, trainable_patterns=VIDEO_PROJECTION_PATTERNS)
    return _partitioned(_adamw(cfg, t_total), labels), labels


def whisper_flamingo_projection_optimizer(params: Any, cfg, t_total: int):
    """Train gated x-attn sublayers + video projection; freeze the rest
    (including the AV-HuBERT video model)."""
    labels = label_params(
        params,
        trainable_patterns=GATED_X_ATTN_PATTERNS + VIDEO_PROJECTION_PATTERNS,
        frozen_patterns=VIDEO_MODEL_PATTERNS,
    )
    return _partitioned(_adamw(cfg, t_total), labels), labels


def lora_optimizer(lora_params: Any, cfg, t_total: int):
    """LoRA regime (models/lora.py): the optimizer sees ONLY the adapter
    tree, so every adapter leaf trains and Adam mirrors exist only at
    adapter size — freezing the base is structural, not a set_to_zero
    mask. Weight decay is disabled (decaying A/B decays the *delta*
    toward zero, which is the LoRA-paper convention for adapters)."""
    sched = linear_warmup_decay(
        float(cfg.learning_rate), int(cfg.warmup_steps), int(t_total)
    )
    tx = optax.chain(
        optax.clip_by_global_norm(getattr(cfg, "clip_norm", 1.0) or 1.0),
        optax.adamw(
            sched,
            b1=0.9,
            b2=getattr(cfg, "adam_beta2", 0.999),
            eps=float(getattr(cfg, "adam_epsilon", 1e-8)),
            weight_decay=0.0,
        ),
    )
    labels = jax.tree_util.tree_map(lambda _: TRAIN, lora_params)
    return tx, labels


def select_optimizer(params: Any, cfg, t_total: int):
    """Regime selection mirroring configure_optimizers (reference :642-651)."""
    if getattr(cfg, "add_gated_x_attn", 0):
        return whisper_flamingo_projection_optimizer(params, cfg, t_total)
    if getattr(cfg, "video_projection_train_only", False):
        return whisper_video_projection_optimizer(params, cfg, t_total)
    return whisper_optimizer(params, cfg, t_total)

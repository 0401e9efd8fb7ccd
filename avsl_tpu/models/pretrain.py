"""HuBERT-style masked-cluster pretraining for the AV-HuBERT encoder.

The reference repo consumes fairseq-PRETRAINED AV-HuBERT checkpoints
(reference avsl/modules/av_hubert_model.py:154-233 loads them; its run
logs show logit_temp=0.1, sim_type=cosine, skip_masked/skip_nomask=false)
but the pretraining objective itself lives in the external fairseq
package — a user of the reference cannot pretrain from scratch with the
reference repo alone. This module closes that gap with a TPU-first
re-design of the published AV-HuBERT pretraining recipe:

- per-frame cluster targets (e.g. k-means over MFCC/logfbank features —
  see :mod:`avsl_tpu.data.clustering`), one or more target groups;
- span-mask the fused audio+video features and replace masked frames with
  the learned ``mask_emb`` (the same static-shape :func:`span_mask` the
  fine-tune path uses — no dynamic shapes under jit);
- project transformer output to ``final_dim`` per target group
  (``untie_final_proj`` gives each group its own projection slice);
- logits = cosine-similarity(projection, codebook embedding) / logit_temp
  over each group's cluster codebook — one [B, T, C] matmul per group,
  MXU-shaped, no per-position gather of negatives;
- cross-entropy on masked frames (and optionally unmasked frames), plus
  an L2 feature penalty on the pre-projection fused features.

Everything is static-shape: masked/unmasked selection is by weighting,
never boolean indexing, so the whole step jits once per batch geometry.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from avsl_tpu.core.config import AVHuBERTConfig
from avsl_tpu.models.avhubert import AVHuBERTModel, span_mask

__all__ = [
    "AVHuBERTForPretraining",
    "pretrain_loss",
]


class AVHuBERTForPretraining(nn.Module):
    """Encoder + masked-cluster prediction head.

    ``num_classes`` holds the cluster-codebook size of each target group
    (the published recipe uses one group, e.g. 500 AV-HuBERT clusters or
    100 MFCC k-means clusters for iteration 1).

    ``__call__`` returns a dict with one ``[B, T, C_g]`` float32 logit
    array per group (tuple ``logits``), the boolean time mask that was
    applied (``mask`` — drawn internally from the ``mask`` rng stream
    unless supplied), and the targets truncated to the logit length.
    The loss itself is :func:`pretrain_loss` (kept separate so eval can
    reuse the forward without re-tracing).
    """

    cfg: AVHuBERTConfig
    num_classes: Tuple[int, ...] = (500,)

    def setup(self):
        cfg = self.cfg
        self.avhubert = AVHuBERTModel(cfg, name="avhubert")
        n_groups = len(self.num_classes)
        out_dim = cfg.final_dim * n_groups if cfg.untie_final_proj else cfg.final_dim
        self.final_proj = nn.Dense(
            out_dim,
            dtype=jnp.dtype(cfg.dtype),
            param_dtype=jnp.dtype(cfg.param_dtype),
            name="final_proj",
        )
        # fairseq initialises label_embs_concat with nn.init.uniform_
        # (U[0,1)); kept for init-distribution parity.
        self.label_embs = self.param(
            "label_embs",
            nn.initializers.uniform(scale=1.0),
            (sum(self.num_classes), cfg.final_dim),
            jnp.dtype(cfg.param_dtype),
        )

    def _group_logits(self, proj: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """Per-group similarity logits. proj: [B, T, final_dim * G or final_dim]."""
        cfg = self.cfg
        n_groups = len(self.num_classes)
        logits = []
        emb_start = 0
        for g, n_cls in enumerate(self.num_classes):
            if cfg.untie_final_proj:
                p = proj[..., g * cfg.final_dim : (g + 1) * cfg.final_dim]
            else:
                p = proj
            emb = self.label_embs[emb_start : emb_start + n_cls].astype(jnp.float32)
            p = p.astype(jnp.float32)
            if cfg.sim_type == "cosine":
                p = p / jnp.maximum(
                    jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-8
                )
                emb = emb / jnp.maximum(
                    jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8
                )
            elif cfg.sim_type != "dot":
                raise ValueError(f"Unknown sim_type {cfg.sim_type!r}")
            logits.append(jnp.einsum("btd,cd->btc", p, emb) / cfg.logit_temp)
            emb_start += n_cls
        return tuple(logits)

    def __call__(
        self,
        audio: Optional[jnp.ndarray] = None,
        video: Optional[jnp.ndarray] = None,
        targets: Optional[jnp.ndarray] = None,  # [B, T] or [B, T, G] int
        padding_mask: Optional[jnp.ndarray] = None,  # [B, T] 1 = valid
        audio_present: Optional[jnp.ndarray] = None,
        video_present: Optional[jnp.ndarray] = None,
        feature_mask: Optional[jnp.ndarray] = None,  # [B, T] True = masked
        deterministic: bool = False,
        use_running_average: Optional[bool] = None,
    ) -> dict:
        cfg = self.cfg
        src = audio if audio is not None else video
        b, t_in = src.shape[0], src.shape[1]

        channel_mask = None
        if feature_mask is None:
            # Draw the span mask here (not inside AVHuBERTModel) so the
            # loss can see exactly which frames were masked. Same
            # per-modality probabilities as the fine-tune masking path.
            feature_mask = span_mask(
                self.make_rng("mask"),
                b,
                t_in,
                cfg.mask_prob_audio if audio is not None else cfg.mask_prob_image,
                cfg.mask_length_audio if audio is not None else cfg.mask_length_image,
                padding_mask,
            )
            if cfg.mask_feature_prob > 0.0 and not deterministic:
                channel_mask = span_mask(
                    self.make_rng("mask"),
                    b,
                    cfg.hidden_size,
                    cfg.mask_feature_prob,
                    cfg.mask_feature_length,
                    None,
                )

        x = self.avhubert(
            audio=audio,
            video=video,
            padding_mask=padding_mask,
            audio_present=audio_present,
            video_present=video_present,
            feature_mask=feature_mask,
            channel_mask=channel_mask,
            deterministic=deterministic,
            use_running_average=use_running_average,
        )  # [B, T', hidden]

        proj = self.final_proj(x)
        logits = self._group_logits(proj)

        t_out = x.shape[1]
        out = {
            "logits": logits,
            "mask": feature_mask[:, :t_out],
            "padding_mask": None if padding_mask is None else padding_mask[:, :t_out],
        }
        if targets is not None:
            if targets.ndim == 2:
                targets = targets[..., None]
            out["targets"] = targets[:, :t_out, :]
        return out


def pretrain_loss(
    outputs: dict,
    cfg: AVHuBERTConfig,
    targets: Optional[jnp.ndarray] = None,
    masked_weight: float = 1.0,
    nomask_weight: float = 1.0,
    feature_pen: Optional[jnp.ndarray] = None,
    feature_pen_weight: float = 10.0,
) -> Tuple[jnp.ndarray, dict]:
    """Masked + unmasked cluster-prediction CE (fairseq HubertCriterion
    semantics: ``pred_masked_weight`` / ``pred_nomask_weight``, the
    ``skip_masked`` / ``skip_nomask`` gates, and ``loss_weights=[10]`` on
    the feature penalty).

    Reductions are means over the selected positions (fairseq reduces a
    sum and divides by sample size at logging time; the per-step
    *gradient* direction matches up to the global scale).

    Returns ``(loss, metrics)`` where metrics carries ``loss_m``,
    ``loss_u``, ``acc_m``, ``acc_u`` and ``features_pen``.
    """
    if targets is None:
        targets = outputs["targets"]
    if targets.ndim == 2:
        targets = targets[..., None]
    mask = outputs["mask"].astype(bool)
    padding = outputs["padding_mask"]
    valid = (
        jnp.ones_like(mask) if padding is None else padding.astype(bool)
    )
    m_sel = (mask & valid).astype(jnp.float32)  # [B, T]
    u_sel = ((~mask) & valid).astype(jnp.float32)

    def _group_ce(logits_g: jnp.ndarray, tgt_g: jnp.ndarray, sel: jnp.ndarray):
        logp = jax.nn.log_softmax(logits_g.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, tgt_g[..., None], axis=-1)[..., 0]
        denom = jnp.maximum(jnp.sum(sel), 1.0)
        ce = jnp.sum(nll * sel) / denom
        acc = jnp.sum((jnp.argmax(logits_g, axis=-1) == tgt_g) * sel) / denom
        return ce, acc

    loss_m = loss_u = jnp.zeros((), jnp.float32)
    acc_m = acc_u = jnp.zeros((), jnp.float32)
    n_groups = len(outputs["logits"])
    for g, logits_g in enumerate(outputs["logits"]):
        tgt_g = targets[..., g]
        if not cfg.skip_masked:
            ce, acc = _group_ce(logits_g, tgt_g, m_sel)
            loss_m += ce
            acc_m += acc / n_groups
        if not cfg.skip_nomask:
            ce, acc = _group_ce(logits_g, tgt_g, u_sel)
            loss_u += ce
            acc_u += acc / n_groups

    loss = masked_weight * loss_m + nomask_weight * loss_u
    metrics = {
        "loss_m": loss_m,
        "loss_u": loss_u,
        "acc_m": acc_m,
        "acc_u": acc_u,
    }
    if feature_pen is not None:
        pen = jnp.mean(jnp.square(feature_pen.astype(jnp.float32)))
        loss = loss + feature_pen_weight * pen
        metrics["features_pen"] = pen
    return loss, metrics


def extract_layer_features(
    model: "AVHuBERTForPretraining",
    variables: dict,
    layer: int,
    audio: Optional[jnp.ndarray] = None,
    video: Optional[jnp.ndarray] = None,
    padding_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Unmasked layer-``layer`` hidden states ``[B, T, D]`` from a
    (partially) pretrained model — the HuBERT iteration-2+ recipe's
    clustering features (fairseq ``dump_hubert_feature.py``:
    ``extract_features(..., output_layer=k)``, 1-indexed, no final LN)."""
    var = {"params": variables["params"] if "params" in variables else variables}
    if isinstance(variables, dict) and "batch_stats" in variables:
        var["batch_stats"] = variables["batch_stats"]

    def _tap(m):
        return m.avhubert(
            audio=audio, video=video, padding_mask=padding_mask,
            deterministic=True, output_layer=layer,
        )

    return model.apply(var, method=_tap)


def extracted_features_from(intermediates: dict) -> Optional[jnp.ndarray]:
    """Pull the encoder wrapper's sown pre-projection fused features out of
    an ``intermediates`` collection (first occurrence), or None."""
    from collections.abc import Mapping

    def _walk(node):
        if isinstance(node, Mapping):
            for k, v in node.items():
                if k == "extracted_features":
                    return v[0] if isinstance(v, (tuple, list)) else v
                found = _walk(v)
                if found is not None:
                    return found
        return None

    return _walk(intermediates)

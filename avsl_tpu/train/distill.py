"""Draft-model distillation for speculative decoding.

Speculative decoding (decode/speculative.py) needs a draft model whose
greedy choices track the target's; a randomly initialized draft decodes
*correctly* (verification rejects everything) but wastes every draft
forward. This module distills a small audio-only Whisper draft from the
target by **self-labeling**: the target greedy-decodes unlabeled audio,
then the draft is trained to match the target's full teacher-forced
next-token distributions along those exact trajectories — the
distribution speculative decoding will query it on. No transcripts
needed; any audio the serving traffic resembles works.

No reference equivalent (the reference has no speculative decoding and
no distillation). TPU-shaped: one jitted label program (target decode +
teacher-forced log-probs, no grads) and one jitted train step (draft
forward + KL, grads only through the draft); both static-shape.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from avsl_tpu.train.loop import TrainState


def make_label_fn(
    target_model, target_variables, max_new_tokens: int, eot_id: int
) -> Callable:
    """Build the jitted self-labeling program.

    Returns ``label_fn(audio [B, S], prompt [B, P]) ->
    (tokens [B, P+N], t_logprob [B, P-1+N, V] f32, valid [B, P-1+N])``:
    the target's greedy continuation, its teacher-forced next-token
    log-probabilities along the full sequence, and the position mask the
    draft is trained on (generated positions up to & incl. the first
    EOT — prompt-internal positions are forced at serve time and never
    queried).
    """
    from avsl_tpu.decode import greedy_decode
    from avsl_tpu.kernels import log_mel_spectrogram

    cfg = target_model.cfg

    @jax.jit
    def label_fn(audio, prompt):
        mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
        feats, _ = target_model.apply(
            target_variables, mel, None, method=target_model.encode
        )
        p = prompt.shape[1]
        cache = target_model.apply(
            target_variables, feats, None, p + max_new_tokens + 2,
            method=target_model.init_decode_cache,
        )

        def step(tok, c):
            return target_model.apply(
                target_variables, tok, None, None, c,
                method=target_model.decode,
            )

        gen = greedy_decode(step, cache, prompt, max_new_tokens, eot_id)
        tokens = jnp.concatenate([prompt, gen], axis=1)  # [B, P+N]
        logits, _ = target_model.apply(
            target_variables, tokens[:, :-1], feats, None,
            method=target_model.decode,
        )
        t_logprob = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        return tokens, t_logprob, valid_positions(tokens, p, eot_id)

    return label_fn


def make_greedy_label_fn(
    target_model, target_variables, max_new_tokens: int, eot_id: int
) -> Callable:
    """Token-only labeling: ``(audio, prompt) -> tokens [B, P+N]`` — the
    expensive part of :func:`make_label_fn` (the N-step greedy decode)
    without the teacher-forced log-prob pass. Labels are deterministic
    per clip, so the CLI runs this ONCE per corpus clip and caches the
    tokens; the online distill step recomputes the target distribution
    in a single forward per step instead."""
    from avsl_tpu.decode import greedy_decode
    from avsl_tpu.kernels import log_mel_spectrogram

    cfg = target_model.cfg

    @jax.jit
    def label_fn(audio, prompt):
        mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
        feats, _ = target_model.apply(
            target_variables, mel, None, method=target_model.encode
        )
        cache = target_model.apply(
            target_variables, feats, None,
            prompt.shape[1] + max_new_tokens + 2,
            method=target_model.init_decode_cache,
        )

        def step(tok, c):
            return target_model.apply(
                target_variables, tok, None, None, c,
                method=target_model.decode,
            )

        gen = greedy_decode(step, cache, prompt, max_new_tokens, eot_id)
        return jnp.concatenate([prompt, gen], axis=1)

    return label_fn


def valid_positions(
    tokens: jnp.ndarray, prompt_len: int, eot_id: int
) -> jnp.ndarray:
    """Training-position mask for a labeled sequence [B, P+N]: generated
    positions (>= P-1) up to & including the one predicting the first
    EOT. Returns [B, P+N-1] bool."""
    pred = tokens[:, 1:]
    is_eot = (pred == eot_id).astype(jnp.int32)
    eot_before = jnp.cumsum(is_eot, axis=1) - is_eot
    pos = jnp.arange(pred.shape[1])[None, :]
    return (pos >= prompt_len - 1) & (eot_before == 0)


def distill_loss_fn(
    draft_model,
    draft_params,
    draft_extra: Dict[str, Any],
    audio: jnp.ndarray,
    tokens: jnp.ndarray,
    t_logprob: jnp.ndarray,
    valid: jnp.ndarray,
    hard_weight: float = 0.5,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """KL(target ‖ draft) + ``hard_weight`` × CE on the target's greedy
    tokens, masked to ``valid`` positions. The CE term directly optimizes
    what acceptance measures (argmax agreement); the KL term transfers
    the full distribution. Also reports ``agree`` (masked argmax-match
    rate — the offline proxy for the speculative acceptance rate)."""
    from avsl_tpu.kernels import log_mel_spectrogram

    mel = log_mel_spectrogram(audio, n_mels=draft_model.cfg.n_mels)
    variables = {"params": draft_params, **draft_extra}
    feats, _ = draft_model.apply(variables, mel, None, method=draft_model.encode)
    logits, _ = draft_model.apply(
        variables, tokens[:, :-1], feats, None, method=draft_model.decode
    )
    d_logprob = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    t_logprob = jax.lax.stop_gradient(t_logprob)
    w = valid.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w), 1.0)

    kl = jnp.sum(jnp.exp(t_logprob) * (t_logprob - d_logprob), axis=-1)
    kl = jnp.sum(kl * w) / denom

    labels = tokens[:, 1:]
    ce = -jnp.take_along_axis(d_logprob, labels[:, :, None], axis=-1)[..., 0]
    ce = jnp.sum(ce * w) / denom

    agree = (jnp.argmax(d_logprob, axis=-1) == jnp.argmax(t_logprob, axis=-1))
    agree = jnp.sum(agree.astype(jnp.float32) * w) / denom

    loss = kl + hard_weight * ce
    return loss, {"loss": loss, "kl": kl, "ce": ce, "agree": agree}


def make_online_distill_step(
    target_model,
    target_variables,
    draft_model,
    tx: optax.GradientTransformation,
    prompt_len: int,
    eot_id: int,
    hard_weight: float = 0.5,
) -> Callable:
    """Jitted ``step(state, audio, tokens) -> (state, metrics)`` that
    recomputes the target's teacher-forced log-probs INSIDE the step (one
    target forward, no grads through it) from cached greedy-label tokens
    (:func:`make_greedy_label_fn`). Compared to caching full [B, T, V]
    log-prob tensors per clip this trades a forward per step for O(GB)
    of host memory at real vocab sizes."""
    from avsl_tpu.kernels import log_mel_spectrogram

    t_cfg = target_model.cfg

    @jax.jit
    def step_fn(state: TrainState, audio, tokens):
        mel = log_mel_spectrogram(audio, n_mels=t_cfg.n_mels)
        feats, _ = target_model.apply(
            target_variables, mel, None, method=target_model.encode
        )
        logits, _ = target_model.apply(
            target_variables, tokens[:, :-1], feats, None,
            method=target_model.decode,
        )
        t_logprob = jax.lax.stop_gradient(
            jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        )
        valid = valid_positions(tokens, prompt_len, eot_id)
        extra = (
            {"batch_stats": state.batch_stats}
            if state.batch_stats is not None
            else {}
        )

        def loss_fn(params):
            return distill_loss_fn(
                draft_model, params, extra, audio, tokens, t_logprob, valid,
                hard_weight=hard_weight,
            )

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        ), metrics

    return step_fn


def make_distill_step(
    draft_model, tx: optax.GradientTransformation, hard_weight: float = 0.5
) -> Callable:
    """Jitted ``step(state, audio, tokens, t_logprob, valid) ->
    (state, metrics)`` updating only the draft's params (the draft's
    batch_stats collection, if any, rides unchanged — distillation runs
    the draft deterministically)."""

    @jax.jit
    def step_fn(state: TrainState, audio, tokens, t_logprob, valid):
        extra = (
            {"batch_stats": state.batch_stats}
            if state.batch_stats is not None
            else {}
        )

        def loss_fn(params):
            return distill_loss_fn(
                draft_model, params, extra, audio, tokens, t_logprob, valid,
                hard_weight=hard_weight,
            )

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        ), metrics

    return step_fn

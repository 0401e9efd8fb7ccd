"""Greedy decoding paths: fused teacher-forced eval + autoregressive decode.

The reference's validation decodes by **argmax over teacher-forced logits**
then overwrites everything after the first EOT with EOT
(avsl/whisper_flamingo_ft_ami.py:568-586). Both that fused eval and a true
KV-cached autoregressive greedy loop (one jit-compiled `lax.while_loop`
that exits as soon as every sequence has emitted EOT — decoded tokens are
identical to the full-budget loop by construction) are provided; beam
search lives in decode/beam.py.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

# step_fn(tokens [B,1], cache) -> (logits [B,1,V], cache)
StepFn = Callable


def mask_after_eot(tokens: jnp.ndarray, eot_id: int) -> jnp.ndarray:
    """Replace every token after the first EOT with EOT.

    Mirrors the reference's EOT-tail masking (whisper_flamingo_ft_ami.py:
    581-586) with a cumulative-or instead of the argmax trick.
    """
    is_eot = tokens == eot_id
    after = jnp.cumsum(is_eot.astype(jnp.int32), axis=-1) - is_eot.astype(jnp.int32)
    return jnp.where(after > 0, eot_id, tokens)


def teacher_forced_predictions(logits: jnp.ndarray, eot_id: int) -> jnp.ndarray:
    """argmax over teacher-forced logits, EOT tail-masked. [B,T,V] -> [B,T]."""
    return mask_after_eot(jnp.argmax(logits, axis=-1), eot_id)


def greedy_decode(
    step_fn: StepFn,
    cache,
    init_tokens: jnp.ndarray,
    max_new_tokens: int,
    eot_id: int,
    biasing=None,
) -> jnp.ndarray:
    """Autoregressive greedy decode via one `lax.while_loop` over the KV
    cache, exiting as soon as EVERY sequence has emitted EOT — utterances
    usually finish in a fraction of the token budget, and the skipped
    steps are pure waste (their outputs are defined to be EOT anyway).

    ``init_tokens`` [B, L0] is the prompt (e.g. Whisper SOT sequence); it is
    fed through ``step_fn`` once to warm the cache, then up to
    ``max_new_tokens`` steps run greedily. Once a sequence emits EOT every
    later token is EOT. Returns generated tokens [B, max_new_tokens].

    ``biasing``: optional BiasingTrie (decode/biasing.py) — contextual
    phrase boosting added to the scores before each argmax.
    """
    if biasing is not None:
        from avsl_tpu.decode.biasing import bias_adjust, bias_advance

    def biased(scores, state):
        return scores + bias_adjust(biasing, state) if biasing is not None else scores

    def step_state(state, tok):
        return bias_advance(biasing, state, tok) if biasing is not None else state

    logits, cache = step_fn(init_tokens, cache)
    b = logits.shape[0]
    state0 = jnp.zeros((b,), jnp.int32)
    first = jnp.argmax(
        biased(logits[:, -1].astype(jnp.float32), state0), axis=-1
    )  # [B]
    state0 = step_state(state0, first)
    finished0 = first == eot_id
    out0 = jnp.full((b, max_new_tokens), eot_id, jnp.int32)
    out0 = jax.lax.dynamic_update_slice(out0, first[:, None].astype(jnp.int32), (0, 0))

    def cond(carry):
        i, _, finished, _, _, _ = carry
        return (i < max_new_tokens) & ~jnp.all(finished)

    def body(carry):
        i, tok, finished, cache, out, state = carry
        logits, cache = step_fn(tok[:, None], cache)
        nxt = jnp.argmax(
            biased(logits[:, -1].astype(jnp.float32), state), axis=-1
        )
        nxt = jnp.where(finished, eot_id, nxt)
        state = step_state(state, nxt)
        finished = finished | (nxt == eot_id)
        out = jax.lax.dynamic_update_slice(out, nxt[:, None].astype(jnp.int32), (0, i))
        return (i + 1, nxt, finished, cache, out, state)

    _, _, _, _, out, _ = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(1, jnp.int32), first, finished0, cache, out0, state0),
    )
    return out



def greedy_decode_scored(
    step_fn: StepFn,
    cache,
    init_tokens: jnp.ndarray,
    max_new_tokens: int,
    eot_id: int,
    biasing=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`greedy_decode` that also returns per-sequence confidence:
    the mean token log-probability over the generated tokens up to and
    including the first EOT (padding after EOT contributes nothing) —
    the greedy counterpart of beam_search's length-normalized score.
    Serving uses it to flag low-confidence segments (hallucination-prone
    windows score low). Early-exits like :func:`greedy_decode` (skipped
    steps contribute zero score and zero count by construction). Returns
    (tokens [B, max_new_tokens], avg_logprob [B] float32).

    ``biasing``: optional BiasingTrie — the boost steers the argmax, but
    the reported confidence is the TRUE model log-probability of the
    chosen tokens (so the serving quality gate still measures what the
    model believes, not what the boost injected)."""
    if biasing is not None:
        from avsl_tpu.decode.biasing import bias_adjust, bias_advance

    def pick(lp, state):
        adj = bias_adjust(biasing, state) if biasing is not None else 0.0
        tok = jnp.argmax(lp + adj, axis=-1)
        return tok, jnp.take_along_axis(lp, tok[:, None], axis=-1)[:, 0]

    def step_state(state, tok):
        return bias_advance(biasing, state, tok) if biasing is not None else state

    logits, cache = step_fn(init_tokens, cache)
    lp0 = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
    b = lp0.shape[0]
    state0 = jnp.zeros((b,), jnp.int32)
    first, s0 = pick(lp0, state0)
    state0 = step_state(state0, first)
    finished0 = first == eot_id
    out0 = jnp.full((b, max_new_tokens), eot_id, first.dtype)
    out0 = jax.lax.dynamic_update_slice(out0, first[:, None], (0, 0))

    def cond(carry):
        i = carry[0]
        finished = carry[2]
        return (i < max_new_tokens) & ~jnp.all(finished)

    def body(carry):
        i, tok, finished, cache, out, ssum, cnt, state = carry
        logits, cache = step_fn(tok[:, None], cache)
        lp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
        nxt, s = pick(lp, state)
        nxt = jnp.where(finished, eot_id, nxt)
        state = step_state(state, nxt)
        ssum = ssum + jnp.where(finished, 0.0, s)
        cnt = cnt + jnp.where(finished, 0.0, 1.0)
        finished = finished | (nxt == eot_id)
        out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, i))
        return (i + 1, nxt, finished, cache, out, ssum, cnt, state)

    _, _, _, _, out, ssum, cnt, _ = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.asarray(1, jnp.int32), first, finished0, cache, out0,
            s0, jnp.ones((b,), jnp.float32), state0,
        ),
    )
    return out, ssum / cnt


def sampled_decode_scored(
    step_fn: StepFn,
    cache,
    init_tokens: jnp.ndarray,
    max_new_tokens: int,
    eot_id: int,
    temperature,
    rng: jax.Array,
    biasing=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Temperature sampling with the same contract as
    :func:`greedy_decode_scored`. ``temperature`` is a traced scalar —
    ONE compiled program serves every fallback temperature. Confidence
    is scored on the UNtempered distribution (the sampled token's true
    log-probability), matching how the fallback loop compares retries
    against the greedy pass.

    ``biasing``: optional BiasingTrie — the boost is added to the
    TEMPERED logits before sampling (standard shallow fusion: the boost
    magnitude stays fixed while the model distribution flattens), and
    confidence stays the true model log-probability."""
    if biasing is not None:
        from avsl_tpu.decode.biasing import bias_adjust, bias_advance

    logits, cache = step_fn(init_tokens, cache)
    t = jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-6)

    def pick(logits_last, key, state):
        lp = jax.nn.log_softmax(logits_last.astype(jnp.float32), axis=-1)
        tempered = logits_last.astype(jnp.float32) / t
        if biasing is not None:
            tempered = tempered + bias_adjust(biasing, state)
        tok = jax.random.categorical(key, tempered)
        return tok, jnp.take_along_axis(lp, tok[:, None], axis=-1)[:, 0]

    def step_state(state, tok):
        return bias_advance(biasing, state, tok) if biasing is not None else state

    k0, rng = jax.random.split(rng)
    b = logits.shape[0]
    state0 = jnp.zeros((b,), jnp.int32)
    first, s0 = pick(logits[:, -1], k0, state0)
    state0 = step_state(state0, first)
    finished0 = first == eot_id
    keys = jax.random.split(rng, max(max_new_tokens - 1, 1))
    out0 = jnp.full((b, max_new_tokens), eot_id, first.dtype)
    out0 = jax.lax.dynamic_update_slice(out0, first[:, None], (0, 0))

    def cond(carry):
        i = carry[0]
        finished = carry[2]
        return (i < max_new_tokens) & ~jnp.all(finished)

    def body(carry):
        i, tok, finished, cache, out, ssum, cnt, state = carry
        logits, cache = step_fn(tok[:, None], cache)
        nxt, s = pick(logits[:, -1], keys[i - 1], state)
        nxt = jnp.where(finished, eot_id, nxt)
        state = step_state(state, nxt)
        ssum = ssum + jnp.where(finished, 0.0, s)
        cnt = cnt + jnp.where(finished, 0.0, 1.0)
        finished = finished | (nxt == eot_id)
        out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, i))
        return (i + 1, nxt, finished, cache, out, ssum, cnt, state)

    _, _, _, _, out, ssum, cnt, _ = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.asarray(1, jnp.int32), first, finished0, cache, out0,
            s0, jnp.ones((b,), jnp.float32), state0,
        ),
    )
    return out, ssum / cnt

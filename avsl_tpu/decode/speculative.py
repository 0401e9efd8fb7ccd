"""Speculative greedy decoding: a small draft model proposes k tokens, the
target model verifies all of them in ONE forward pass.

TPU-native design notes (no reference equivalent — the reference decodes
autoregressively, one target forward per token):

* Greedy speculative decoding is **token-exact** vs plain greedy decoding
  of the target model: the target's verify pass teacher-forces the draft
  proposals, the accepted prefix is exactly what greedy would have picked,
  and the first mismatch position is replaced by the target's own argmax.
  Every round commits between 1 and k+1 tokens at the cost of one target
  forward (Q = k+1, a good MXU shape) plus k cheap draft forwards.
* The whole loop — draft scan, verify, acceptance, per-sequence rollback —
  compiles to a single ``lax.while_loop`` program: one dispatch per batch,
  which matters doubly through a high-RTT device link.
* Ragged acceptance across the batch is handled with **per-sequence cache
  indices** (``index`` leaves of shape [B]): the incremental-attention
  branch (models/layers.py) scatter-writes K/V at per-sequence offsets and
  masks keys off the per-sequence index, so "rollback" is just rewriting
  the index vector — rejected K/V rows are never attended and get
  overwritten by the next round's scatter. The decoder's positional lookup
  gathers per-sequence rows for the same reason (models/whisper.py).

Cache invariant between rounds (L = per-sequence committed length,
prompt included): the target cache has processed committed tokens
``y[0:L-1]`` (index L-1) and the draft cache ``y[0:L-2]`` (index L-2); the
draft round's first step feeds the last two committed tokens, so a fully
accepted round (k+1 commits) never leaves the draft more than one token
behind. Works with any ``step_fn(tokens [B,Q], cache) -> (logits, cache)``
whose cache supports vector indices (the Whisper decode path; the int8 KV
compression of models/quant.py composes, since it only touches the static
cross/xv entries).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

StepFn = Callable


class SpecDecodeResult(NamedTuple):
    tokens: jnp.ndarray        # [B, max_new_tokens] int32, EOT-padded
    avg_logprob: jnp.ndarray   # [B] f32, mean target log-prob of committed tokens
    accept_rate: jnp.ndarray   # [] f32, committed draft tokens / drafted tokens
    rounds: jnp.ndarray        # [] int32, verify passes run


def _rewrite_cache_indices(cache, fn):
    """Apply ``fn`` to every incremental self-attn ``index`` leaf (the dicts
    holding k/v/index), leaving cross/xv entries untouched."""
    if isinstance(cache, dict):
        if "index" in cache and "k" in cache:
            return {**cache, "index": fn(cache["index"])}
        return {k: _rewrite_cache_indices(v, fn) for k, v in cache.items()}
    if isinstance(cache, (list, tuple)):
        t = type(cache)
        return t(_rewrite_cache_indices(v, fn) for v in cache)
    return cache


def broadcast_cache_index(cache, batch: int):
    """Turn scalar cache indices into per-sequence [batch] vectors."""
    return _rewrite_cache_indices(
        cache,
        lambda i: jnp.broadcast_to(jnp.asarray(i, jnp.int32), (batch,))
        if getattr(i, "ndim", 0) == 0
        else i,
    )


def set_cache_index(cache, index: jnp.ndarray):
    return _rewrite_cache_indices(cache, lambda _: index)


def _cache_max_len(cache) -> int:
    if isinstance(cache, dict):
        if "index" in cache and "k" in cache:
            return cache["k"].shape[1]
        for v in cache.values():
            n = _cache_max_len(v)
            if n:
                return n
    if isinstance(cache, (list, tuple)):
        for v in cache:
            n = _cache_max_len(v)
            if n:
                return n
    return 0


def speculative_greedy_decode(
    target_step: StepFn,
    draft_step: StepFn,
    target_cache,
    draft_cache,
    init_tokens: jnp.ndarray,
    max_new_tokens: int,
    eot_id: int,
    k: int = 4,
) -> SpecDecodeResult:
    """Greedy decode of the target model, accelerated by a draft model.

    ``init_tokens`` [B, P] is the prompt (P >= 2, true for every Whisper SOT
    sequence). Both caches must be freshly initialized (index 0) with
    ``max_len >= P + max_new_tokens + k``. Returns tokens identical to
    ``greedy_decode(target_step, ...)`` and an ``avg_logprob`` matching
    ``greedy_decode_scored`` (same committed-token set, same target
    distribution).
    """
    b, p = init_tokens.shape
    if p < 2:
        raise ValueError("speculative decode needs a prompt of >= 2 tokens")
    if k < 1:
        raise ValueError("k must be >= 1")
    need = p + max_new_tokens + k
    for name, c in (("target", target_cache), ("draft", draft_cache)):
        max_len = _cache_max_len(c)
        if max_len and max_len < need:
            raise ValueError(
                f"{name} cache max_len {max_len} < prompt + max_new + k = {need}"
            )

    target_cache = broadcast_cache_index(target_cache, b)
    draft_cache = broadcast_cache_index(draft_cache, b)

    # warm the caches to the invariant: target has processed y[0:P-1],
    # draft y[0:P-2]
    _, target_cache = target_step(init_tokens[:, : p - 1], target_cache)
    if p > 2:
        _, draft_cache = draft_step(init_tokens[:, : p - 2], draft_cache)

    out_w = max_new_tokens + k + 1
    j_ids = jnp.arange(k + 1)[None, :]  # [1, k+1]
    batch_ids = jnp.arange(b)[:, None]

    state = dict(
        tcache=target_cache,
        dcache=draft_cache,
        out=jnp.full((b, out_w), eot_id, jnp.int32),
        length=jnp.full((b,), p, jnp.int32),
        last2=init_tokens[:, p - 2 :].astype(jnp.int32),
        finished=jnp.zeros((b,), bool),
        ssum=jnp.zeros((b,), jnp.float32),
        scnt=jnp.zeros((b,), jnp.float32),
        drafted=jnp.zeros((), jnp.float32),
        taken=jnp.zeros((), jnp.float32),
        rounds=jnp.zeros((), jnp.int32),
    )

    def cond(s):
        return ~jnp.all(s["finished"])

    def body(s):
        length, finished = s["length"], s["finished"]

        # ---- draft phase: k proposals, first step feeds the last two
        # committed tokens (closes the one-token lag after full acceptance)
        logits, dcache = draft_step(s["last2"], s["dcache"])
        d1 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        if k > 1:
            def draft_body(carry, _):
                tok, dc = carry
                lg, dc = draft_step(tok[:, None], dc)
                nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
                return (nxt, dc), nxt

            (_, dcache), rest = jax.lax.scan(
                draft_body, (d1, dcache), None, length=k - 1
            )
            drafts = jnp.concatenate([d1[:, None], rest.T], axis=1)  # [B,k]
        else:
            drafts = d1[:, None]

        # ---- verify: one target pass over [y_{L-1}, d_1..d_k]
        ver_in = jnp.concatenate([s["last2"][:, 1:], drafts], axis=1)  # [B,k+1]
        logits_t, tcache = target_step(ver_in, s["tcache"])
        lp = jax.nn.log_softmax(logits_t.astype(jnp.float32), axis=-1)
        t = jnp.argmax(lp, axis=-1).astype(jnp.int32)  # [B,k+1]

        # ---- longest accepted prefix; position `acc` takes the target's
        # own token (correction, or bonus when everything matched)
        match = (drafts == t[:, :k]).astype(jnp.int32)
        acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # [B] in [0,k]
        drafts_ext = jnp.concatenate([drafts, t[:, -1:]], axis=1)  # [B,k+1]
        cand = jnp.where(j_ids < acc[:, None], drafts_ext, t)  # [B,k+1]

        # committed tokens this round: j <= acc, up to & incl. the first
        # EOT, capped by the remaining token budget, none if finished
        is_eot = cand == eot_id
        eot_before = jnp.cumsum(is_eot.astype(jnp.int32), axis=1) - is_eot
        remaining = max_new_tokens - (length - p)
        valid = (
            (~finished)[:, None]
            & (j_ids <= acc[:, None])
            & (eot_before == 0)
            & (j_ids < remaining[:, None])
        )
        commits = jnp.sum(valid.astype(jnp.int32), axis=1)  # [B]

        # ---- write committed tokens at per-sequence offsets (masked
        # positions scatter out of bounds and drop)
        offsets = jnp.where(valid, (length - p)[:, None] + j_ids, out_w)
        out = s["out"].at[batch_ids, offsets].set(cand, mode="drop")

        tok_lp = jnp.take_along_axis(lp, cand[:, :, None], axis=-1)[..., 0]
        ssum = s["ssum"] + jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=1)
        scnt = s["scnt"] + commits.astype(jnp.float32)

        new_length = length + commits
        finished = (
            finished
            | jnp.any(valid & is_eot, axis=1)
            | (new_length - p >= max_new_tokens)
        )

        # ---- last two committed tokens: ext[j] = y_{L-2+j}
        ext = jnp.concatenate([s["last2"], cand], axis=1)  # [B, k+3]
        g = jnp.stack([commits, commits + 1], axis=1)  # gather y_{L'-2}, y_{L'-1}
        last2 = jnp.take_along_axis(ext, jnp.clip(g, 0, k + 2), axis=1)
        last2 = jnp.where(commits[:, None] >= 1, last2, s["last2"])

        # ---- rollback: the index vectors ARE the cache state
        tcache = set_cache_index(tcache, new_length - 1)
        dcache = set_cache_index(dcache, new_length - 2)

        live = (~s["finished"]).astype(jnp.float32)
        return dict(
            tcache=tcache,
            dcache=dcache,
            out=out,
            length=new_length,
            last2=last2,
            finished=finished,
            ssum=ssum,
            scnt=scnt,
            drafted=s["drafted"] + jnp.sum(live) * k,
            taken=s["taken"]
            + jnp.sum(jnp.where(valid & (j_ids < acc[:, None]), 1.0, 0.0)),
            rounds=s["rounds"] + 1,
        )

    state = jax.lax.while_loop(cond, body, state)
    return SpecDecodeResult(
        tokens=state["out"][:, :max_new_tokens],
        avg_logprob=state["ssum"] / jnp.maximum(state["scnt"], 1.0),
        accept_rate=state["taken"] / jnp.maximum(state["drafted"], 1.0),
        rounds=state["rounds"],
    )

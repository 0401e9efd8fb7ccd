"""Batched KV-cached beam search compiled to a single XLA program.

The reference only reaches beam search through HF ``generate``
(whisper_ft.py:119-121) and the fairseq-style cache-reorder hooks
(av_hubert_seq2seq_model.py:308-342) — host-side Python loops. Here the
whole search runs inside one jit: static-shape sequence buffers, beam
reordering as a batched gather over the flattened [B*K] cache batch dim
(the `_reorder_cache` equivalent), finished beams forced to emit EOT at
zero added score, `lax.while_loop` over decode steps that exits as soon
as every beam of every batch item is finished (each further step would
be the identity: EOT-only extension at zero added score).

Generic over models: ``step_fn(tokens [N,1], cache) -> (logits [N,1,V],
cache)`` — works for Whisper(+Flamingo) and AV-HuBERT seq2seq alike since
the cache is an explicit pytree.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e9


def _tile_beams(tree: Any, beam_size: int) -> Any:
    """Repeat every batched leaf K times along dim 0 (scalars untouched)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, beam_size, axis=0) if x.ndim > 0 else x, tree
    )


def _gather_beams(tree: Any, flat_idx: jnp.ndarray) -> Any:
    """Reorder batched leaves by flat [B*K] source indices."""
    return jax.tree_util.tree_map(
        lambda x: jnp.take(x, flat_idx, axis=0) if x.ndim > 0 else x, tree
    )


def beam_search(
    step_fn: Callable,
    cache: Any,
    init_tokens: jnp.ndarray,
    beam_size: int,
    max_new_tokens: int,
    eot_id: int,
    length_penalty: float = 1.0,
    return_nbest: bool = False,
    biasing=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run beam search; returns (best sequences [B, max_new_tokens],
    best length-normalized TRUE model log-prob scores [B]).

    ``biasing``: optional :class:`~avsl_tpu.decode.biasing.BiasingTrie` —
    contextual phrase boosting folded into the scores before every top-k
    (one automaton state per beam, reordered with the beams). Abandoned
    partial matches refund their bonus down to the deepest completed
    phrase; EOT refunds automatically (decode/biasing.py). Biased scores
    drive RANKING only: the returned score is always the unbiased
    cumulative log-prob (length-normalized), matching the
    greedy_decode_scored / sampled_decode_scored contract, so serving
    confidence gates (infer/pipeline.py avg_logprob) are not inflated by
    the boost.

    ``return_nbest=True`` instead returns ALL K hypotheses per item,
    sorted best-first: ([B, K, max_new_tokens], [B, K] normalized
    scores) — the ``num_return_sequences`` capability of the reference's
    HF generate path (whisper_ft.py:119-121), for downstream rescoring.

    ``cache`` must have batch dim B (it is tiled to B*K internally);
    ``init_tokens`` [B, L0] is the prompt fed once to warm the cache.
    """
    b, _ = init_tokens.shape
    k = beam_size

    logits, cache = step_fn(init_tokens, cache)
    log_probs = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
    vocab = log_probs.shape[-1]
    raw_log_probs = log_probs

    if biasing is not None:
        from avsl_tpu.decode.biasing import bias_adjust, bias_advance

        log_probs = log_probs + bias_adjust(
            biasing, jnp.zeros((b,), jnp.int32)
        )

    scores, first_tokens = jax.lax.top_k(log_probs, k)  # [B, K]
    # unbiased cumulative log-prob per beam — the REPORTED score
    # (identical to `scores` when biasing is None)
    true_scores = jnp.take_along_axis(raw_log_probs, first_tokens, axis=1)
    cache = _tile_beams(cache, k)

    seqs = jnp.full((b, k, max_new_tokens), eot_id, jnp.int32)
    seqs = seqs.at[:, :, 0].set(first_tokens)
    finished = first_tokens == eot_id
    nodes = (
        bias_advance(biasing, jnp.zeros((b, k), jnp.int32), first_tokens)
        if biasing is not None
        else jnp.zeros((b, k), jnp.int32)
    )

    def cond(carry):
        i = carry[0]
        finished = carry[4]
        return (i < max_new_tokens) & ~jnp.all(finished)

    def body(carry):
        i, seqs, scores, true_scores, finished, cache, last, nodes = carry
        logits, cache = step_fn(last.reshape(b * k, 1), cache)
        lp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
        lp = lp.reshape(b, k, vocab)

        # finished beams may only extend with EOT at zero added score
        eot_only = jnp.full((vocab,), NEG_INF).at[eot_id].set(0.0)
        lp = jnp.where(finished[:, :, None], eot_only[None, None, :], lp)
        lp_raw = lp
        if biasing is not None:
            from avsl_tpu.decode.biasing import bias_adjust

            # finished beams sit at the root (EOT advanced them there),
            # where adj[eot] == 0 — their scores stay frozen
            lp = lp + bias_adjust(biasing, nodes)

        total = scores[:, :, None] + lp  # [B, K, V]
        flat = total.reshape(b, k * vocab)
        new_scores, flat_idx = jax.lax.top_k(flat, k)  # [B, K]
        beam_src = flat_idx // vocab  # [B, K] source beam
        new_tok = flat_idx % vocab

        # the unbiased log-prob of each selected extension, accumulated
        # on the source beam's unbiased total
        true_step = jnp.take_along_axis(
            lp_raw.reshape(b, k * vocab), flat_idx, axis=1
        )
        true_scores = (
            jnp.take_along_axis(true_scores, beam_src, axis=1) + true_step
        )

        # reorder sequences + cache by source beam
        seqs = jnp.take_along_axis(seqs, beam_src[:, :, None], axis=1)
        seqs = jax.lax.dynamic_update_slice_in_dim(
            seqs, new_tok[:, :, None], i, axis=2
        )
        batch_offset = (jnp.arange(b) * k)[:, None]
        cache = _gather_beams(cache, (batch_offset + beam_src).reshape(-1))
        finished = jnp.take_along_axis(finished, beam_src, axis=1) | (
            new_tok == eot_id
        )
        nodes = jnp.take_along_axis(nodes, beam_src, axis=1)
        if biasing is not None:
            from avsl_tpu.decode.biasing import bias_advance

            nodes = bias_advance(biasing, nodes, new_tok)
        return (
            i + 1, seqs, new_scores, true_scores, finished, cache, new_tok,
            nodes,
        )

    _, seqs, scores, true_scores, finished, cache, _, _ = jax.lax.while_loop(
        cond,
        body,
        (jnp.asarray(1, jnp.int32), seqs, scores, true_scores, finished,
         cache, first_tokens, nodes),
    )

    # length-normalized final selection (count tokens up to and incl.
    # EOT). A beam that never emitted EOT accumulated exactly
    # max_new_tokens log-probs — capping the +1 there keeps unfinished
    # beams from getting an inflated divisor (which would bias selection
    # toward run-on hypotheses)
    lengths = jnp.minimum(
        jnp.sum(
            jnp.cumsum((seqs == eot_id).astype(jnp.int32), axis=-1) == 0,
            axis=-1,
        ) + 1,
        max_new_tokens,
    )
    denom = jnp.power(lengths.astype(jnp.float32), length_penalty)
    norm = scores / denom  # biased: drives selection/ordering only
    norm_true = true_scores / denom  # unbiased: the reported score
    if return_nbest:
        order = jnp.argsort(-norm, axis=1)  # best-first by biased rank
        nbest = jnp.take_along_axis(seqs, order[:, :, None], axis=1)
        return nbest, jnp.take_along_axis(norm_true, order, axis=1)
    best = jnp.argmax(norm, axis=1)
    best_seqs = jnp.take_along_axis(seqs, best[:, None, None], axis=1)[:, 0]
    best_scores = jnp.take_along_axis(norm_true, best[:, None], axis=1)[:, 0]
    return best_seqs, best_scores

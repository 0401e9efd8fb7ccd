"""Contextual biasing (decode/biasing.py): hotword boosting in-jit.

Semantics under test (the shallow-fusion-over-a-trie contract):
* extending a live phrase match adds +weight per token to the score;
* abandoning a partial match refunds exactly what it earned (a prefix
  of a never-completed phrase nets zero) — including at EOT;
* completing a phrase keeps weight * len(phrase);
* greedy/beam/sampled decoders accept the trie and steer accordingly;
* reported confidence stays the TRUE model log-probability.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsl_tpu.decode import (
    beam_search,
    bias_adjust,
    bias_advance,
    build_biasing_trie,
    greedy_decode,
    greedy_decode_scored,
)

V = 12  # tiny vocab; EOT = 0
EOT = 0


def test_trie_build_and_transitions():
    # phrases: [3, 4, 5] and [3, 7]; shared prefix 3
    trie = build_biasing_trie([[3, 4, 5], [3, 7]], V, weight=2.0)
    root = jnp.asarray([0])

    # root: token 3 starts a match worth +2
    adj = np.asarray(bias_adjust(trie, root))[0]
    assert adj[3] == pytest.approx(2.0)
    assert adj[4] == pytest.approx(0.0)  # 4 doesn't start any phrase
    assert adj[EOT] == pytest.approx(0.0)

    s = bias_advance(trie, root, jnp.asarray([3]))
    adj = np.asarray(bias_adjust(trie, s))[0]
    # continue with 4 or 7: +2; abandon with e.g. 9: refund -2;
    # abandon with 3 restarts the match (refund -2, earn +2 -> net 0)
    assert adj[4] == pytest.approx(2.0)
    assert adj[7] == pytest.approx(2.0)
    assert adj[9] == pytest.approx(-2.0)
    assert adj[3] == pytest.approx(0.0)
    assert adj[EOT] == pytest.approx(-2.0)  # EOT refunds the partial

    # completing [3, 7] banks the bonus and resets to root
    s2 = bias_advance(trie, s, jnp.asarray([7]))
    assert int(s2[0]) == 0
    # completing [3,4,5]: leaf end resets too
    s3 = bias_advance(trie, s, jnp.asarray([4]))
    assert int(s3[0]) != 0
    s4 = bias_advance(trie, s3, jnp.asarray([5]))
    assert int(s4[0]) == 0


def test_trie_validation():
    with pytest.raises(ValueError):
        build_biasing_trie([], V)
    with pytest.raises(ValueError):
        build_biasing_trie([[3, V + 1]], V)
    with pytest.raises(ValueError):
        build_biasing_trie([[3]], V, weight=0.0)


def _const_step(logit_rows):
    """step_fn emitting fixed logits per decode position (batch 1)."""
    rows = jnp.asarray(logit_rows, jnp.float32)

    def step(tok, cache):
        i = cache
        n = tok.shape[1]  # prompt warms with its own length
        row = rows[jnp.minimum(i, rows.shape[0] - 1)]
        return jnp.broadcast_to(row, (tok.shape[0], 1, V)), i + n

    return step


def test_greedy_biasing_flips_the_argmax():
    # model slightly prefers token 2 over 3 at step 0, then prefers EOT;
    # after 3 it would emit 4 (phrase [3,4]) then EOT
    base = np.zeros((3, V), np.float32)
    base[0, 2] = 1.0
    base[0, 3] = 0.5  # close second
    base[1, EOT] = 2.0
    base[1, 4] = 1.5  # 4 is a close second after anything
    base[2, EOT] = 5.0
    step = _const_step(base)

    prompt = jnp.zeros((1, 1), jnp.int32)
    toks_plain = greedy_decode(step, jnp.asarray(0), prompt, 4, EOT)
    assert int(toks_plain[0, 0]) == 2

    trie = build_biasing_trie([[3, 4]], V, weight=1.0)
    toks = greedy_decode(step, jnp.asarray(0), prompt, 4, EOT, biasing=trie)
    assert toks[0, :3].tolist() == [3, 4, EOT]


def test_greedy_scored_reports_true_model_logprob():
    base = np.zeros((2, V), np.float32)
    base[0, 2] = 1.0
    base[0, 3] = 0.5
    base[1, EOT] = 5.0
    step = _const_step(base)
    prompt = jnp.zeros((1, 1), jnp.int32)
    trie = build_biasing_trie([[3]], V, weight=3.0)
    toks, conf = greedy_decode_scored(
        step, jnp.asarray(0), prompt, 3, EOT, biasing=trie
    )
    assert int(toks[0, 0]) == 3
    # confidence = mean of TRUE lp(3) and lp(EOT), not the boosted score
    lp0 = jax.nn.log_softmax(jnp.asarray(base[0]))[3]
    lp1 = jax.nn.log_softmax(jnp.asarray(base[1]))[EOT]
    assert float(conf[0]) == pytest.approx(float((lp0 + lp1) / 2), abs=1e-5)


def test_beam_biasing_scores_are_exact():
    """Biasing must flip the winner (so the earn/refund/bank bookkeeping
    drove ranking), while the REPORTED score is the unbiased log-prob sum,
    length-normalized — the greedy/sampled_decode_scored contract, so the
    serving confidence gate (pipeline avg_logprob) is not inflated."""
    base = np.zeros((3, V), np.float32)
    base[0, 2] = 2.0
    base[0, 3] = 0.0
    base[1, 4] = 1.0
    base[1, EOT] = 2.0
    base[2, EOT] = 6.0
    step = _const_step(base)
    prompt = jnp.zeros((1, 1), jnp.int32)

    w = 1.5
    trie = build_biasing_trie([[3, 4]], V, weight=w)
    seqs, scores = beam_search(
        step, jnp.asarray(0), prompt, beam_size=3, max_new_tokens=3,
        eot_id=EOT, biasing=trie,
    )
    assert seqs[0, :3].tolist() == [3, 4, EOT]
    lp = [np.asarray(jax.nn.log_softmax(jnp.asarray(r))) for r in base]
    raw = lp[0][3] + lp[1][4] + lp[2][EOT]
    # reported score excludes the banked 2*w bonus
    assert float(scores[0]) == pytest.approx(float(raw) / 3.0, abs=1e-4)


def test_nested_phrase_interior_end_banks_on_abandonment():
    """The advisor's nested-hotword case ([[3],[3,4,5]], 'New York' vs
    'New York City'): after emitting 3 the single-token phrase [3] is
    COMPLETE even though the trie continues toward [3,4,5]. Abandoning
    the longer match (any non-continuation token, or EOT) must refund
    only the tokens past the completed end — [3]'s bonus stays banked."""
    w = 2.0
    trie = build_biasing_trie([[3], [3, 4, 5]], V, weight=w)
    root = jnp.asarray([0])

    s = bias_advance(trie, root, jnp.asarray([3]))  # interior end
    assert int(s[0]) != 0  # keeps matching the longer phrase
    adj = np.asarray(bias_adjust(trie, s))[0]
    assert adj[4] == pytest.approx(w)  # continue [3,4,5]
    assert adj[9] == pytest.approx(0.0)  # abandon: [3] stays banked
    assert adj[EOT] == pytest.approx(0.0)  # EOT: [3] stays banked
    # re-emitting 3: nothing is at risk (the whole path is banked) and a
    # FRESH [3] completes -> +w, and the new state banks it again
    assert adj[3] == pytest.approx(w)
    s2 = bias_advance(trie, s, jnp.asarray([3]))
    assert int(s2[0]) == int(s[0])

    # two levels deeper: abandoning [3,4,?] refunds only the 2 at-risk
    # tokens (4 and 5-to-be), not the banked [3]
    s34 = bias_advance(trie, s, jnp.asarray([4]))
    adj34 = np.asarray(bias_adjust(trie, s34))[0]
    assert adj34[5] == pytest.approx(w)  # completes [3,4,5]
    assert adj34[9] == pytest.approx(-w)  # refund token 4 only
    assert adj34[EOT] == pytest.approx(-w)

    # cumulative walk: 3 (+w, banked) 4 (+w) 9 (-w) => net +w kept
    total = 0.0
    state = root
    for tok in (3, 4, 9):
        total += float(np.asarray(bias_adjust(trie, state))[0][tok])
        state = bias_advance(trie, state, jnp.asarray([tok]))
    assert total == pytest.approx(w)


def test_no_interior_end_refunds_fully():
    """Sanity inverse of the banked case: with no completed phrase on
    the path, abandonment refunds everything (prefix nets zero)."""
    w = 2.0
    trie = build_biasing_trie([[3, 4, 5]], V, weight=w)
    total = 0.0
    state = jnp.asarray([0])
    for tok in (3, 4, 9):
        total += float(np.asarray(bias_adjust(trie, state))[0][tok])
        state = bias_advance(trie, state, jnp.asarray([tok]))
    assert total == pytest.approx(0.0)


def test_beam_abandoned_prefix_nets_zero():
    """When no phrase completes, biased and unbiased beam search must
    return the SAME sequences with the SAME scores: every partial match
    the beams explored was refunded on abandonment or at EOT."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(4, V)).astype(np.float32)
    base[:, EOT] += 1.0  # finish quickly sometimes
    step = _const_step(base)
    prompt = jnp.zeros((2, 1), jnp.int32)

    # a phrase the model will never complete (token 11 then 10 then 9)
    trie = build_biasing_trie([[11, 10, 9]], V, weight=0.25)
    s_plain, sc_plain = beam_search(
        step, jnp.asarray(0), prompt, 3, 4, EOT
    )
    s_bias, sc_bias = beam_search(
        step, jnp.asarray(0), prompt, 3, 4, EOT, biasing=trie
    )
    # small weight: ranking unchanged, and since nothing completes the
    # final scores must match exactly
    np.testing.assert_array_equal(np.asarray(s_plain), np.asarray(s_bias))
    np.testing.assert_allclose(
        np.asarray(sc_plain), np.asarray(sc_bias), atol=1e-5
    )


def test_biasing_none_paths_unchanged():
    """biasing=None is bit-identical to the pre-biasing decoders."""
    rng = np.random.default_rng(3)
    base = rng.normal(size=(5, V)).astype(np.float32)
    step = _const_step(base)
    prompt = jnp.zeros((2, 1), jnp.int32)
    t1 = greedy_decode(step, jnp.asarray(0), prompt, 4, EOT)
    t2 = greedy_decode(step, jnp.asarray(0), prompt, 4, EOT, biasing=None)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

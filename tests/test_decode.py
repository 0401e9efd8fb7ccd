import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsl_tpu.core.config import WhisperConfig
from avsl_tpu.decode import (
    beam_search,
    edit_distance,
    greedy_decode,
    mask_after_eot,
    normalize_text,
    teacher_forced_predictions,
    wer_cer,
)
from avsl_tpu.models import Whisper


def test_normalize_text():
    assert normalize_text("I can't do it!") == "i can not do it"
    assert normalize_text("'cause it's   fun.") == "because it is fun"
    assert normalize_text("C'mon , L_C_D") == "come on lcd"
    assert normalize_text("  We'll   WIN  ") == "we will win"
    assert normalize_text("") == ""


def test_edit_distance_and_wer():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], ["a"]) == 1
    wer, cer = wer_cer(["a b c"], ["a x c"])
    assert wer == pytest.approx(1 / 3)
    wer, _ = wer_cer(["hello world", ""], ["hello world", "missing words here"])
    assert wer == pytest.approx(3 / 5)


def test_mask_after_eot():
    eot = 9
    toks = jnp.asarray([[1, 2, 9, 4, 5], [9, 2, 3, 4, 5], [1, 2, 3, 4, 5]])
    out = np.asarray(mask_after_eot(toks, eot))
    np.testing.assert_array_equal(out[0], [1, 2, 9, 9, 9])
    np.testing.assert_array_equal(out[1], [9, 9, 9, 9, 9])
    np.testing.assert_array_equal(out[2], [1, 2, 3, 4, 5])


def test_teacher_forced_predictions():
    logits = np.full((1, 3, 5), -1.0, np.float32)
    logits[0, 0, 2] = 1.0
    logits[0, 1, 4] = 1.0  # eot
    logits[0, 2, 3] = 1.0
    out = np.asarray(teacher_forced_predictions(jnp.asarray(logits), eot_id=4))
    np.testing.assert_array_equal(out, [[2, 4, 4]])


@pytest.fixture(scope="module")
def tiny_whisper():
    cfg = WhisperConfig.tiny_test(dtype="float32")
    model = Whisper(cfg)
    mel = jnp.asarray(np.random.default_rng(0).normal(size=(2, 80, 64)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mel, jnp.zeros((2, 1), jnp.int32))
    feats, _ = model.apply(params, mel, method=model.encode)
    return cfg, model, params, feats


def _make_step(model, params):
    @jax.jit
    def step(tokens, cache):
        return model.apply(params, tokens, None, None, cache, method=model.decode)

    return step


def test_greedy_decode_jit(tiny_whisper):
    cfg, model, params, feats = tiny_whisper
    cache = model.apply(params, feats, None, 24, method=model.init_decode_cache)
    step = _make_step(model, params)
    prompt = jnp.asarray([[7, 8], [7, 8]], jnp.int32)
    out = greedy_decode(step, cache, prompt, max_new_tokens=10, eot_id=3)
    assert out.shape == (2, 10)
    o = np.asarray(out)
    # once EOT appears everything after is EOT
    for row in o:
        if (row == 3).any():
            first = np.argmax(row == 3)
            assert (row[first:] == 3).all()


def test_beam_search_beats_or_matches_greedy_logprob(tiny_whisper):
    cfg, model, params, feats = tiny_whisper
    step = _make_step(model, params)
    prompt = jnp.asarray([[7, 8], [5, 6]], jnp.int32)
    max_new = 8

    cache_g = model.apply(params, feats, None, 24, method=model.init_decode_cache)
    greedy = greedy_decode(step, cache_g, prompt, max_new, eot_id=3)

    cache_b = model.apply(params, feats, None, 24, method=model.init_decode_cache)
    beams, scores = beam_search(
        step, cache_b, prompt, beam_size=4, max_new_tokens=max_new, eot_id=3,
        length_penalty=0.0,  # compare raw log-probs
    )
    assert beams.shape == (2, max_new)
    assert np.isfinite(np.asarray(scores)).all()

    def seq_logprob(tokens_row, batch_idx):
        cache = model.apply(
            params, feats[batch_idx : batch_idx + 1], None, 24,
            method=model.init_decode_cache,
        )
        toks = jnp.concatenate([prompt[batch_idx : batch_idx + 1], tokens_row[None]], 1)
        logits, _ = step(toks, cache)
        lp = jax.nn.log_softmax(logits[0, prompt.shape[1] - 1 : -1].astype(jnp.float32))
        total = 0.0
        for i, t in enumerate(np.asarray(tokens_row)):
            total += float(lp[i, t])
            if t == 3:
                break
        return total

    for bi in range(2):
        g = seq_logprob(greedy[bi], bi)
        bm = seq_logprob(beams[bi], bi)
        assert bm >= g - 1e-4, (bi, bm, g)


def test_beam_search_jits_once(tiny_whisper):
    cfg, model, params, feats = tiny_whisper
    step = _make_step(model, params)

    @jax.jit
    def run(feats, prompt):
        cache = model.apply(params, feats, None, 24, method=model.init_decode_cache)
        return beam_search(step, cache, prompt, 3, 6, eot_id=3)

    seqs, scores = run(feats, jnp.asarray([[7, 8], [5, 6]], jnp.int32))
    assert seqs.shape == (2, 6)


def test_ctc_best_path_decode():
    """Best-path CTC: argmax -> collapse repeats -> drop blanks; padded
    frames excluded; scores finite."""
    import numpy as np

    from avsl_tpu.decode import ctc_best_path, ctc_best_path_scores

    V, BLANK = 6, 0
    # frame-level classes: [a a blank a b b blank blank c PAD]
    classes = [1, 1, 0, 1, 2, 2, 0, 0, 3, 4]
    logits = np.full((1, len(classes), V), -5.0, np.float32)
    for t, c in enumerate(classes):
        logits[0, t, c] = 5.0
    pad = np.zeros((1, len(classes)), np.float32)
    pad[0, -1] = 1.0  # the trailing "4" frame is padding
    seqs = ctc_best_path(logits, blank_id=BLANK, logit_pad=pad)
    assert seqs == [[1, 1, 2, 3]]  # repeat collapsed, blank-separated kept

    seqs2, scores = ctc_best_path_scores(logits, blank_id=BLANK, logit_pad=pad)
    assert seqs2 == seqs
    assert np.isfinite(scores).all() and scores[0] < 0


def test_ctc_decode_to_text():
    import numpy as np

    from avsl_tpu.data.tokenizer import ByteTokenizer
    from avsl_tpu.decode import ctc_decode_to_text

    tok = ByteTokenizer()
    ids = tok.encode("hi")
    V = tok.vocab_size
    frames = [ids[0], ids[0], 0, ids[1]]
    logits = np.full((1, len(frames), V), -5.0, np.float32)
    for t, c in enumerate(frames):
        logits[0, t, c] = 5.0
    texts = ctc_decode_to_text(logits, tok, blank_id=0)
    assert texts == ["hi"]


def test_ctc_prefix_beam_matches_bruteforce():
    """Prefix beam search (large beam) must find the exact most-probable
    label sequence: verified against brute-force enumeration of every
    alignment on a small random problem."""
    import itertools

    import numpy as np

    from avsl_tpu.decode.ctc import ctc_prefix_beam_search

    rng = np.random.default_rng(3)
    T, V, BLANK = 5, 3, 0
    logits = rng.normal(0, 1.5, (T, V)).astype(np.float32)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    def collapse(path):
        out, prev = [], -1
        for s in path:
            if s != prev and s != BLANK:
                out.append(s)
            prev = s
        return tuple(out)

    totals: dict = {}
    for path in itertools.product(range(V), repeat=T):
        p = sum(logp[t, s] for t, s in enumerate(path))
        lab = collapse(path)
        totals[lab] = np.logaddexp(totals.get(lab, -np.inf), p)
    want_lab, want_lp = max(totals.items(), key=lambda kv: kv[1])

    got, got_lp = ctc_prefix_beam_search(logits, beam_size=64, blank_id=BLANK)
    assert tuple(got) == want_lab
    np.testing.assert_allclose(got_lp, want_lp, rtol=1e-4)


def test_ctc_prefix_beam_batch_and_padding():
    import numpy as np

    from avsl_tpu.decode.ctc import ctc_best_path, ctc_prefix_beam_search_batch

    rng = np.random.default_rng(0)
    logits = rng.normal(0, 3.0, (2, 8, 5)).astype(np.float32)
    pad = np.zeros((2, 8), np.float32)
    pad[1, 5:] = 1.0
    seqs, scores = ctc_prefix_beam_search_batch(logits, beam_size=16, logit_pad=pad)
    assert len(seqs) == 2 and all(np.isfinite(scores))
    # with peaked logits, prefix beam agrees with best-path
    peaked = logits * 10
    bp = ctc_best_path(peaked, logit_pad=pad)
    pb, _ = ctc_prefix_beam_search_batch(peaked, beam_size=16, logit_pad=pad)
    assert pb == bp


def test_ctc_prefix_beam_keeps_blank_under_pruning():
    """Regression: with a small beam, blank ranked below the per-frame
    top-2*beam cutoff must STILL contribute its path mass — the pre-fix
    candidate pruning dropped it, starving blank-padded alignments."""
    import itertools

    import numpy as np

    from avsl_tpu.decode.ctc import ctc_prefix_beam_search

    T, V, BLANK, A = 3, 12, 0, 1
    logits = np.full((T, V), -5.0, np.float32)
    logits[:, A] = 3.0            # 'a' dominant every frame
    logits[:, 2] = 1.2            # three distractors outrank blank at
    logits[:, 3] = 1.1            # frames 1-2, so blank sits below the
    logits[:, 4] = 1.05           # top-4 cutoff of beam_size=2 (k=4)
    logits[:, BLANK] = 1.0
    # at frame 0 blank ranks 2nd so the empty prefix survives the beam —
    # isolating the frame-1/2 blank-candidate guard from ordinary
    # beam-sibling pruning loss
    logits[0, BLANK] = 1.5
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    def collapse(path):
        out, prev = [], -1
        for s in path:
            if s != prev and s != BLANK:
                out.append(s)
            prev = s
        return tuple(out)

    exact_mass = -np.inf
    for path in itertools.product(range(V), repeat=T):
        if collapse(path) == (A,):
            exact_mass = np.logaddexp(
                exact_mass, sum(logp[t, s] for t, s in enumerate(path))
            )

    seq, lp = ctc_prefix_beam_search(logits, beam_size=2, blank_id=BLANK)
    assert seq == [A]
    # blank-padded alignments (a,blank,blank / a,a,blank / ...) carry
    # ~10% of [a]'s mass here; without blank in the candidate set the
    # returned score misses them by >0.09 nats
    assert abs(lp - exact_mass) < 0.03, (lp, exact_mass)


def test_greedy_decode_scored_matches_greedy_with_exact_scores():
    """greedy_decode_scored returns the SAME tokens as greedy_decode plus
    the mean token log-probability over live steps: EOT itself is scored,
    everything after it contributes nothing (serving's confidence flag)."""
    import jax.numpy as jnp
    import numpy as np

    from avsl_tpu.decode import greedy_decode, greedy_decode_scored

    V, B, eot = 6, 2, 0
    steps = np.full((4, B, V), -10.0, np.float32)
    steps[0, 0, 3] = 5.0   # b0: emits 3
    steps[0, 1, 0] = 5.0   # b1: EOT immediately
    steps[1, 0, 4] = 2.0   # b0: emits 4
    steps[1, 1, 2] = 9.0   # b1 is finished; must be ignored
    steps[2, 0, 0] = 1.0   # b0: EOT
    steps[2, 1, 1] = 1.0
    steps[3, :, 5] = 1.0
    steps_arr = jnp.asarray(steps)

    def step_fn(tok, i):
        return jnp.take(steps_arr, jnp.minimum(i, 3), axis=0)[:, None, :], i + 1

    prompt = jnp.ones((B, 1), jnp.int32)
    toks, scores = greedy_decode_scored(step_fn, 0, prompt, 4, eot)
    toks_ref = greedy_decode(step_fn, 0, prompt, 4, eot)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks_ref))
    np.testing.assert_array_equal(np.asarray(toks), [[3, 4, 0, 0], [0, 0, 0, 0]])

    def lp(i, b, t):
        row = steps[i, b] - steps[i, b].max()
        return row[t] - np.log(np.exp(row).sum())

    expect = [
        (lp(0, 0, 3) + lp(1, 0, 4) + lp(2, 0, 0)) / 3.0,  # incl. its EOT
        lp(0, 1, 0),                                       # one live token
    ]
    np.testing.assert_allclose(np.asarray(scores), expect, rtol=1e-5)
    assert float(scores[0]) < 0 and float(scores[1]) < 0


def test_ctc_forced_align_brute_force():
    """The Viterbi score must equal the max over ALL length-T paths that
    collapse to the targets, and the recovered spans must match that
    best path's emission frames."""
    import itertools

    import numpy as np

    from avsl_tpu.decode import ctc_forced_align

    rng = np.random.default_rng(3)
    V, T, blank = 4, 6, 0
    for targets in ([1, 2], [2, 2], [3, 1, 3]):
        logits = rng.normal(size=(T, V))
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

        def collapse(path):
            toks, prev = [], -1
            for p in path:
                if p != prev and p != blank:
                    toks.append(p)
                prev = p
            return toks

        best, best_path = -np.inf, None
        for path in itertools.product(range(V), repeat=T):
            if collapse(path) == targets:
                s = sum(lp[t, p] for t, p in enumerate(path))
                if s > best:
                    best, best_path = s, path
        spans, score = ctc_forced_align(lp, targets, blank_id=blank)
        assert abs(score - best) < 1e-9, (score, best, targets)
        # spans must be ordered, non-overlapping, and inside [0, T)
        prev_end = 0
        for (f0, f1) in spans:
            assert 0 <= f0 < f1 <= T and f0 >= prev_end
            prev_end = f1


def test_ctc_forced_align_recovers_designed_spans():
    import numpy as np

    from avsl_tpu.decode import ctc_forced_align

    V, T, blank = 5, 20, 0
    design = {1: (3, 7), 2: (10, 12), 3: (15, 18)}  # token -> frame span
    lp = np.full((T, V), -12.0)
    lp[:, blank] = -0.01
    for tok, (f0, f1) in design.items():
        lp[f0:f1, tok] = -0.01
        lp[f0:f1, blank] = -12.0
    spans, _ = ctc_forced_align(lp, [1, 2, 3], blank_id=blank)
    assert spans == [design[1], design[2], design[3]]


def test_ctc_forced_align_edges():
    import numpy as np
    import pytest

    from avsl_tpu.decode import ctc_forced_align

    lp = np.log(np.full((4, 3), 1 / 3))
    spans, score = ctc_forced_align(lp, [], blank_id=0)
    assert spans == [] and abs(score - 4 * np.log(1 / 3)) < 1e-9
    with pytest.raises(ValueError):
        ctc_forced_align(lp[:1], [1, 2], blank_id=0)


def test_word_alignments_groups_bpe_pieces():
    import numpy as np

    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.decode import ctc_forced_align, word_alignments

    tokenizer = get_tokenizer(None, "en")
    text = " hello world"
    toks = tokenizer.encode(text)
    assert len(toks) >= 2
    # synthetic CTC posteriors emitting each token over 4 frames with
    # 2 blank frames between -> word timestamps at 25 Hz
    blank = tokenizer.vocab_size  # one extra class as blank
    V, per, gap = tokenizer.vocab_size + 1, 4, 2
    T = len(toks) * (per + gap) + gap
    lp = np.full((T, V), -15.0)
    lp[:, blank] = -0.01
    f = gap
    expect_frames = []
    for tok in toks:
        lp[f: f + per, tok] = -0.01
        lp[f: f + per, blank] = -15.0
        expect_frames.append((f, f + per))
        f += per + gap
    spans, _ = ctc_forced_align(lp, toks, blank_id=blank)
    assert spans == expect_frames
    words = word_alignments(toks, spans, tokenizer, frame_rate_hz=25.0)
    assert [w["word"] for w in words] == ["hello", "world"]
    assert words[0]["start_s"] == round(expect_frames[0][0] / 25.0, 3)
    assert words[-1]["end_s"] >= words[-1]["start_s"] > words[0]["start_s"]


def test_forced_align_through_avhubert_ctc_head():
    """End-to-end plumbing: real AVHuBERTForCTC logits (random init) ->
    log-softmax -> best-path transcript -> forced alignment of that
    transcript back onto the same frames. The Viterbi score of the
    best-path's own collapse must be >= any other valid path's by
    construction, and every span must be ordered and in range."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avsl_tpu.core.config import AVHuBERTConfig
    from avsl_tpu.decode import ctc_best_path, ctc_forced_align
    from avsl_tpu.models import AVHuBERTForCTC

    cfg = AVHuBERTConfig.tiny_test(dtype="float32")
    model = AVHuBERTForCTC(cfg)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(1, 12, 104)), jnp.float32)
    video = jnp.asarray(rng.normal(size=(1, 12, 88, 88, 1)) * 0.1, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), audio=audio, video=video)
    logits = np.asarray(model.apply(params, audio=audio, video=video))[0]
    lp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(
        -1, keepdims=True)) - logits.max(-1, keepdims=True)
    targets = ctc_best_path(logits[None], blank_id=cfg.pad_token_id)[0]
    if not targets:  # random init may be all-blank; force a target
        targets = [5]
    spans, score = ctc_forced_align(lp, targets, blank_id=cfg.pad_token_id)
    assert len(spans) == len(targets) and np.isfinite(score)
    prev = 0
    for f0, f1 in spans:
        assert 0 <= f0 < f1 <= lp.shape[0] and f0 >= prev
        prev = f1


def test_sampled_decode_limits_to_greedy_at_low_temperature():
    """temperature -> 0 makes categorical sampling pick the argmax, so
    sampled_decode_scored must reproduce greedy_decode_scored exactly
    (tokens AND scores — both scored on the untempered distribution);
    at temperature 1 a fixed rng is deterministic."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avsl_tpu.decode import greedy_decode_scored, sampled_decode_scored

    rng = np.random.default_rng(7)
    V, B, T, eot = 8, 3, 5, 0
    steps = jnp.asarray(rng.normal(size=(T, B, V)) * 4.0, jnp.float32)

    def step_fn(tok, i):
        return jnp.take(steps, jnp.minimum(i, T - 1), axis=0)[:, None, :], i + 1

    prompt = jnp.ones((B, 1), jnp.int32)
    g_toks, g_scores = greedy_decode_scored(step_fn, 0, prompt, T, eot)
    key = jax.random.PRNGKey(0)
    s_toks, s_scores = sampled_decode_scored(
        step_fn, 0, prompt, T, eot, 1e-6, key
    )
    np.testing.assert_array_equal(np.asarray(s_toks), np.asarray(g_toks))
    np.testing.assert_allclose(
        np.asarray(s_scores), np.asarray(g_scores), rtol=1e-6
    )

    a1 = sampled_decode_scored(step_fn, 0, prompt, T, eot, 1.0, key)
    a2 = sampled_decode_scored(step_fn, 0, prompt, T, eot, 1.0, key)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))


def test_compression_ratio_flags_repetition():
    from avsl_tpu.decode import compression_ratio

    looping = "so so so so so so so so so so so so so so so so"
    normal = "the quick brown fox jumps over the lazy dog tonight"
    assert compression_ratio(looping) > compression_ratio(normal)
    assert compression_ratio(looping) > 2.4
    assert compression_ratio("") == 0.0


def test_dtw_path_recovers_planted_ridge():
    """DTW through a cost matrix with a low-cost monotone ridge must
    follow the ridge exactly; endpoints are pinned by construction."""
    import numpy as np

    from avsl_tpu.decode import dtw_path

    Q, K = 5, 12
    ridge = {0: (0, 3), 1: (3, 5), 2: (5, 9), 3: (9, 10), 4: (10, 12)}
    cost = np.ones((Q, K))
    for r, (a, b) in ridge.items():
        cost[r, a:b] = 0.0
    rows, cols = dtw_path(cost)
    assert rows[0] == 0 and cols[0] == 0
    assert rows[-1] == Q - 1 and cols[-1] == K - 1
    assert (np.diff(rows) >= 0).all() and (np.diff(cols) >= 0).all()
    total = cost[rows, cols].sum()
    assert total == 0.0  # the ridge is followed with zero off-ridge cost


def test_attention_token_spans_from_designed_attention():
    import numpy as np

    from avsl_tpu.decode import attention_token_spans

    H, Q, K = 4, 4, 20
    design = {0: (0, 5), 1: (5, 9), 2: (9, 15), 3: (15, 20)}
    w = np.full((H, Q, K), 0.01)
    for q, (a, b) in design.items():
        w[:, q, a:b] = 1.0
    spans = attention_token_spans(w, n_frames=K, median_width=1)
    assert len(spans) == Q
    for q, (a, b) in design.items():
        f0, f1 = spans[q]
        # DTW boundaries land within one frame of the designed blocks
        assert abs(f0 - a) <= 1 and abs(f1 - b) <= 1, (q, spans[q], (a, b))


def test_whisper_word_timestamps_end_to_end():
    """Teacher-forced capture through the real tiny Whisper-Flamingo:
    intermediates sown only when requested (production forward stays on
    the fused path and returns identical logits), words come back in
    order with non-decreasing times."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.decode import whisper_word_timestamps
    from avsl_tpu.decode.word_timestamps import collect_cross_attention
    from avsl_tpu.models.factory import build_whisper_flamingo

    tokenizer = get_tokenizer(None, "en")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32"
    )
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(1, cfg.n_mels, 100)), jnp.float32)
    video = jnp.asarray(rng.normal(size=(1, 10, 88, 88, 1)) * 0.1, jnp.float32)
    text_ids = tokenizer.encode(" hello world")
    toks = jnp.asarray([tokenizer.sot_sequence("en") + text_ids + [tokenizer.eot]])
    variables = model.init(jax.random.PRNGKey(0), mel, toks, video=video)

    # production forward: no alignment collection requested -> fused
    # path; the capture change must not alter logits. Crucially a
    # TRAINING-style apply with mutable=["intermediates"] (MoE aux) must
    # NOT trigger the capture either.
    base = model.apply(variables, mel, toks, video=video)
    _, train_style = model.apply(
        variables, mel, toks, video=video, mutable=["intermediates"]
    )
    with pytest.raises(ValueError, match="sown"):
        collect_cross_attention(train_style.get("intermediates", {}))
    logits, inter = model.apply(
        variables, mel, toks, video=video, mutable=["alignment"]
    )
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(logits), rtol=2e-4, atol=2e-4
    )
    per_item = collect_cross_attention(inter["alignment"])
    n_layers, n_heads = cfg.n_text_layer, cfg.n_text_head
    assert per_item.shape[:2] == (1, n_layers * n_heads)
    # softmax rows sum to 1 over frames
    np.testing.assert_allclose(per_item.sum(-1), 1.0, rtol=1e-4)

    words = whisper_word_timestamps(
        model, variables, mel, toks, tokenizer, video=video
    )[0]
    assert [w["word"] for w in words] == ["hello", "world"]
    # DTW rows are visited monotonically: starts and ends are ordered
    # (a vertical path step lets adjacent spans share one frame, so a
    # strict end<=next-start need not hold)
    assert 0 <= words[0]["start_s"] <= words[1]["start_s"]
    assert words[0]["end_s"] <= words[1]["end_s"]
    assert all(w["end_s"] > w["start_s"] for w in words)

    with pytest.raises(ValueError, match="sown"):
        collect_cross_attention({"decoder": {}})


def test_ctc_forced_align_repeat_feasibility():
    """targets=[a,a] need >= 3 frames (a, mandatory blank, a): T=2 must
    raise ValueError, never backtrace through an infeasible table."""
    import numpy as np
    import pytest

    from avsl_tpu.decode import ctc_forced_align

    lp = np.log(np.full((2, 4), 0.25))
    with pytest.raises(ValueError, match="emission slots"):
        ctc_forced_align(lp, [1, 1], blank_id=0)
    # and exactly-feasible works
    lp3 = np.log(np.full((3, 4), 0.25))
    spans, _ = ctc_forced_align(lp3, [1, 1], blank_id=0)
    assert spans == [(0, 1), (2, 3)]


def test_beam_nbest_sorted_and_consistent(tiny_whisper):
    """return_nbest=True yields all K hypotheses best-first; row 0 is
    exactly what the default best-only return gives."""
    import numpy as np

    from avsl_tpu.decode import beam_search

    cfg, model, variables, feats = tiny_whisper
    cache = model.apply(variables, feats, None, 16, method=model.init_decode_cache)
    cache_n = model.apply(variables, feats, None, 16, method=model.init_decode_cache)
    prompt = jnp.asarray([[1, 2]] * feats.shape[0], jnp.int32)
    step = _make_step(model, variables)

    best, best_s = beam_search(step, cache, prompt, 3, 8, eot_id=3)
    nbest, nbest_s = beam_search(
        step, cache_n, prompt, 3, 8, eot_id=3, return_nbest=True
    )
    assert nbest.shape == (feats.shape[0], 3, 8)
    np.testing.assert_array_equal(np.asarray(nbest[:, 0]), np.asarray(best))
    np.testing.assert_allclose(
        np.asarray(nbest_s[:, 0]), np.asarray(best_s), atol=1e-6
    )
    s = np.asarray(nbest_s)
    assert (s[:, :-1] >= s[:, 1:] - 1e-6).all(), "scores not sorted"

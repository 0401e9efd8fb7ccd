"""Speculative greedy decoding (decode/speculative.py).

Greedy speculative decoding must be TOKEN-EXACT vs plain greedy decoding
of the target model, for any draft model — the draft only changes how many
target forwards it takes, never the output. Anchors:

* exactness with an independent (differently-initialized, smaller) draft;
* exactness + full acceptance when the draft IS the target;
* avg_logprob matches greedy_decode_scored (same committed-token set);
* the per-sequence (vector) cache-index path in models/layers.py is
  numerically identical to the scalar-index path;
* composition with the int8 KV cache (models/quant.quantize_kv_cache).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsl_tpu.core.config import WhisperConfig
from avsl_tpu.decode import greedy_decode, greedy_decode_scored
from avsl_tpu.decode.speculative import (
    broadcast_cache_index,
    speculative_greedy_decode,
)
from avsl_tpu.models import Whisper


def _model(seed, n_layer=2, n_state=64, n_head=2):
    cfg = WhisperConfig.tiny_test(
        dtype="float32",
        n_text_layer=n_layer, n_text_state=n_state, n_text_head=n_head,
        n_audio_layer=1, n_audio_state=n_state, n_audio_head=n_head,
    )
    model = Whisper(cfg)
    rng = np.random.default_rng(seed)
    mel = jnp.asarray(rng.normal(size=(3, cfg.n_mels, 64)), jnp.float32)
    toks = jnp.asarray([[1, 2]] * 3, jnp.int32)
    variables = model.init(jax.random.PRNGKey(seed), mel, toks)
    return model, cfg, variables, mel


def _setup(seed_target=0, seed_draft=7, max_new=12, k=4, kv_int8=False):
    model_t, cfg, vars_t, mel = _model(seed_target)
    model_d, _, vars_d, _ = _model(seed_draft, n_layer=1, n_state=32)
    feats_t, _ = model_t.apply(vars_t, mel, None, method=model_t.encode)
    feats_d, _ = model_d.apply(vars_d, mel, None, method=model_d.encode)
    prompt = jnp.asarray([[1, 2], [1, 2], [1, 2]], jnp.int32)
    need = prompt.shape[1] + max_new + k

    def step_t(tok, c):
        return model_t.apply(vars_t, tok, None, None, c, method=model_t.decode)

    def step_d(tok, c):
        return model_d.apply(vars_d, tok, None, None, c, method=model_d.decode)

    def cache_t():
        c = model_t.apply(vars_t, feats_t, None, need, method=model_t.init_decode_cache)
        if kv_int8:
            from avsl_tpu.models.quant import quantize_kv_cache

            c = quantize_kv_cache(c)
        return c

    def cache_d():
        return model_d.apply(vars_d, feats_d, None, need, method=model_d.init_decode_cache)

    eot = cfg.n_vocab - 1
    return step_t, step_d, cache_t, cache_d, prompt, eot


def test_exact_vs_greedy_independent_draft():
    max_new, k = 12, 4
    step_t, step_d, cache_t, cache_d, prompt, eot = _setup(max_new=max_new, k=k)
    ref = greedy_decode(step_t, cache_t(), prompt, max_new, eot)
    res = speculative_greedy_decode(
        step_t, step_d, cache_t(), cache_d(), prompt, max_new, eot, k=k
    )
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(ref))
    # an unrelated random draft should not be a perfect oracle
    assert float(res.accept_rate) < 1.0


def test_exact_and_full_accept_with_self_draft():
    max_new, k = 12, 3
    step_t, _, cache_t, _, prompt, eot = _setup(max_new=max_new, k=k)
    ref = greedy_decode(step_t, cache_t(), prompt, max_new, eot)
    res = speculative_greedy_decode(
        step_t, step_t, cache_t(), cache_t(), prompt, max_new, eot, k=k
    )
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(ref))
    # the draft IS the target: every draft token the budget admits is
    # accepted, and each round commits k+1 tokens
    assert float(res.accept_rate) == pytest.approx(1.0)
    assert int(res.rounds) <= -(-max_new // (k + 1)) + 1


def test_avg_logprob_matches_greedy_scored():
    max_new, k = 10, 4
    step_t, step_d, cache_t, cache_d, prompt, eot = _setup(max_new=max_new, k=k)
    _, ref_score = greedy_decode_scored(step_t, cache_t(), prompt, max_new, eot)
    res = speculative_greedy_decode(
        step_t, step_d, cache_t(), cache_d(), prompt, max_new, eot, k=k
    )
    np.testing.assert_allclose(
        np.asarray(res.avg_logprob), np.asarray(ref_score), atol=1e-4
    )


def test_exact_under_jit_and_kv_int8():
    max_new, k = 8, 2
    step_t, step_d, cache_t, cache_d, prompt, eot = _setup(
        max_new=max_new, k=k, kv_int8=True
    )
    # int8 target cache for BOTH paths so the comparison is apples-to-apples
    ref = greedy_decode(step_t, cache_t(), prompt, max_new, eot)

    @jax.jit
    def run(tc, dc):
        return speculative_greedy_decode(
            step_t, step_d, tc, dc, prompt, max_new, eot, k=k
        )

    res = run(cache_t(), cache_d())
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(ref))


def test_vector_cache_index_matches_scalar():
    """The [B]-index incremental-attention path must be numerically
    identical to the scalar-index path when all sequences share the same
    offset."""
    model, cfg, variables, mel = _model(3)
    feats, _ = model.apply(variables, mel, None, method=model.encode)
    cache_s = model.apply(variables, feats, None, 16, method=model.init_decode_cache)
    cache_v = broadcast_cache_index(cache_s, mel.shape[0])
    toks = jnp.asarray([[1, 2, 3], [4, 5, 6], [7, 8, 9]], jnp.int32)

    lg_s, cs = model.apply(variables, toks, None, None, cache_s, method=model.decode)
    lg_v, cv = model.apply(variables, toks, None, None, cache_v, method=model.decode)
    np.testing.assert_allclose(np.asarray(lg_s), np.asarray(lg_v), atol=1e-5)

    # and again one step later (offset 3 vs [3,3,3])
    tok2 = jnp.asarray([[0], [1], [2]], jnp.int32)
    lg_s2, _ = model.apply(variables, tok2, None, None, cs, method=model.decode)
    lg_v2, _ = model.apply(variables, tok2, None, None, cv, method=model.decode)
    np.testing.assert_allclose(np.asarray(lg_s2), np.asarray(lg_v2), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(cv[0]["self"]["index"]), np.full((3,), 3)
    )


def test_cache_too_small_raises():
    max_new, k = 8, 4
    step_t, step_d, cache_t, cache_d, prompt, eot = _setup(max_new=20, k=k)
    small = cache_t()  # sized for max_new=20 -> fine for 8, shrink check:
    with pytest.raises(ValueError):
        speculative_greedy_decode(
            step_t, step_d, small, cache_d(), prompt, 40, eot, k=k
        )


def test_transcriber_with_draft_end_to_end():
    """Serving surface: StreamingTranscriber(draft_model=...) returns the
    SAME text and confidence as plain greedy serving."""
    import jax.numpy as jnp

    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.infer import StreamingTranscriber
    from avsl_tpu.models.factory import build_whisper_flamingo

    tokenizer = get_tokenizer(None, "en")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32"
    )
    rng = np.random.default_rng(0)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]], jnp.int32),
        video=jnp.zeros((1, 8, 88, 88, 1), jnp.float32),
    )
    dmodel, dcfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32",
        add_gated_x_attn=False,
    )
    dvars = dmodel.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, dcfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]], jnp.int32),
    )
    items = [
        {"id": "a", "audio": (0.1 * rng.standard_normal(16000)).astype(np.float32)},
        {"id": "b", "audio": (0.1 * rng.standard_normal(16000)).astype(np.float32)},
    ]

    def make(**kw):
        return StreamingTranscriber(
            model, variables, tokenizer,
            audio_max_length=16000, video_frames=8, batch_size=2,
            max_new_tokens=6, **kw,
        )

    res_ref = make().transcribe_batch(items)
    res_spec = make(
        draft_model=dmodel, draft_variables=dvars, spec_k=3
    ).transcribe_batch(items)
    assert [r.text for r in res_spec] == [r.text for r in res_ref]
    for f, q in zip(res_ref, res_spec):
        assert q.avg_logprob == pytest.approx(f.avg_logprob, abs=0.05)


def test_transcriber_draft_beam_conflict():
    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.infer import StreamingTranscriber
    from avsl_tpu.models.factory import build_whisper_flamingo

    tokenizer = get_tokenizer(None, "en")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32"
    )
    with pytest.raises(ValueError):
        StreamingTranscriber(
            model, {}, tokenizer, beam_size=2,
            draft_model=model, draft_variables={},
        )


def test_transcribe_cli_smoke_with_draft(tmp_path, monkeypatch):
    """cli.transcribe --draft_model test --smoke: the full CLI path builds
    the draft, runs the speculative program, and writes results."""
    import os

    import scipy.io.wavfile as wavfile

    from avsl_tpu.cli import transcribe

    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    for i in range(2):
        sr = 16000
        x = (0.2 * np.sin(2 * np.pi * (200 + 80 * i) * np.arange(sr) / sr)
             ).astype(np.float32)
        wavfile.write(str(seg_dir / f"seg{i}.wav"), sr, (x * 32767).astype(np.int16))

    monkeypatch.chdir(tmp_path)
    out = transcribe.main(
        ["--input", str(seg_dir), "--smoke", "--batch_size", "2",
         "--max_new_tokens", "6", "--draft_model", "test", "--spec_k", "3",
         "--output", str(tmp_path / "out.json")]
    )
    assert len(out) == 2
    assert os.path.exists(str(tmp_path / "out.json"))


def test_spec_exact_on_avhubert_seq2seq():
    """Speculative decoding generalizes beyond Whisper: the AV-HuBERT
    seq2seq decoder (fairseq-layout positions, avhubert.py) decodes
    token-exactly vs greedy under a draft, via the same vector-index
    cache machinery."""
    from avsl_tpu.core.config import AVHuBERTConfig
    from avsl_tpu.models.avhubert import AVHuBERTForSpeech2Text

    cfg = AVHuBERTConfig.tiny_test(dtype="float32")
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(2, 12, 104)), jnp.float32)
    video = jnp.asarray(rng.normal(size=(2, 12, 32, 32, 1)), jnp.float32)

    def build(seed):
        model = AVHuBERTForSpeech2Text(cfg)
        labels = jnp.asarray([[5, 6, 2, -100], [7, 8, 2, -100]])
        variables = model.init(
            jax.random.PRNGKey(seed), audio=audio, video=video, labels=labels
        )
        enc = model.apply(variables, audio=audio, video=video,
                          method=model.encode)
        return model, variables, enc

    mt, vt, enc_t = build(0)
    md, vd, enc_d = build(11)
    max_new, k = 10, 3
    prompt = jnp.asarray([[cfg.eos_token_id, 5], [cfg.eos_token_id, 7]],
                         jnp.int32)
    need = prompt.shape[1] + max_new + k
    eot = cfg.eos_token_id

    def step_t(t, c):
        return mt.apply(vt, t, enc_t, None, c, method=mt.decode)

    def step_d(t, c):
        return md.apply(vd, t, enc_d, None, c, method=md.decode)

    ct = lambda: mt.apply(vt, enc_t, need, method=mt.init_decode_cache)
    cd = lambda: md.apply(vd, enc_d, need, method=md.init_decode_cache)

    ref = greedy_decode(step_t, ct(), prompt, max_new, eot)
    res = speculative_greedy_decode(
        step_t, step_d, ct(), cd(), prompt, max_new, eot, k=k
    )
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(ref))

    # self-draft: high acceptance (not exactly 1.0 — an in-round EOT cuts
    # the committed prefix and the trailing drafts count as wasted, which
    # is the honest utilization number)
    res2 = speculative_greedy_decode(
        step_t, step_t, ct(), ct(), prompt, max_new, eot, k=k
    )
    np.testing.assert_array_equal(np.asarray(res2.tokens), np.asarray(ref))
    assert float(res2.accept_rate) > 0.8


def test_transcriber_draft_under_tp_mesh_matches_single_device():
    """Speculative decoding composes with multi-chip serving: the spec
    loop's per-sequence scatter writes and index vectors shard on the
    batch axis under the dp=2 x tp=4 SPMD program (draft replicated),
    token-exact vs the single-device speculative run AND vs plain
    greedy."""
    from avsl_tpu.core.mesh import make_mesh
    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.infer import StreamingTranscriber
    from avsl_tpu.models.factory import build_whisper_flamingo

    tokenizer = get_tokenizer(None, "en")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32"
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]], jnp.int32),
        video=jnp.zeros((1, 8, 88, 88, 1), jnp.float32),
    )
    dmodel, dcfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32",
        add_gated_x_attn=False,
    )
    dvars = dmodel.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, dcfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]], jnp.int32),
    )
    rng = np.random.default_rng(0)
    items = [
        {"id": "a", "audio": (0.1 * rng.standard_normal(16000)).astype(np.float32)},
        {"id": "b", "audio": (0.1 * rng.standard_normal(16000)).astype(np.float32)},
    ]
    kw = dict(audio_max_length=16000, video_frames=8, batch_size=2,
              max_new_tokens=6)
    spec = dict(draft_model=dmodel, draft_variables=dvars, spec_k=3)

    ref = StreamingTranscriber(
        model, variables, tokenizer, **kw
    ).transcribe_batch(items)
    single = StreamingTranscriber(
        model, variables, tokenizer, **kw, **spec
    ).transcribe_batch(items)
    mesh = make_mesh(8, model_parallel=4)
    meshed = StreamingTranscriber(
        model, variables, tokenizer, mesh=mesh, **kw, **spec
    ).transcribe_batch(items)
    assert [r.tokens for r in single] == [r.tokens for r in ref]
    assert [r.tokens for r in meshed] == [r.tokens for r in ref]
    assert [r.text for r in meshed] == [r.text for r in ref]


def test_spec_property_fuzz_vs_greedy():
    """Property sweep over the algorithm's edge dimensions — prompt
    length (draft-warmup branch), k=1 (no draft scan), max_new < k,
    max_new = 1 — every combination must be token- and score-exact vs
    greedy_decode_scored."""
    model_t, cfg, vars_t, mel = _model(0)
    model_d, _, vars_d, _ = _model(13, n_layer=1, n_state=32)
    feats_t, _ = model_t.apply(vars_t, mel, None, method=model_t.encode)
    feats_d, _ = model_d.apply(vars_d, mel, None, method=model_d.encode)
    eot = cfg.n_vocab - 1

    def step_t(tok, c):
        return model_t.apply(vars_t, tok, None, None, c, method=model_t.decode)

    def step_d(tok, c):
        return model_d.apply(vars_d, tok, None, None, c, method=model_d.decode)

    cases = [
        (2, 1, 1),   # minimal everything
        (2, 5, 2),   # k > max_new... no: (p, max_new, k)
        (3, 2, 4),   # max_new < k
        (4, 6, 1),   # k=1: no draft scan
        (5, 7, 3),   # long prompt warmup (p-2 = 3 tokens)
    ]
    for p, max_new, k in cases:
        prompt = jnp.tile(
            jnp.arange(1, p + 1, dtype=jnp.int32)[None], (3, 1)
        )
        need = p + max_new + k

        def ct():
            return model_t.apply(
                vars_t, feats_t, None, need, method=model_t.init_decode_cache
            )

        def cd():
            return model_d.apply(
                vars_d, feats_d, None, need, method=model_d.init_decode_cache
            )

        ref_t, ref_s = greedy_decode_scored(step_t, ct(), prompt, max_new, eot)
        res = speculative_greedy_decode(
            step_t, step_d, ct(), cd(), prompt, max_new, eot, k=k
        )
        np.testing.assert_array_equal(
            np.asarray(res.tokens), np.asarray(ref_t),
            err_msg=f"tokens diverged at p={p} max_new={max_new} k={k}",
        )
        np.testing.assert_allclose(
            np.asarray(res.avg_logprob), np.asarray(ref_s), atol=1e-4,
            err_msg=f"scores diverged at p={p} max_new={max_new} k={k}",
        )


def test_transcriber_rejects_bad_spec_k():
    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.infer import StreamingTranscriber
    from avsl_tpu.models.factory import build_whisper_flamingo

    tokenizer = get_tokenizer(None, "en")
    model, _ = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32"
    )
    with pytest.raises(ValueError, match="spec_k"):
        StreamingTranscriber(
            model, {}, tokenizer, draft_model=model, draft_variables={},
            spec_k=0,
        )


def test_spec_stats_telemetry():
    """spec_stats() reports mean acceptance + verify rounds after
    speculative batches, and stays None for plain greedy serving."""
    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.infer import StreamingTranscriber
    from avsl_tpu.models.factory import build_whisper_flamingo

    tokenizer = get_tokenizer(None, "en")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32"
    )
    rng = np.random.default_rng(0)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]], jnp.int32),
        video=jnp.zeros((1, 8, 88, 88, 1), jnp.float32),
    )
    dmodel, dcfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32",
        add_gated_x_attn=False,
    )
    dvars = dmodel.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, dcfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]], jnp.int32),
    )
    items = [
        {"id": "a", "audio": (0.1 * rng.standard_normal(16000)).astype(np.float32)},
    ]
    kw = dict(audio_max_length=16000, video_frames=8, batch_size=1,
              max_new_tokens=6)

    plain = StreamingTranscriber(model, variables, tokenizer, **kw)
    plain.transcribe_batch(items)
    assert plain.spec_stats() is None

    tr = StreamingTranscriber(
        model, variables, tokenizer, **kw,
        draft_model=dmodel, draft_variables=dvars, spec_k=2,
    )
    tr.transcribe_batch(items)
    tr.transcribe_batch(items)
    stats = tr.spec_stats()
    assert stats["batches"] == 2
    assert 0.0 <= stats["mean_accept_rate"] <= 1.0
    assert stats["mean_verify_rounds"] >= 1.0

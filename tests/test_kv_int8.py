"""int8 KV cache for the decode loop (models/quant.quantize_kv_cache).

The precomputed cross-attention (and Flamingo xv) K/V are re-read in
full on every decode step — the dominant HBM traffic at the large
envelope alongside the weights. quantize_kv_cache compresses them to
int8 with per-row scales; attention dequantizes on read
(models/layers.py). Anchors:

* per-row quantization round-trips within the int8 resolution bound;
* the 'self' (incremental) entries are left untouched;
* full greedy decode through a real Whisper(+Flamingo) model produces
  the SAME tokens as the bf16 cache on a well-conditioned model;
* beam-search cache tiling/gather handles QTensor leaves.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsl_tpu.models.quant import QTensor, quantize_kv_cache, quantize_rows


def test_quantize_rows_roundtrip_bound():
    rng = np.random.default_rng(0)
    # heterogeneous row magnitudes: per-row scales must keep small rows
    # accurate next to a 100x outlier row
    x = rng.normal(size=(2, 6, 4, 16)).astype(np.float32)
    x[0, 3] *= 100.0
    qt = quantize_rows(jnp.asarray(x))
    assert qt.q.dtype == jnp.int8
    assert qt.scale.shape == (2, 6, 4, 1)
    back = np.asarray(qt.dequantize(jnp.float32))
    # |err| <= scale/2 per element (symmetric rounding)
    bound = np.asarray(qt.scale) / 2.0 + 1e-8
    assert (np.abs(back - x) <= bound).all()
    # zero rows stay exactly zero (scale guard, no NaN)
    z = quantize_rows(jnp.zeros((1, 2, 1, 8)))
    assert float(jnp.abs(z.dequantize()).max()) == 0.0


def test_quantize_kv_cache_targets_static_entries_only():
    b, t, h, d = 2, 5, 2, 8
    entry = {
        "self": {
            "k": jnp.zeros((b, 10, h, d)),
            "v": jnp.zeros((b, 10, h, d)),
            "index": jnp.zeros((), jnp.int32),
        },
        "cross": {"k": jnp.ones((b, t, h, d)), "v": jnp.ones((b, t, h, d))},
        "xv": {"k": jnp.ones((b, 3, h, d)), "v": jnp.ones((b, 3, h, d))},
    }
    out = quantize_kv_cache([entry])[0]
    assert isinstance(out["cross"]["k"], QTensor)
    assert isinstance(out["xv"]["v"], QTensor)
    # incremental self-attn buffers untouched (written per step)
    assert not isinstance(out["self"]["k"], QTensor)
    assert out["self"]["index"].dtype == jnp.int32
    # idempotent
    again = quantize_kv_cache([out])[0]
    assert again["cross"]["k"] is out["cross"]["k"]


def _tiny_whisper():
    from avsl_tpu.core.config import WhisperConfig
    from avsl_tpu.models import Whisper

    cfg = WhisperConfig.tiny_test(dtype="float32")
    model = Whisper(cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(2, cfg.n_mels, 64)), jnp.float32)
    toks = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), mel, toks)
    return model, cfg, variables, mel


def test_greedy_decode_matches_bf16_cache():
    from avsl_tpu.decode import greedy_decode_scored

    model, cfg, variables, mel = _tiny_whisper()
    feats, _ = model.apply(variables, mel, None, method=model.encode)
    prompt = jnp.asarray([[1, 2], [1, 2]], jnp.int32)
    max_new = 8

    def run(compress):
        cache = model.apply(
            variables, feats, None, max_new + prompt.shape[1] + 2,
            method=model.init_decode_cache,
        )
        if compress:
            cache = quantize_kv_cache(cache)

        def step(tok, c):
            return model.apply(variables, tok, None, None, c, method=model.decode)

        return greedy_decode_scored(
            step, cache, prompt, max_new, eot_id=cfg.n_vocab - 1
        )

    toks_f, score_f = run(False)
    toks_q, score_q = run(True)
    np.testing.assert_array_equal(np.asarray(toks_f), np.asarray(toks_q))
    np.testing.assert_allclose(
        np.asarray(score_q), np.asarray(score_f), atol=0.05
    )


def test_beam_cache_ops_handle_qtensor_leaves():
    from avsl_tpu.decode.beam import _gather_beams, _tile_beams

    qt = quantize_rows(
        jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 2, 8)),
                    jnp.float32)
    )
    cache = [{"cross": {"k": qt, "v": qt}}]
    tiled = _tile_beams(cache, 3)
    tk = tiled[0]["cross"]["k"]
    assert isinstance(tk, QTensor) and tk.q.shape[0] == 6
    assert tk.scale.shape[0] == 6
    # gather back beam 0 of each batch item -> original rows
    gathered = _gather_beams(tiled, jnp.asarray([0, 3]))
    gk = gathered[0]["cross"]["k"]
    np.testing.assert_array_equal(np.asarray(gk.q), np.asarray(qt.q))
    np.testing.assert_allclose(np.asarray(gk.scale), np.asarray(qt.scale))


def test_transcriber_kv_int8_end_to_end():
    """The serving surface: StreamingTranscriber(kv_int8=True) decodes a
    synthetic batch and returns the same tokens as the float cache."""
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
    items = [
        {"id": "a", "audio": (0.1 * rng.standard_normal(16000)).astype(np.float32)},
        {"id": "b", "audio": (0.1 * rng.standard_normal(16000)).astype(np.float32)},
    ]

    def make(kv):
        return StreamingTranscriber(
            model, variables, tokenizer,
            audio_max_length=16000, video_frames=8, batch_size=2,
            max_new_tokens=6, kv_int8=kv,
        )

    res_f = make(False).transcribe_batch(items)
    res_q = make(True).transcribe_batch(items)
    assert [r.text for r in res_q] == [r.text for r in res_f]
    for f, q in zip(res_f, res_q):
        assert q.avg_logprob == pytest.approx(f.avg_logprob, abs=0.05)

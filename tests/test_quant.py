"""Weight-only int8 quantization (models/quant.py).

The reference has no quantization story (it serves Lightning fp16,
/root/reference/avsl/whisper_flamingo_ft_ami.py:979); this is a
TPU-native addition for the HBM-bound autoregressive decode loop.
Tests: per-channel error bound, predicate selectivity, embedding
row-scale layout, model-level logit fidelity, and the serving path
end-to-end with ``quantize="int8"``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsl_tpu.models.quant import (
    QTensor,
    dequantize_tree,
    quantize_array,
    quantize_tree,
    quantization_report,
)


def test_per_channel_error_bound():
    rng = np.random.default_rng(0)
    # channels with wildly different magnitudes: per-channel scales must
    # keep each channel's error within its OWN half-step, not the max's
    w = rng.normal(size=(64, 128)).astype(np.float32)
    w *= np.logspace(-2, 2, 128)[None, :]
    qt = quantize_array(jnp.asarray(w), channel_axis=-1)
    assert qt.q.dtype == jnp.int8
    assert qt.scale.shape == (1, 128)
    err = np.abs(np.asarray(qt.dequantize(jnp.float32)) - w)
    half_step = np.asarray(qt.scale) / 2 + 1e-9
    assert np.all(err <= half_step)


def test_zero_channel_safe():
    w = jnp.zeros((8, 4096))
    qt = quantize_array(w)
    assert np.all(np.asarray(qt.dequantize()) == 0)
    assert np.all(np.isfinite(np.asarray(qt.scale)))


def test_predicate_selectivity_and_embedding_axis():
    tree = {
        "params": {
            "dense": {"kernel": jnp.ones((128, 64)), "bias": jnp.ones((64,))},
            "x_attn_gate": jnp.zeros((1,)),
            "ln": {"scale": jnp.ones((64,)), "bias": jnp.zeros((64,))},
            "token_embedding": {"embedding": jnp.ones((512, 32))},
            "tiny": {"kernel": jnp.ones((4, 4))},  # < 4096 elements
        }
    }
    qt = quantize_tree(tree)
    p = qt["params"]
    assert isinstance(p["dense"]["kernel"], QTensor)
    assert not isinstance(p["dense"]["bias"], QTensor)
    assert not isinstance(p["x_attn_gate"], QTensor)
    assert not isinstance(p["ln"]["scale"], QTensor)
    assert not isinstance(p["tiny"]["kernel"], QTensor)
    emb = p["token_embedding"]["embedding"]
    assert isinstance(emb, QTensor)
    # per-ROW scale: lookup unit AND tied-logit output channel
    assert emb.scale.shape == (512, 1)

    rep = quantization_report(tree, qt)
    assert rep["n_quantized_leaves"] == 2
    assert rep["compression"] > 2.0  # int8+scales vs fp32 on the big leaves

    deq = dequantize_tree(qt)
    # structure restored; non-quantized leaves pass through bit-identical
    assert deq["params"]["dense"]["bias"].dtype == jnp.float32
    assert deq["params"]["dense"]["kernel"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(deq["params"]["ln"]["scale"]), np.ones((64,))
    )


def test_model_logit_fidelity():
    """Quantized tiny Whisper-Flamingo: encoder features stay close to
    the float model's (relative error comparable to bf16 rounding)."""
    from avsl_tpu.models.factory import build_whisper_flamingo

    model, cfg = build_whisper_flamingo("test", vocab_size=256, dtype="float32")
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.n_mels, 100))
    video = jax.random.normal(jax.random.PRNGKey(2), (1, 20, 88, 88, 1)) * 0.1
    variables = model.init(rng, mel, jnp.asarray([[1]]), video=video)

    feats, _ = model.apply(variables, mel, video, method=model.encode)
    qv = dequantize_tree(quantize_tree(variables), jnp.float32)
    qfeats, _ = model.apply(qv, mel, video, method=model.encode)

    ref = np.asarray(feats, np.float32)
    got = np.asarray(qfeats, np.float32)
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.05, f"relative encoder drift {rel:.4f}"


def test_transcriber_int8_end_to_end(tmp_path):
    """Serving path with quantize='int8' runs the full jitted program
    (int8 buffers as program inputs, dequant inside the jit) and emits
    well-formed results; bytes actually shrink."""
    from avsl_tpu.data.audio_segments import write_wav
    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.infer import StreamingTranscriber
    from avsl_tpu.models.factory import build_whisper_flamingo
    from avsl_tpu.models.quant import tree_bytes

    sr = 16000
    wav = str(tmp_path / "seg.wav")
    write_wav(wav, (0.2 * np.sin(2 * np.pi * 300 * np.arange(sr) / sr)).astype(np.float32))

    tokenizer = get_tokenizer(None, "en")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32"
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]]),
        video=jnp.zeros((1, 20, 88, 88, 1), jnp.float32),
    )
    fp_bytes = tree_bytes(variables)
    tr = StreamingTranscriber(
        model, variables, tokenizer,
        audio_max_length=16000, video_frames=20,
        batch_size=2, max_new_tokens=4, quantize="int8",
    )
    assert tree_bytes(tr.variables) < 0.55 * fp_bytes
    results = tr.transcribe([{"id": "a", "audio": wav}, {"id": "b", "audio": wav}])
    assert [r.id for r in results] == ["a", "b"]
    for r in results:
        assert isinstance(r.text, str)
        assert len(r.tokens) > 0

    with pytest.raises(ValueError):
        StreamingTranscriber(
            model, variables, tokenizer,
            audio_max_length=16000, video_frames=20,
            batch_size=2, max_new_tokens=4, quantize="int4",
        )


def test_quantize_tree_is_idempotent():
    """Re-quantizing an already-quantized tree must be a no-op — without
    the QTensor leaf guard the fp32 scale tensors themselves would get
    quantized on the second pass."""
    import jax
    import jax.numpy as jnp

    from avsl_tpu.models.quant import QTensor, quantize_tree

    tree = {"w": jnp.ones((64, 128), jnp.float32) * 0.3}
    q1 = quantize_tree(tree)
    assert isinstance(q1["w"], QTensor)
    q2 = quantize_tree(q1)
    assert isinstance(q2["w"], QTensor)
    assert not isinstance(q2["w"].scale, QTensor)
    assert q2["w"].scale.dtype == q1["w"].scale.dtype
    assert jax.tree_util.tree_structure(q1) == jax.tree_util.tree_structure(q2)

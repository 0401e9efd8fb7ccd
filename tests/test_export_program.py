"""StableHLO serving-program export (infer/export.py, cli.export_program).

The exported artifact must replay the EXACT serving computation with no
model code: round-trip (export -> deserialize -> call) produces the same
tokens and scores as the live transcriber program, the manifest reports
the real shapes, and cross-platform export for TPU serializes from a CPU
host."""

import json
import os

import numpy as np
import pytest


def _transcriber(beam=1):
    import jax
    import jax.numpy as jnp

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
    return StreamingTranscriber(
        model, variables, tokenizer,
        audio_max_length=16000, video_frames=8, batch_size=2,
        max_new_tokens=6, beam_size=beam,
    )


def test_export_roundtrip_matches_live_program(tmp_path):
    import jax.numpy as jnp

    from avsl_tpu.infer import export_serving_program, load_exported

    tr = _transcriber()
    path = str(tmp_path / "model.stablehlo")
    manifest = export_serving_program(tr, path)
    assert os.path.exists(path) and os.path.exists(path + ".json")
    assert manifest["inputs"][0]["shape"] == [2, 16000]
    assert manifest["eot_id"] == tr.tokenizer.eot

    rng = np.random.default_rng(0)
    audio = jnp.asarray(0.1 * rng.standard_normal((2, 16000)), jnp.float32)
    video = jnp.zeros((2, 8, 88, 88, 1), jnp.float32)
    prompt = jnp.asarray(tr._prompt)

    live_toks, live_scores = tr._run(audio, video, prompt)
    call, m2 = load_exported(path)
    exp_toks, exp_scores = call(audio, video, prompt)
    np.testing.assert_array_equal(np.asarray(exp_toks), np.asarray(live_toks))
    np.testing.assert_allclose(
        np.asarray(exp_scores), np.asarray(live_scores), atol=1e-5
    )
    assert m2["bytes"] == os.path.getsize(path)


def test_export_cross_platform_tpu_serializes(tmp_path):
    """A CPU host can lower + serialize the artifact FOR TPU (it cannot
    run it here; platforms in the manifest record the target)."""
    from avsl_tpu.infer import export_serving_program

    tr = _transcriber()
    path = str(tmp_path / "model_tpu.stablehlo")
    manifest = export_serving_program(tr, path, platforms=("tpu",))
    assert manifest["platforms"] == ["tpu"]
    assert os.path.getsize(path) > 0


def test_export_cli_smoke(tmp_path):
    from avsl_tpu.cli import export_program

    out = str(tmp_path / "m.stablehlo")
    manifest = export_program.main(
        ["--smoke", "--output", out, "--batch_size", "2",
         "--max_new_tokens", "4"]
    )
    assert os.path.exists(out)
    with open(out + ".json") as f:
        assert json.load(f)["max_new_tokens"] == 4


def test_export_rejects_mesh_transcriber():
    import jax
    import jax.numpy as jnp

    from avsl_tpu.core.mesh import make_mesh
    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.infer import StreamingTranscriber, export_serving_program
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
    tr = StreamingTranscriber(
        model, variables, tokenizer, audio_max_length=16000,
        video_frames=8, batch_size=2, max_new_tokens=4,
        mesh=make_mesh(8, model_parallel=4),
    )
    with pytest.raises(ValueError, match="mesh-sharded"):
        export_serving_program(tr, "/tmp/never_written.stablehlo")

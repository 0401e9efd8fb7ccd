"""StreamingTranscriber serving-path tests: lip-clip, RAW-closeup, and
audio-only items mixing in one static-shape batch.

The raw path exercises the staged on-device lip frontend end-to-end
inside the transcriber (detection -> trajectory -> closed-form coords ->
chunked sampling), the same chain bench.py measures."""

import os

import numpy as np
import jax
import pytest

from avsl_tpu.data.audio_segments import write_wav
from avsl_tpu.data.lip_roi import canonical_mean_face
from avsl_tpu.data.tokenizer import get_tokenizer
from avsl_tpu.data.video_io import write_video_frames
from avsl_tpu.infer import StreamingTranscriber
from avsl_tpu.models.factory import build_whisper_flamingo

T_FRAMES = 50
SRC_H, SRC_W = 144, 176


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    rng = np.random.default_rng(0)
    sr = 16000
    wav = str(root / "seg.wav")
    write_wav(wav, (0.2 * np.sin(2 * np.pi * 300 * np.arange(sr) / sr)).astype(np.float32))

    # raw synthetic closeup (moving blob face)
    base = rng.integers(40, 200, (SRC_H, SRC_W)).astype(np.float32)
    yy, xx = np.mgrid[0:SRC_H, 0:SRC_W]
    frames = np.empty((T_FRAMES, SRC_H, SRC_W), np.uint8)
    for t in range(T_FRAMES):
        face = 80 * np.exp(
            -(((xx - 88 - 4 * np.sin(t / 6)) / 26.0) ** 2 + ((yy - 70) / 36.0) ** 2)
        )
        frames[t] = np.clip(base + face, 0, 255).astype(np.uint8)
    raw = str(root / "seg-video.mp4")
    write_video_frames(raw, frames, fps=25)

    lip = str(root / "seg-lip.mp4")
    write_video_frames(lip, rng.integers(0, 255, (T_FRAMES, 96, 96)).astype(np.uint8), fps=25)
    return {"wav": wav, "raw": raw, "lip": lip}


def test_transcriber_mixes_lip_raw_and_audio_only(media):
    tokenizer = get_tokenizer(None, "en")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32"
    )
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    variables = model.init(
        rng,
        jnp.zeros((1, cfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]]),
        video=jnp.zeros((1, T_FRAMES, 88, 88, 1), jnp.float32),
    )
    tr = StreamingTranscriber(
        model, variables, tokenizer,
        audio_max_length=16000, video_frames=T_FRAMES,
        batch_size=4, max_new_tokens=4,
        raw_video_hw=(SRC_H, SRC_W),
    )
    items = [
        {"id": "lipclip", "audio": media["wav"], "lip_video": media["lip"]},
        {"id": "rawvideo", "audio": media["wav"], "video": media["raw"]},
        {"id": "audioonly", "audio": media["wav"]},
    ]
    results = tr.transcribe(items)
    assert [r.id for r in results] == ["lipclip", "rawvideo", "audioonly"]
    assert results[0].has_video and results[1].has_video
    assert not results[2].has_video
    for r in results:
        assert isinstance(r.text, str)
        assert len(r.tokens) > 0


def test_transcriber_raw_video_affects_output(media):
    """With a nonzero x-attn gate the raw-video path must change the
    decoded tokens vs audio-only — proving the on-device lip frontend
    feeds real features through the gated cross-attention."""
    tokenizer = get_tokenizer(None, "en")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32"
    )
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]]),
        video=jnp.zeros((1, T_FRAMES, 88, 88, 1), jnp.float32),
    )
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    for blk in variables["params"]["decoder"].values():
        if isinstance(blk, dict) and "x_attn_gate" in blk:
            blk["x_attn_gate"] = jnp.ones_like(blk["x_attn_gate"])

    tr = StreamingTranscriber(
        model, variables, tokenizer,
        audio_max_length=16000, video_frames=T_FRAMES,
        batch_size=2, max_new_tokens=6,
        raw_video_hw=(SRC_H, SRC_W),
    )
    results = tr.transcribe([
        {"id": "av", "audio": media["wav"], "video": media["raw"]},
        {"id": "a", "audio": media["wav"]},
    ])
    av, a = results
    assert av.has_video and not a.has_video
    # same audio; only the video stream differs -> gated x-attn must see it
    assert av.tokens != a.tokens


def test_corrupt_lip_clip_falls_back_to_raw(media, tmp_path):
    """A lip_video that exists but fails to decode must fall back to the
    item's raw closeup (not silently drop to audio-only). Default mode
    lip-crops that raw closeup on the HOST with the same RefinedMouthTracker
    the offline preprocessing uses (serve/preprocess crop parity);
    raw_lip_mode='device' keeps the on-device staged-frontend crop."""
    tokenizer = get_tokenizer(None, "en")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32"
    )
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]]),
        video=jnp.zeros((1, T_FRAMES, 88, 88, 1), jnp.float32),
    )
    corrupt = str(tmp_path / "bad-lip.mp4")
    with open(corrupt, "wb") as f:
        f.write(b"notavideo" * 300)
    item = {"audio": media["wav"], "lip_video": corrupt, "video": media["raw"]}

    tr = StreamingTranscriber(
        model, variables, tokenizer,
        audio_max_length=16000, video_frames=T_FRAMES,
        batch_size=1, max_new_tokens=3,
        raw_video_hw=(SRC_H, SRC_W),
    )
    audio, lip, raw, nf, hv, ns = tr._load_item(item)
    assert hv, "raw closeup fallback dropped to audio-only"
    # host_refined (default): the raw closeup became a normalized lip clip
    assert lip is not None and raw is None
    assert lip.shape == (T_FRAMES, 88, 88, 1) and np.isfinite(lip).all()

    tr_dev = StreamingTranscriber(
        model, variables, tokenizer,
        audio_max_length=16000, video_frames=T_FRAMES,
        batch_size=1, max_new_tokens=3,
        raw_video_hw=(SRC_H, SRC_W), raw_lip_mode="device",
    )
    audio, lip, raw, nf, hv, ns = tr_dev._load_item(item)
    assert lip is None and raw is not None and hv
    assert nf > 0 and raw.shape == (T_FRAMES, SRC_H, SRC_W)


def test_transcriber_tp_mesh_matches_single_device(media):
    """Multi-chip serving: weights sharded per the Megatron col/row rules
    over a data=2 x model=4 mesh must decode the SAME tokens as the
    unsharded program (XLA SPMD inserts the collectives; greedy argmax is
    robust to reduction-order noise), and a minimum count of params must
    actually land model-sharded so a silent rule mismatch can't pass."""
    import jax.numpy as jnp

    from avsl_tpu.core.mesh import make_mesh
    from avsl_tpu.core.partitioning import describe_shardings

    tokenizer = get_tokenizer(None, "en")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32"
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]]),
        video=jnp.zeros((1, T_FRAMES, 88, 88, 1), jnp.float32),
    )
    items = [
        {"id": "av", "audio": media["wav"], "lip_video": media["lip"]},
        {"id": "a", "audio": media["wav"]},
    ]
    kw = dict(
        audio_max_length=16000, video_frames=T_FRAMES,
        batch_size=2, max_new_tokens=5,
    )
    ref = StreamingTranscriber(model, variables, tokenizer, **kw).transcribe(items)

    mesh = make_mesh(8, model_parallel=4)
    sharded = describe_shardings(variables["params"], mesh)
    assert len(sharded) >= 20, f"only {len(sharded)} params sharded"
    tr = StreamingTranscriber(model, variables, tokenizer, mesh=mesh, **kw)
    out = tr.transcribe(items)
    assert [r.tokens for r in out] == [r.tokens for r in ref]
    assert [r.text for r in out] == [r.text for r in ref]


def test_transcriber_mesh_rejects_quantize_and_bad_batch(media):
    import jax.numpy as jnp

    from avsl_tpu.core.mesh import make_mesh

    tokenizer = get_tokenizer(None, "en")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32"
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]]),
        video=jnp.zeros((1, T_FRAMES, 88, 88, 1), jnp.float32),
    )
    mesh = make_mesh(8, model_parallel=4)
    with pytest.raises(ValueError, match="quantize"):
        StreamingTranscriber(model, variables, tokenizer, mesh=mesh,
                             quantize="int8", batch_size=2)
    with pytest.raises(ValueError, match="divisible"):
        StreamingTranscriber(model, variables, tokenizer, mesh=mesh,
                             batch_size=3)


def test_temperature_fallback_retries_low_confidence(media):
    """With logprob_threshold=0 every greedy decode 'fails' (logprobs are
    < 0 by definition), so the fallback loop must launch the sampled
    program and adopt the better-scoring result at the final temperature;
    an impossible threshold must leave results byte-identical to the
    plain transcriber."""
    import jax.numpy as jnp

    tokenizer = get_tokenizer(None, "en")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32"
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]]),
        video=jnp.zeros((1, T_FRAMES, 88, 88, 1), jnp.float32),
    )
    kw = dict(audio_max_length=16000, video_frames=T_FRAMES,
              batch_size=2, max_new_tokens=4)
    items = [{"id": "x", "audio": media["wav"]}]

    plain = StreamingTranscriber(model, variables, tokenizer, **kw)
    base = plain.transcribe(items)

    off = StreamingTranscriber(
        model, variables, tokenizer, **kw,
        temperature_fallback=(0.7,), logprob_threshold=-1e9,
    )
    same = off.transcribe(items)
    assert same[0].tokens == base[0].tokens
    assert off._fallback_calls == 1  # gate evaluated, no retry adopted

    hot = StreamingTranscriber(
        model, variables, tokenizer, **kw,
        temperature_fallback=(0.7,), logprob_threshold=0.0,
    )
    out = hot.transcribe(items)
    assert hot._fallback_calls == 1
    r = out[0]
    assert isinstance(r.text, str) and np.isfinite(r.avg_logprob)
    # final-temperature adoption keeps the better score: never worse
    # than the greedy pass
    assert r.avg_logprob >= base[0].avg_logprob - 1e-6

    with pytest.raises(ValueError, match="beam"):
        StreamingTranscriber(model, variables, tokenizer, **kw,
                             beam_size=2, temperature_fallback=(0.5,))


def test_word_timestamps_through_transcriber_and_longform(media):
    """word_timestamps=True: one extra teacher-forced alignment program
    attaches word-level times to every result; long-form stitching
    offsets them into global time."""
    import jax.numpy as jnp

    tokenizer = get_tokenizer(None, "en")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32"
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]]),
        video=jnp.zeros((1, T_FRAMES, 88, 88, 1), jnp.float32),
    )
    tr = StreamingTranscriber(
        model, variables, tokenizer,
        audio_max_length=16000, video_frames=T_FRAMES,
        batch_size=2, max_new_tokens=4, word_timestamps=True,
    )
    out = tr.transcribe([{"id": "w", "audio": media["wav"]}])[0]
    assert out.words is not None
    dur = 1.0  # the fixture wav is 1 s -> 50 encoder frames
    for w in out.words:
        assert 0 <= w["start_s"] < w["end_s"] <= dur + 0.02
        assert isinstance(w["word"], str) and w["word"]

    # long-form: words shifted by each window's global start
    rng = np.random.default_rng(0)
    audio = np.concatenate([
        0.3 * np.sin(2 * np.pi * 250 * np.arange(12000) / 16000),
        0.001 * rng.standard_normal(6000),
        0.3 * np.sin(2 * np.pi * 420 * np.arange(12000) / 16000),
    ]).astype(np.float32)
    res = tr.transcribe_long([{"id": "L", "audio": audio}])[0]
    assert len(res.segments) >= 2
    for seg in res.segments:
        if not seg.words:
            continue
        for w in seg.words:
            assert seg.start_s - 1e-6 <= w["start_s"] <= seg.end_s + 0.05


def test_serving_options_compose_on_a_mesh(media):
    """word_timestamps + temperature_fallback + tp/dp mesh in ONE
    transcriber: the alignment and sampled programs must compile and run
    against sharded closure params (sharding bugs crash here, not in
    production)."""
    import jax.numpy as jnp

    from avsl_tpu.core.mesh import make_mesh

    tokenizer = get_tokenizer(None, "en")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32"
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]]),
        video=jnp.zeros((1, T_FRAMES, 88, 88, 1), jnp.float32),
    )
    tr = StreamingTranscriber(
        model, variables, tokenizer,
        audio_max_length=16000, video_frames=T_FRAMES,
        batch_size=2, max_new_tokens=4,
        mesh=make_mesh(8, model_parallel=4),
        word_timestamps=True,
        temperature_fallback=(0.8,), logprob_threshold=0.0,
    )
    out = tr.transcribe([
        {"id": "av", "audio": media["wav"], "lip_video": media["lip"]},
        {"id": "a", "audio": media["wav"]},
    ])
    assert len(out) == 2 and tr._fallback_calls >= 1
    for r in out:
        assert r.words is not None and np.isfinite(r.avg_logprob)
        for w in r.words:
            assert w["end_s"] > w["start_s"] >= 0


def test_transcribe_surfaces_producer_errors(media):
    """A missing audio file must raise in the caller, not hang the
    consumer waiting on a sentinel the dead producer never enqueued."""
    import jax.numpy as jnp

    tokenizer = get_tokenizer(None, "en")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32"
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]]),
        video=jnp.zeros((1, T_FRAMES, 88, 88, 1), jnp.float32),
    )
    tr = StreamingTranscriber(
        model, variables, tokenizer,
        audio_max_length=16000, video_frames=T_FRAMES,
        batch_size=2, max_new_tokens=3,
    )
    with pytest.raises(Exception) as ei:
        tr.transcribe([{"id": "gone", "audio": "/definitely/missing.wav"}])
    assert "missing.wav" in str(ei.value)

"""Long-form transcription (infer/longform.py).

The reference pads pre-segmented clips to a 30 s ceiling
(/root/reference/avsl/whisper_flamingo_ft_ami.py:298-307) and has no
path for longer media. Tests: minimum-energy cuts land in pauses, spans
tile the signal, AV window slicing stays audio-synchronized, the
transcriber's long-form path equals manual windowing, and the serving
daemon's long=true protocol end-to-end.
"""

import base64
import json
import urllib.request

import numpy as np
import pytest

from avsl_tpu.infer.longform import energy_cut_points, split_item, stitch

SR = 16000


def _speech_with_pauses(n_bursts=4, burst_s=1.0, pause_s=0.5):
    """Loud tone bursts separated by near-silence; returns (audio, pause
    spans in samples)."""
    rng = np.random.default_rng(0)
    parts, pauses, pos = [], [], 0
    for i in range(n_bursts):
        burst = 0.3 * np.sin(
            2 * np.pi * (220 + 60 * i) * np.arange(int(SR * burst_s)) / SR
        )
        parts.append(burst)
        pos += len(burst)
        quiet = 0.001 * rng.standard_normal(int(SR * pause_s))
        pauses.append((pos, pos + len(quiet)))
        parts.append(quiet)
        pos += len(quiet)
    return np.concatenate(parts).astype(np.float32), pauses


def test_cuts_land_in_pauses_and_tile_the_signal():
    # burst+pause period 1.5 s with a 2.0 s window and 1.0 s search
    # region: every region straddles exactly one engineered pause
    audio, pauses = _speech_with_pauses()
    window = int(SR * 2.0)
    spans = energy_cut_points(audio, window, search_s=1.0)
    assert spans[0][0] == 0 and spans[-1][1] == len(audio)
    for (s0, e0), (s1, _) in zip(spans, spans[1:]):
        assert e0 == s1  # no gaps, no overlap
    assert all(e - s <= window for s, e in spans)
    # every interior cut sits inside one of the engineered pauses
    interior = [e for _, e in spans[:-1]]
    assert interior
    for cut in interior:
        assert any(p0 <= cut <= p1 for p0, p1 in pauses), (cut, pauses)


def test_short_audio_is_one_window():
    audio = np.zeros(SR, np.float32)
    assert energy_cut_points(audio, 4 * SR) == [(0, SR)]


def test_progress_on_pure_silence():
    audio = np.zeros(10 * SR, np.float32)
    spans = energy_cut_points(audio, SR)
    assert spans[-1][1] == len(audio)
    assert all(e > s for s, e in spans)
    assert all(e - s <= SR for s, e in spans)


def test_split_item_slices_video_in_sync(tmp_path):
    from avsl_tpu.data.video_io import write_video_frames

    audio, _ = _speech_with_pauses(n_bursts=3)
    fps, n_frames = 25, int(round(len(audio) / SR * 25))
    lip = str(tmp_path / "long-lip.mp4")
    write_video_frames(
        lip,
        np.random.default_rng(1).integers(
            0, 255, (n_frames, 96, 96)
        ).astype(np.uint8),
        fps=fps,
    )
    window = int(SR * 1.5)
    item = {"id": "av", "audio": audio, "lip_video": lip}
    windows, spans_s = split_item(item, window, video_frames=50)
    assert len(windows) == len(spans_s) >= 3
    assert [w["id"] for w in windows] == [f"av#w{k}" for k in range(len(windows))]
    for w, (s, e) in zip(windows, spans_s):
        assert len(w["audio"]) <= window
        assert abs(len(w["audio"]) / SR - (e - s)) < 1e-6
        # frame count tracks the window duration at 25 fps (the decoder
        # may come up a frame or two short of round(T*fps) at the tail)
        expect = int(round(e * 25)) - int(round(s * 25))
        assert w["lip_feats"].shape[0] <= min(expect, 50)
        assert w["lip_feats"].shape[0] >= min(expect, 50) - 3
        assert w["lip_feats"].shape[1:] == (88, 88, 1)


def test_split_item_rejects_raw_closeup():
    with pytest.raises(ValueError):
        split_item(
            {"audio": np.zeros(SR, np.float32), "video": "x.mp4"},
            SR, video_frames=50,
        )


def test_stitch_joins_text_and_keeps_timestamps():
    from avsl_tpu.infer import TranscribeResult

    rs = [
        TranscribeResult(id="a#w0", text="hello", tokens=[], has_video=False),
        TranscribeResult(id="a#w1", text="", tokens=[], has_video=True),
        TranscribeResult(id="a#w2", text="world", tokens=[], has_video=False),
    ]
    out = stitch("a", rs, [(0.0, 1.5), (1.5, 3.0), (3.0, 4.2)])
    assert out.id == "a" and out.text == "hello world" and out.has_video
    assert [s.start_s for s in out.segments] == [0.0, 1.5, 3.0]
    assert out.segments[2].end_s == 4.2


@pytest.fixture(scope="module")
def tiny_transcriber():
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
        jnp.asarray([[1]]),
        video=jnp.zeros((1, 20, 88, 88, 1), jnp.float32),
    )
    return StreamingTranscriber(
        model, variables, tokenizer,
        audio_max_length=16000, video_frames=20,
        batch_size=4, max_new_tokens=4,
    )


def test_transcribe_long_equals_manual_windowing(tiny_transcriber):
    tr = tiny_transcriber
    audio, _ = _speech_with_pauses(n_bursts=3, burst_s=0.8, pause_s=0.3)
    out = tr.transcribe_long([{"id": "long1", "audio": audio}])
    assert len(out) == 1
    r = out[0]
    assert r.id == "long1" and len(r.segments) >= 2
    assert r.segments[0].start_s == 0.0
    assert abs(r.segments[-1].end_s - len(audio) / SR) < 1e-3

    windows, spans = split_item(audio_item := {"id": "long1", "audio": audio},
                                tr.audio_max_length, tr.video_frames)
    manual = tr.transcribe(windows)
    assert [s.text for s in r.segments] == [m.text for m in manual]
    assert r.text == " ".join(t for t in (m.text for m in manual) if t)


def test_server_long_request(tiny_transcriber):
    from avsl_tpu.infer import TranscriptionServer

    srv = TranscriptionServer(tiny_transcriber, port=0, max_wait_ms=20.0).start()
    try:
        host, port = srv.address
        audio, _ = _speech_with_pauses(n_bursts=3, burst_s=0.8, pause_s=0.3)
        payload = {
            "id": "L",
            "audio_pcm_b64": base64.b64encode(audio.tobytes()).decode(),
            "long": True,
        }
        req = urllib.request.Request(
            f"http://{host}:{port}/v1/transcribe",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            out = json.loads(resp.read())
        assert out["id"] == "L"
        assert len(out["segments"]) >= 2
        assert out["segments"][0]["start_s"] == 0.0
        assert abs(out["segments"][-1]["end_s"] - len(audio) / SR) < 1e-3
        assert out["text"] == " ".join(
            t for t in (s["text"] for s in out["segments"]) if t
        )
    finally:
        srv.stop()

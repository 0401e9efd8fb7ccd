"""Live streaming sessions (infer/streaming.py).

The reference is offline-only; this validates the incremental surface:
endpointing at pauses regardless of chunking, global timestamps, leading-
silence skip, force-cut at the window ceiling, and flush semantics.
"""

import numpy as np
import pytest

SR = 16000


@pytest.fixture(scope="module")
def transcriber():
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
        batch_size=2, max_new_tokens=3,
    )


def _tone(seconds, freq=300.0, amp=0.3):
    return (amp * np.sin(
        2 * np.pi * freq * np.arange(int(SR * seconds)) / SR
    )).astype(np.float32)


def _silence(seconds):
    return np.zeros((int(SR * seconds),), np.float32)


def test_segments_finalize_at_pauses_any_chunking(transcriber):
    from avsl_tpu.infer.streaming import StreamingSession

    # lead-in silence + two utterances separated by a clear pause
    stream = np.concatenate([
        _silence(0.4), _tone(0.6, 250), _silence(0.6),
        _tone(0.5, 420), _silence(0.5),
    ])
    for chunk_size in (1600, 3777):  # 100 ms and an odd size
        sess = StreamingSession(transcriber, stream_id=f"c{chunk_size}")
        segs = []
        for i in range(0, len(stream), chunk_size):
            segs.extend(sess.feed(stream[i: i + chunk_size]))
        segs.extend(sess.flush())
        assert len(segs) == 2, (chunk_size, [(s.start_s, s.end_s) for s in segs])
        # leading silence skipped; boundaries near the engineered layout
        assert abs(segs[0].start_s - 0.4) < 0.06
        assert abs(segs[0].end_s - 1.0) < 0.35  # incl. half the pause
        assert abs(segs[1].start_s - 1.6) < 0.06
        assert segs[1].end_s <= 2.6 + 1e-6
        for s in segs:
            assert isinstance(s.text, str) and s.avg_logprob <= 0
        assert segs[0].end_s <= segs[1].start_s + 1e-6


def test_long_speech_is_force_cut_at_window(transcriber):
    from avsl_tpu.infer.streaming import StreamingSession

    sess = StreamingSession(transcriber)
    # 2.5 s of continuous speech vs a 1 s window: force cuts must fire
    segs = sess.feed(_tone(2.5, 300))
    segs.extend(sess.flush())
    assert len(segs) >= 2
    for s in segs:
        assert (s.end_s - s.start_s) <= transcriber.audio_max_length / SR + 1e-6
    for a, b in zip(segs, segs[1:]):
        assert a.end_s <= b.start_s + 1e-6
    assert abs(segs[-1].end_s - 2.5) < 0.06


def test_silence_only_stream_yields_nothing(transcriber):
    from avsl_tpu.infer.streaming import StreamingSession

    sess = StreamingSession(transcriber)
    segs = sess.feed(_silence(3.0))
    segs.extend(sess.flush())
    assert segs == []


def test_flush_finalizes_open_utterance_and_closes(transcriber):
    from avsl_tpu.infer.streaming import StreamingSession

    sess = StreamingSession(transcriber)
    assert sess.feed(_tone(0.5)) == []  # no trailing silence yet
    segs = sess.flush()
    assert len(segs) == 1
    assert abs(segs[0].end_s - 0.5) < 0.06
    with pytest.raises(RuntimeError):
        sess.feed(_tone(0.1))


def test_one_oversized_chunk_never_exceeds_window(transcriber):
    """A single chunk longer than audio_max_length with a trailing pause:
    the naive endpoint would exceed the window and pad_or_trim would
    silently drop speech — every segment must stay <= the window."""
    from avsl_tpu.infer.streaming import StreamingSession

    sess = StreamingSession(transcriber)
    audio = np.concatenate([_tone(2.2, 330), _silence(0.6)])
    segs = sess.feed(audio)
    segs.extend(sess.flush())
    assert len(segs) >= 3  # 2.2 s of speech through a 1 s window
    for s in segs:
        assert (s.end_s - s.start_s) <= transcriber.audio_max_length / SR + 1e-6
    # the endpointer consumes half the min-silence gap with the utterance
    assert 2.2 - 0.06 <= segs[-1].end_s <= 2.2 + 0.35 / 2 + 0.06

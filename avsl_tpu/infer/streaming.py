"""Live streaming transcription: incremental PCM in, finalized segments out.

The reference is strictly offline (pre-segmented AMI clips through
Lightning validation); `StreamingTranscriber.transcribe` is batch-offline
too. This adds the live-captioning surface: a per-stream session that
accepts arbitrary-size PCM chunks as they arrive, endpoints utterances at
trailing pauses (frame-RMS silence detection, same 25 ms frames as the
long-form splitter), and hands each finalized utterance to the ordinary
fixed-batch transcriber.

TPU shape: the device never sees partial utterances — endpointing is
pure host arithmetic, and finalized utterances are ordinary batch items.
By default a session calls ``transcriber.transcribe_batch`` directly
(fine for ONE live stream; occupancy 1). To run MANY concurrent streams,
pass ``transcribe_fn`` routing through a ``TranscriptionServer``'s
batcher — that keeps a single scheduler thread as the only device client
and coalesces utterances from different streams into full batches::

    def via_server(items):
        pendings = [server.submit(it) for it in items]
        for p in pendings:
            p.done.wait(300)
        return [p.result for p in pendings]

    sess = StreamingSession(tr, transcribe_fn=via_server)

No incremental encoder state, by design: Whisper-style encoders want the
whole utterance, and an utterance is bounded by ``audio_max_length``
anyway (a too-long one is force-cut at its quietest recent frame,
exactly like long-form).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from avsl_tpu.infer.longform import LongSegment


class StreamingSession:
    """Endpointing state machine for ONE audio stream.

    ``feed(pcm)`` buffers samples and returns any utterances finalized by
    this chunk; ``flush()`` finalizes the remainder. Segment times are
    global (stream origin = first sample ever fed).

    * an utterance finalizes when it contains speech and ends with
      ``min_silence_s`` of sub-threshold frames;
    * leading silence is skipped (never transcribed);
    * a buffer reaching the transcriber's ``audio_max_length`` is
      force-cut at the quietest frame in its trailing search region.
    """

    def __init__(
        self,
        transcriber,
        silence_rms: float = 5e-3,
        min_silence_s: float = 0.35,
        min_speech_s: float = 0.2,
        sample_rate: int = 16000,
        frame_ms: float = 25.0,
        stream_id: str = "stream",
        transcribe_fn=None,
    ):
        self.t = transcriber
        # pluggable utterance sink: default is a direct 1-item batch on
        # the transcriber (single-stream use); multi-stream deployments
        # pass a fn that submits through the server's dynamic batcher so
        # one scheduler thread stays the only device client
        self._transcribe = (
            transcribe_fn if transcribe_fn is not None
            else transcriber.transcribe_batch
        )
        self.sr = int(sample_rate)
        self.frame = max(int(self.sr * frame_ms / 1000.0), 1)
        self.silence_rms = float(silence_rms)
        self.min_silence_frames = max(
            int(round(min_silence_s * self.sr / self.frame)), 1
        )
        self.min_speech_samples = int(min_speech_s * self.sr)
        self.stream_id = stream_id
        self.max_samples = int(transcriber.audio_max_length)

        self._buf = np.zeros((0,), np.float32)
        self._origin = 0  # global sample index of _buf[0]
        self._n_segments = 0
        self._closed = False

    # -- host-side endpointing ------------------------------------------

    def _frame_rms(self, x: np.ndarray) -> np.ndarray:
        k = (len(x) // self.frame) * self.frame
        if k == 0:
            return np.zeros((0,), np.float32)
        return np.sqrt(
            np.mean(x[:k].reshape(-1, self.frame) ** 2, axis=1)
        )

    def _skip_leading_silence(self) -> None:
        rms = self._frame_rms(self._buf)
        speech = np.nonzero(rms >= self.silence_rms)[0]
        if speech.size:
            cut = int(speech[0]) * self.frame
        else:  # all silence: keep only a potential utterance-onset tail
            cut = max(len(self._buf) - self.frame * self.min_silence_frames, 0)
            cut = (cut // self.frame) * self.frame
        if cut:
            self._buf = self._buf[cut:]
            self._origin += cut

    def _endpoint(self) -> Optional[int]:
        """Sample index (exclusive) at which the buffer finalizes, or
        None if the utterance is still open."""
        rms = self._frame_rms(self._buf)
        if rms.size < self.min_silence_frames + 1:
            return None
        voiced = rms >= self.silence_rms
        if not voiced.any():
            return None
        tail = voiced[-self.min_silence_frames:]
        if tail.any():
            return None
        last_voiced = int(np.nonzero(voiced)[0][-1])
        end = (last_voiced + 1) * self.frame
        if end < self.min_speech_samples:
            return None
        # consume half the silence gap with this utterance so the next
        # one starts cleanly inside the pause
        return min(
            end + (self.min_silence_frames // 2) * self.frame,
            len(self._buf),
        )

    def _force_cut_point(self) -> int:
        """Quietest frame center in the last quarter of the WINDOW (never
        past ``max_samples`` — the long-form splitter's rule,
        longform.energy_cut_points)."""
        window = min(len(self._buf), self.max_samples)
        lo = (3 * window // 4 // self.frame) * self.frame
        rms = self._frame_rms(self._buf[lo:window])
        if rms.size == 0:
            return window
        return min(
            lo + int(np.argmin(rms)) * self.frame + self.frame // 2,
            window,
        )

    def _finalize(self, end: int) -> LongSegment:
        utt = self._buf[:end]
        start_global = self._origin
        self._buf = self._buf[end:]
        self._origin += end
        r = self._transcribe([{
            "id": f"{self.stream_id}#s{self._n_segments}", "audio": utt,
        }])[0]
        self._n_segments += 1
        words = getattr(r, "words", None)
        if words is not None:
            off = start_global / self.sr
            words = [
                {**w, "start_s": round(w["start_s"] + off, 3),
                 "end_s": round(w["end_s"] + off, 3)}
                for w in words
            ]
        return LongSegment(
            start_s=round(start_global / self.sr, 3),
            end_s=round((start_global + end) / self.sr, 3),
            text=r.text,
            avg_logprob=r.avg_logprob,
            words=words,
        )

    # -- public API ------------------------------------------------------

    def feed(self, pcm: np.ndarray) -> List[LongSegment]:
        """Append a chunk (any length, float32 PCM at the session rate);
        returns utterances finalized by it, in order."""
        if self._closed:
            raise RuntimeError("session is flushed/closed")
        self._buf = np.concatenate(
            [self._buf, np.asarray(pcm, np.float32).ravel()]
        )
        out: List[LongSegment] = []
        while True:
            self._skip_leading_silence()
            end = self._endpoint()
            if (end is None or end > self.max_samples) and (
                len(self._buf) >= self.max_samples
            ):
                # an utterance longer than the model window (or one big
                # chunk containing it) must force-cut INSIDE the window —
                # otherwise pad_or_trim would silently drop speech while
                # the segment claims the full span
                end = self._force_cut_point()
            if end is None or end == 0:
                break
            out.append(self._finalize(end))
        return out

    def flush(self) -> List[LongSegment]:
        """Finalize whatever speech remains and close the session."""
        self._closed = True
        self._skip_leading_silence()
        out: List[LongSegment] = []
        while len(self._buf) >= self.max_samples:
            out.append(self._finalize(self._force_cut_point()))
        rms = self._frame_rms(self._buf)
        if (rms >= self.silence_rms).any():
            last = int(np.nonzero(rms >= self.silence_rms)[0][-1])
            end = min((last + 1) * self.frame, len(self._buf))
            if end >= self.min_speech_samples:
                out.append(self._finalize(end))
        self._buf = np.zeros((0,), np.float32)
        return out

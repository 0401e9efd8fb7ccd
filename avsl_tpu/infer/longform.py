"""Long-form transcription: arbitrary-length media through the ONE
compiled fixed-batch program.

The reference operates exclusively on pre-segmented AMI clips (its
dataloaders pad to a 30 s ceiling: /root/reference/avsl/
whisper_flamingo_ft_ami.py:298-307); it has no path for an hour-long
recording. This module closes that serving gap the TPU-friendly way:

* **Split on the host, at minimum-energy points.** A long signal is cut
  into windows of at most ``audio_max_length`` samples, with each cut
  placed at the quietest 25 ms frame inside a trailing search region —
  cuts land in pauses, so windows can be transcribed INDEPENDENTLY and
  their texts concatenated. No overlap, therefore no overlap-dedup
  heuristics and no cross-window sequential dependency.
* **Windows are ordinary batch items.** Every window (from one file or
  a thousand) rides the same static-shape batch the transcriber always
  runs — full tile occupancy, zero retraces, and windows of DIFFERENT
  requests coalesce in the serving daemon's dynamic batcher.
* **No conditioning carry, by design.** Whisper's
  condition-on-previous-text trick chains windows sequentially, which
  serializes the device and propagates hallucination loops; independent
  windows trade a little linguistic context for full batch parallelism
  (and per-window timestamps come out for free).

AV long-form: a ``lip_video`` clip is decoded ONCE and its frame range
``[round(start/sr*fps), round(end/sr*fps))`` is sliced per window and
shipped as precomputed ``lip_feats`` (the transcriber accepts feature
arrays as batch items), so the video stays synchronized with its audio
window.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class LongSegment:
    start_s: float
    end_s: float
    text: str
    # per-window decode confidence (mean token logprob / beam score) —
    # filter hallucination-prone windows without re-decoding
    avg_logprob: float = 0.0
    # word timestamps in GLOBAL time (window offset applied) when the
    # transcriber runs with word_timestamps=True
    words: Optional[List[dict]] = None


@dataclass
class LongFormResult:
    id: str
    text: str
    segments: List[LongSegment]
    has_video: bool


def energy_cut_points(
    audio: np.ndarray,
    window_samples: int,
    sample_rate: int = 16000,
    search_s: float = 2.0,
    frame_ms: float = 25.0,
) -> List[Tuple[int, int]]:
    """Greedy segmentation of ``audio`` into spans of at most
    ``window_samples``: each nominal boundary moves backward to the
    center of the minimum-RMS 25 ms frame inside the trailing
    ``search_s`` region, so cuts land in pauses rather than mid-word.
    Spans tile the signal exactly (no overlap, no gaps)."""
    n = int(len(audio))
    if window_samples <= 0:
        raise ValueError(f"window_samples {window_samples} must be positive")
    if n <= window_samples:
        return [(0, n)]
    frame = max(int(sample_rate * frame_ms / 1000.0), 1)
    search = max(int(sample_rate * search_s), frame)
    spans: List[Tuple[int, int]] = []
    pos = 0
    while n - pos > window_samples:
        nominal = pos + window_samples
        # never search below half a window: guarantees forward progress
        # and keeps windows from degenerating when audio has long silence
        lo = max(pos + window_samples // 2, nominal - search)
        region = np.asarray(audio[lo:nominal], np.float32)
        k = (len(region) // frame) * frame
        if k >= frame:
            rms = np.sqrt(
                np.mean(region[:k].reshape(-1, frame) ** 2, axis=1)
            )
            cut = lo + int(np.argmin(rms)) * frame + frame // 2
        else:  # region shorter than one frame (tiny windows in tests)
            cut = nominal
        cut = int(min(max(cut, pos + 1), nominal))
        spans.append((pos, cut))
        pos = cut
    spans.append((pos, n))
    return spans


def split_item(
    item: Dict[str, Any],
    audio_max_length: int,
    video_frames: int,
    crop: int = 88,
    sample_rate: int = 16000,
    fps: int = 25,
    search_s: float = 2.0,
) -> Tuple[List[Dict[str, Any]], List[Tuple[float, float]]]:
    """One long item -> (window items, per-window (start_s, end_s)).

    Host-only work (wav read, energy scan, one video decode) — safe on
    an HTTP handler thread; the device never enters this function.
    Window ids are ``{id}#w{k}``.
    """
    from avsl_tpu.data.audio_segments import load_wav

    if item.get("video") and not item.get("lip_video"):
        raise ValueError(
            "long-form supports 'lip_video' (an extracted lip clip) or "
            "audio-only; raw-closeup windows would re-run detection per "
            "window — pre-extract the lip clip instead"
        )
    audio = item["audio"]
    audio = load_wav(audio) if isinstance(audio, str) else np.asarray(
        audio, np.float32
    )
    spans = energy_cut_points(
        audio, audio_max_length, sample_rate=sample_rate, search_s=search_s
    )

    lip_feats: Optional[np.ndarray] = None
    lip = item.get("lip_video")
    if lip:
        from avsl_tpu.data.video_io import load_video_feats

        lip_feats = load_video_feats(lip, image_crop_size=crop)

    base_id = str(item.get("id", ""))
    windows: List[Dict[str, Any]] = []
    for k, (s, e) in enumerate(spans):
        w: Dict[str, Any] = {
            "id": f"{base_id}#w{k}",
            "audio": audio[s:e],
        }
        if lip_feats is not None:
            fs = int(round(s / sample_rate * fps))
            fe = int(round(e / sample_rate * fps))
            seg = lip_feats[fs:fe][:video_frames]
            if len(seg):
                w["lip_feats"] = seg
        windows.append(w)
    times = [(s / sample_rate, e / sample_rate) for s, e in spans]
    return windows, times


def stitch(
    item_id: str,
    window_results: Sequence[Any],
    spans_s: Sequence[Tuple[float, float]],
) -> LongFormResult:
    """Window results (in order) -> one LongFormResult: texts joined with
    single spaces, per-window timestamps preserved as segments."""
    segments = []
    for r, (s, e) in zip(window_results, spans_s):
        words = getattr(r, "words", None)
        if words is not None:  # window-relative -> global time
            words = [
                {**w, "start_s": round(w["start_s"] + s, 3),
                 "end_s": round(w["end_s"] + s, 3)}
                for w in words
            ]
        segments.append(LongSegment(
            start_s=round(s, 3), end_s=round(e, 3), text=r.text,
            avg_logprob=getattr(r, "avg_logprob", 0.0), words=words,
        ))
    text = " ".join(t for t in (seg.text for seg in segments) if t)
    return LongFormResult(
        id=item_id,
        text=text,
        segments=segments,
        has_video=any(r.has_video for r in window_results),
    )

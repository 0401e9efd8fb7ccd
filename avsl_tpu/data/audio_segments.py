"""Audio segmentation + augmentation (L2 audio path).

Parity with preprocess/audio_process.py in /root/reference: each source
wav is loaded ONCE and all its segments sliced from memory
(batch_segment_audio, :36-108), SNR-controlled noise mixing
(add_noise, :110-150), and audio/video length alignment by truncation to
the shorter stream (align_audio_video_features, :238-264). Feature
extraction itself lives in avsl_tpu.kernels.fbank / logmel (on device).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np
import scipy.io.wavfile as wavfile

from avsl_tpu.data.segments import Segment


def pcm_to_float(data: np.ndarray) -> np.ndarray:
    """Integer PCM -> float32 in [-1, 1]; mono-mix stereo; float passes
    through. The ONE normalization used by every wav ingest path (file,
    embedded HF bytes, raw arrays) so scalings cannot diverge."""
    data = np.asarray(data)
    if data.ndim == 2:
        data = data.mean(axis=1)
    if data.dtype == np.int16:
        return data.astype(np.float32) / 32768.0
    if data.dtype == np.int32:
        return data.astype(np.float32) / 2147483648.0
    if data.dtype == np.uint8:  # wav uint8 is offset-binary
        return (data.astype(np.float32) - 128.0) / 128.0
    return data.astype(np.float32)


def load_wav(path: str, target_sr: int = 16000) -> np.ndarray:
    """Read a wav to mono float32 in [-1, 1] at ``target_sr``."""
    sr, data = wavfile.read(path)
    data = pcm_to_float(data)
    if sr != target_sr:
        from avsl_tpu.kernels.resample import resample_poly

        data = np.asarray(resample_poly(data, sr, target_sr))
    return data


def write_wav(path: str, audio: np.ndarray, sr: int = 16000) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    wavfile.write(path, sr, (np.clip(audio, -1, 1) * 32767).astype(np.int16))
    return path


def slice_segment(
    audio: np.ndarray, start: float, end: float, sr: int = 16000
) -> np.ndarray:
    i0 = max(int(round(start * sr)), 0)
    i1 = min(int(round(end * sr)), len(audio))
    return audio[i0:i1]


def batch_segment_audio(
    source_path: str,
    segments: Sequence[Segment],
    output_dir: str,
    sr: int = 16000,
    overwrite: bool = False,
) -> List[Tuple[bool, str]]:
    """Slice every segment of one source wav (loaded once) to
    ``{output_dir}/{segment_id}.wav``. Returns per-segment (success, path)
    tuples — the reference's result convention."""
    os.makedirs(output_dir, exist_ok=True)
    audio = load_wav(source_path, sr)
    results: List[Tuple[bool, str]] = []
    for seg in segments:
        out = os.path.join(output_dir, f"{seg.segment_id}.wav")
        try:
            if overwrite or not os.path.exists(out):
                clip = slice_segment(audio, seg.start, seg.end, sr)
                if len(clip) == 0:
                    results.append((False, out))
                    continue
                write_wav(out, clip, sr)
            results.append((True, out))
        except Exception:
            results.append((False, out))
    return results


def add_noise(
    clean: np.ndarray, noise: np.ndarray, snr_db: float, rng=None
) -> np.ndarray:
    """Mix noise into ``clean`` at the given SNR (dB), int16-overflow safe
    (parity with audio_process.py:110-150)."""
    rng = np.random.default_rng() if rng is None else rng
    if len(noise) < len(clean):
        reps = int(np.ceil(len(clean) / len(noise)))
        noise = np.tile(noise, reps)
    start = rng.integers(0, len(noise) - len(clean) + 1)
    noise = noise[start : start + len(clean)].astype(np.float64)
    clean64 = clean.astype(np.float64)

    clean_rms = np.sqrt(np.mean(clean64**2)) + 1e-12
    noise_rms = np.sqrt(np.mean(noise**2)) + 1e-12
    target_noise_rms = clean_rms / (10.0 ** (snr_db / 20.0))
    mixed = clean64 + noise * (target_noise_rms / noise_rms)

    peak = np.max(np.abs(mixed))
    if peak > 1.0:
        mixed = mixed / peak
    return mixed.astype(np.float32)


def align_audio_video_lengths(
    audio_feats: np.ndarray, video_feats: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Truncate both feature streams to the shorter length (frames axis 0),
    the reference's alignment rule (audio_process.py:238-264)."""
    t = min(len(audio_feats), len(video_feats))
    return audio_feats[:t], video_feats[:t]

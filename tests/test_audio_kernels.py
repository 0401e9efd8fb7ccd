"""Golden tests: TPU audio kernels vs independent numpy/scipy references.

The numpy references below are written directly from the published math
(np.fft-based), independent of the conv-as-DFT formulation used on device.
"""

import os

import numpy as np
import pytest
import scipy.signal

from avsl_tpu.kernels import (
    avhubert_audio_features,
    log_mel_spectrogram,
    logfbank,
    mel_filterbank_htk_psf,
    mel_filterbank_slaney,
    pad_or_trim,
    resample_poly,
    spec_augment,
)
from avsl_tpu.kernels.fbank import frame_normalize, stack_frames


def _np_whisper_logmel(audio, n_mels=80, n_fft=400, hop=160, sr=16000):
    """Independent numpy port of Whisper's log_mel_spectrogram math."""
    pad = n_fft // 2
    x = np.pad(audio.astype(np.float64), pad, mode="reflect")
    window = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    n_frames = 1 + (len(x) - n_fft) // hop
    frames = np.stack([x[i * hop : i * hop + n_fft] * window for i in range(n_frames)])
    spec = np.fft.rfft(frames, n=n_fft, axis=1)
    power = np.abs(spec) ** 2
    power = power[:-1].T  # drop last frame; [n_bins, T]
    mel = mel_filterbank_slaney(sr, n_fft, n_mels).astype(np.float64) @ power
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def _np_psf_logfbank(audio, sr=16000, nfilt=26, nfft=512):
    """Independent numpy port of python_speech_features.logfbank defaults."""
    x = np.asarray(audio, dtype=np.float64)
    x = np.append(x[0], x[1:] - 0.97 * x[:-1])  # preemphasis
    frame_len, frame_step = int(0.025 * sr), int(0.01 * sr)
    if len(x) <= frame_len:
        n_frames = 1
    else:
        n_frames = 1 + int(np.ceil((len(x) - frame_len) / frame_step))
    padded = np.zeros(frame_len + (n_frames - 1) * frame_step)
    padded[: len(x)] = x
    frames = np.stack(
        [padded[i * frame_step : i * frame_step + frame_len] for i in range(n_frames)]
    )
    pspec = np.abs(np.fft.rfft(frames, n=nfft, axis=1)) ** 2 / nfft
    fb = mel_filterbank_htk_psf(nfilt, nfft, sr)
    feat = pspec @ fb.T
    feat = np.where(feat == 0, np.finfo(np.float64).eps, feat)
    return np.log(feat)


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(0)
    # 1.7 s of noise + tones so frame counts are not round numbers
    t = np.arange(int(1.7 * 16000)) / 16000
    sig = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(len(t))
    return sig.astype(np.float32)


def test_pad_or_trim(audio):
    assert pad_or_trim(audio, 16000).shape == (16000,)
    padded = pad_or_trim(audio, 160000)
    assert padded.shape == (160000,)
    np.testing.assert_array_equal(np.asarray(padded)[len(audio) :], 0)
    batched = pad_or_trim(np.stack([audio, audio]), 16000)
    assert batched.shape == (2, 16000)


def test_whisper_logmel_matches_numpy(audio):
    for n_mels in (80, 128):
        want = _np_whisper_logmel(audio, n_mels=n_mels)
        got = np.asarray(log_mel_spectrogram(audio, n_mels=n_mels))
        assert got.shape == want.shape == (n_mels, len(audio) // 160)
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-5)


def test_whisper_logmel_padding_matches_whisper_semantics(audio):
    # padding=K appends K zeros before the transform
    want = _np_whisper_logmel(np.pad(audio, (0, 4800)))
    got = np.asarray(log_mel_spectrogram(audio, padding=4800))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-5)


def test_whisper_logmel_batched(audio):
    batch = np.stack([audio, np.roll(audio, 100)])
    got = np.asarray(log_mel_spectrogram(batch))
    assert got.shape == (2, 80, len(audio) // 160)
    np.testing.assert_allclose(
        got[1], _np_whisper_logmel(np.roll(audio, 100)), atol=5e-5, rtol=1e-5
    )


def test_logfbank_matches_psf_math(audio):
    want = _np_psf_logfbank(audio)
    got = np.asarray(logfbank(audio))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-5)


def test_avhubert_104dim_path(audio):
    feats = np.asarray(avhubert_audio_features(audio))
    t26 = _np_psf_logfbank(audio).shape[0]
    assert feats.shape == (int(np.ceil(t26 / 4)), 104)
    # per-frame normalization: mean ~0, population std ~1
    np.testing.assert_allclose(feats.mean(axis=1), 0, atol=1e-4)
    np.testing.assert_allclose(feats.std(axis=1), 1, atol=1e-2)


def test_stack_frames_zero_tail():
    x = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
    out = np.asarray(stack_frames(x, 4))
    assert out.shape == (3, 12)
    np.testing.assert_array_equal(out[0], x[:4].reshape(-1))
    np.testing.assert_array_equal(out[2, 6:], 0)  # zero-padded tail


def test_resample_matches_scipy(audio):
    for orig, target in ((44100, 16000), (48000, 16000), (8000, 16000)):
        n = int(0.37 * orig)
        x = np.asarray(audio[:n], dtype=np.float64)
        want = scipy.signal.resample_poly(x, target, orig)
        got = np.asarray(resample_poly(x.astype(np.float32), orig, target))
        assert got.shape == want.shape, (orig, target, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_resample_identity(audio):
    out = resample_poly(audio, 16000, 16000)
    np.testing.assert_array_equal(np.asarray(out), audio)


def test_spec_augment_masks_and_bounds():
    import jax

    key = jax.random.PRNGKey(0)
    mel = np.ones((300, 80), np.float32) * 2.0 + np.random.default_rng(1).normal(
        0, 0.1, (300, 80)
    ).astype(np.float32)
    audio_frames = 120
    out = np.asarray(spec_augment(mel, key, audio_frames, 2, 2))
    assert out.shape == mel.shape
    changed = np.any(out != mel, axis=1)
    # something was masked, and no time mask leaks past audio_frames
    assert changed.any()
    # columns fully masked by freq masks affect all rows; exclude them when
    # checking the time bound by looking at full-row changes
    full_rows = np.all(out != mel, axis=1)
    assert not full_rows[audio_frames:].any()


def test_spec_augment_deterministic_per_key():
    import jax

    mel = np.random.default_rng(2).normal(size=(100, 80)).astype(np.float32)
    a = np.asarray(spec_augment(mel, jax.random.PRNGKey(7), 100, 1, 1))
    b = np.asarray(spec_augment(mel, jax.random.PRNGKey(7), 100, 1, 1))
    c = np.asarray(spec_augment(mel, jax.random.PRNGKey(8), 100, 1, 1))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def _torch_psf_logfbank(audio, sr=16000, nfilt=26, nfft=512):
    """THIRD independent implementation of the psf logfbank math, on
    torch's FFT backend and tensor ops (different framing code path and
    FFT library from both the device kernel and the numpy port)."""
    import torch

    x = torch.as_tensor(np.asarray(audio, np.float64))
    x = torch.cat([x[:1], x[1:] - 0.97 * x[:-1]])
    frame_len, frame_step = int(0.025 * sr), int(0.01 * sr)
    if len(x) <= frame_len:
        n_frames = 1
    else:
        n_frames = 1 + int(np.ceil((len(x) - frame_len) / frame_step))
    padded = torch.zeros(frame_len + (n_frames - 1) * frame_step, dtype=x.dtype)
    padded[: len(x)] = x
    frames = padded.unfold(0, frame_len, frame_step)
    pspec = torch.abs(torch.fft.rfft(frames, n=nfft, dim=1)) ** 2 / nfft
    fb = torch.as_tensor(
        np.asarray(mel_filterbank_htk_psf(nfilt, nfft, sr), np.float64)
    )
    feat = pspec @ fb.T
    feat = torch.where(
        feat == 0, torch.tensor(float(np.finfo(np.float64).eps)), feat
    )
    return torch.log(feat).numpy()


def test_logfbank_triple_implementation_agreement(audio):
    """The device kernel, the numpy port, and a torch-backed port (three
    independent code paths and two FFT backends) must agree. The actual
    python_speech_features library is not installable here (no package,
    no network egress) — scripts/gen_fbank_golden.py regenerates the
    committed golden against the REAL library on any machine that has it."""
    np_ref = _np_psf_logfbank(audio)
    torch_ref = _torch_psf_logfbank(audio)
    np.testing.assert_allclose(torch_ref, np_ref, atol=1e-8, rtol=1e-10)
    got = np.asarray(logfbank(audio))
    np.testing.assert_allclose(got, torch_ref, atol=2e-4, rtol=2e-5)


def test_logfbank_matches_committed_golden(audio):
    """Bit-anchor against the committed artifact: guards against silent
    drift of BOTH the kernel and the in-repo reference math. The npz
    records its source ('python_speech_features' when generated on a
    machine with the real library; 'numpy-port' otherwise)."""
    path = os.path.join(os.path.dirname(__file__), "goldens", "logfbank_golden.npz")
    with np.load(path) as z:
        want = z["logfbank"]
        source = str(z["source"])
    got = np.asarray(logfbank(audio))
    assert got.shape == want.shape, (got.shape, want.shape, source)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-5)

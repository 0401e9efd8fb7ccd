"""AV-HuBERT audio features: 26-dim log filterbank -> stack-4 -> 104-dim.

Numerically matches the reference's feature path
(preprocess/audio_process.py:152-197 in /root/reference, which wraps
``python_speech_features.logfbank`` with defaults): pre-emphasis 0.97,
25 ms rectangular-window frames at 10 ms hop, 512-point rDFT power
spectrum scaled by 1/512, HTK mel filterbank with integer-bin corners,
natural log with zero->eps flooring; then consecutive-frame stacking with
zero tail padding and per-frame mean/std normalization over the feature
axis.

TPU formulation mirrors logmel.py: framing + rDFT is one strided conv on
the MXU (the 400-sample rectangular frames are zero-padded to 512 inside
the DFT basis, so no explicit pad is materialized).
"""

from __future__ import annotations

import functools
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from avsl_tpu.kernels.mel import mel_filterbank_htk_psf

SAMPLE_RATE = 16000
WINLEN = 0.025
WINSTEP = 0.01
NFILT = 26
NFFT = 512
PREEMPH = 0.97


@functools.lru_cache(maxsize=4)
def _psf_dft_filters(frame_len: int, nfft: int) -> np.ndarray:
    """Rectangular-window rDFT basis over ``frame_len`` samples of an
    ``nfft``-point transform (frames are implicitly zero-padded to nfft)."""
    n_bins = nfft // 2 + 1
    n = np.arange(frame_len, dtype=np.float64)
    k = np.arange(n_bins, dtype=np.float64)[:, None]
    angle = 2.0 * np.pi * k * n[None, :] / nfft
    filt = np.concatenate([np.cos(angle), -np.sin(angle)], axis=0).astype(np.float32)
    return filt[:, None, :]


@functools.lru_cache(maxsize=4)
def _psf_fbank(nfilt: int, nfft: int, sr: int) -> np.ndarray:
    return mel_filterbank_htk_psf(nfilt=nfilt, nfft=nfft, samplerate=sr).astype(
        np.float32
    )


def _num_frames(n_samples: int, frame_len: int, frame_step: int) -> int:
    # python_speech_features.sigproc.framesig frame count
    if n_samples <= frame_len:
        return 1
    return 1 + int(np.ceil((n_samples - frame_len) / frame_step))


@functools.partial(jax.jit, static_argnames=("sr", "nfilt", "nfft", "n_frames"))
def _logfbank_impl(
    audio: jnp.ndarray, sr: int, nfilt: int, nfft: int, n_frames: int
) -> jnp.ndarray:
    frame_len = int(round(WINLEN * sr))
    frame_step = int(round(WINSTEP * sr))

    # Pre-emphasis: y[0] = x[0]; y[i] = x[i] - 0.97 x[i-1]
    x = audio.astype(jnp.float32)
    x = jnp.concatenate([x[:, :1], x[:, 1:] - PREEMPH * x[:, :-1]], axis=1)

    # Zero-pad so the strided conv yields exactly the psf frame count.
    total = frame_len + (n_frames - 1) * frame_step
    pad = total - x.shape[1]
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (0, pad)))

    filt = jnp.asarray(_psf_dft_filters(frame_len, nfft))
    out = jax.lax.conv_general_dilated(
        x[:, None, :],
        filt,
        window_strides=(frame_step,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )  # [B, 2*n_bins, n_frames]
    n_bins = nfft // 2 + 1
    real, imag = out[:, :n_bins, :], out[:, n_bins:, :]
    pspec = (real * real + imag * imag) / nfft

    fb = jnp.asarray(_psf_fbank(nfilt, nfft, sr))
    feat = jnp.einsum("mf,bft->btm", fb, pspec, preferred_element_type=jnp.float32)
    feat = jnp.where(feat == 0.0, jnp.finfo(jnp.float32).eps, feat)
    return jnp.log(feat)  # natural log, psf convention


def logfbank(
    audio: Union[np.ndarray, jnp.ndarray],
    samplerate: int = SAMPLE_RATE,
    nfilt: int = NFILT,
    nfft: int = NFFT,
) -> jnp.ndarray:
    """Log mel filterbank energies, ``[T, nfilt]`` (or ``[B, T, nfilt]``)."""
    audio = jnp.asarray(audio)
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    frame_len = int(round(WINLEN * samplerate))
    frame_step = int(round(WINSTEP * samplerate))
    n_frames = _num_frames(audio.shape[1], frame_len, frame_step)
    out = _logfbank_impl(audio, samplerate, nfilt, nfft, n_frames)
    return out[0] if squeeze else out


def stack_frames(feats: jnp.ndarray, stack_order: int = 4) -> jnp.ndarray:
    """Concatenate ``stack_order`` consecutive frames (zero tail padding).

    [T, F] -> [ceil(T/stack), stack*F]; batched input handled likewise.
    Mirrors preprocess/audio_process.py:167-177 in the reference.
    """
    if stack_order <= 1:
        return feats
    squeeze = feats.ndim == 2
    if squeeze:
        feats = feats[None]
    b, t, f = feats.shape
    rem = (-t) % stack_order
    if rem:
        feats = jnp.pad(feats, ((0, 0), (0, rem), (0, 0)))
    out = feats.reshape(b, -1, stack_order * f)
    return out[0] if squeeze else out


def frame_normalize(feats: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-frame mean/std normalization over the feature axis.

    Mirrors ``audio_to_tensor(normalize=True)`` at
    preprocess/audio_process.py:180-197 (std is the biased/population std).
    """
    mean = jnp.mean(feats, axis=-1, keepdims=True)
    std = jnp.std(feats, axis=-1, keepdims=True)
    return (feats - mean) / (std + eps)


def mfcc(
    audio: Union[np.ndarray, jnp.ndarray],
    samplerate: int = SAMPLE_RATE,
    numcep: int = 13,
    nfilt: int = 26,
    nfft: int = NFFT,
    ceplifter: int = 22,
) -> jnp.ndarray:
    """MFCCs (python_speech_features conventions, ``appendEnergy=False``):
    DCT-II (ortho) of the log filterbank energies, first ``numcep``
    coefficients, sinusoidal cepstral liftering. ``[T, numcep]`` (or
    batched). These are the HuBERT iteration-1 clustering features
    (39-dim with deltas via :func:`add_deltas`); built on the
    golden-tested :func:`logfbank` path.
    """
    feats = logfbank(audio, samplerate=samplerate, nfilt=nfilt, nfft=nfft)
    squeeze = feats.ndim == 2
    if squeeze:
        feats = feats[None]
    # DCT-II with 'ortho' norm as a [nfilt, numcep] matrix (static, host)
    n = np.arange(nfilt)
    k = np.arange(numcep)
    dct = 2.0 * np.cos(np.pi * k[None, :] * (2 * n[:, None] + 1) / (2 * nfilt))
    scale = np.full((1, numcep), np.sqrt(1.0 / (2 * nfilt)))
    scale[0, 0] = np.sqrt(1.0 / (4 * nfilt))
    dct = jnp.asarray(dct * scale, jnp.float32)
    out = jnp.einsum("btf,fc->btc", feats, dct, preferred_element_type=jnp.float32)
    if ceplifter > 0:
        lift = 1.0 + (ceplifter / 2.0) * jnp.sin(
            jnp.pi * jnp.arange(numcep) / ceplifter
        )
        out = out * lift[None, None, :]
    return out[0] if squeeze else out


def add_deltas(feats: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    """Append delta and delta-delta features along the last axis
    ([..., T, F] -> [..., T, 3F]); standard regression deltas over a
    ``window``-frame context with edge replication (the torchaudio /
    Kaldi ``compute_deltas`` convention used by the HuBERT k-means
    recipe's 39-dim MFCC features)."""

    def _delta(x):
        denom = 2.0 * sum(i * i for i in range(1, window + 1))
        pad = [(0, 0)] * (x.ndim - 2) + [(window, window), (0, 0)]
        xp = jnp.pad(x, pad, mode="edge")
        t = x.shape[-2]
        acc = jnp.zeros_like(x)
        for i in range(1, window + 1):
            plus = jax.lax.dynamic_slice_in_dim(xp, window + i, t, axis=-2)
            minus = jax.lax.dynamic_slice_in_dim(xp, window - i, t, axis=-2)
            acc = acc + i * (plus - minus)
        return acc / denom

    d = _delta(feats)
    dd = _delta(d)
    return jnp.concatenate([feats, d, dd], axis=-1)


def avhubert_audio_features(
    audio: Union[np.ndarray, jnp.ndarray],
    samplerate: int = SAMPLE_RATE,
    stack_order: int = 4,
    normalize: bool = True,
) -> jnp.ndarray:
    """Full AV-HuBERT audio path: logfbank -> stack -> normalize (104-dim)."""
    feats = logfbank(audio, samplerate=samplerate)
    feats = stack_frames(feats, stack_order)
    if normalize:
        feats = frame_normalize(feats)
    return feats

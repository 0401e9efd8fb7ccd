"""Whisper-compatible log-mel spectrogram as a fused TPU computation.

Replicates the math of OpenAI Whisper's ``log_mel_spectrogram`` /
``pad_or_trim`` (which the reference calls per dataset item at
avsl/whisper_flamingo_ft_ami.py:210-213), but formulated TPU-first:

* Framing + windowed rDFT is expressed as **one strided 1-D convolution**
  whose filters are the Hann-windowed DFT basis — XLA lowers this straight
  onto the MXU, no gather/scatter, no FFT on device.
* Power, mel projection (a second matmul), log10, dynamic-range clamp, and
  scaling all fuse into the same XLA graph; a whole batch compiles to a
  single program with static shapes.

Constants (published Whisper front end): 16 kHz audio, n_fft 400, hop 160,
periodic Hann window, reflect center padding, |.|^2 of all-but-last frame,
Slaney mel filters, log10 clamped to [max-8, max], then (x+4)/4.
"""

from __future__ import annotations

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from avsl_tpu.kernels.mel import mel_filterbank_slaney

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000


def pad_or_trim(
    array: Union[np.ndarray, jnp.ndarray], length: int = N_SAMPLES, axis: int = -1
):
    """Pad with zeros or trim to exactly ``length`` along ``axis``."""
    xp = jnp if isinstance(array, jnp.ndarray) else np
    n = array.shape[axis]
    if n > length:
        idx = [slice(None)] * array.ndim
        idx[axis] = slice(0, length)
        return array[tuple(idx)]
    if n < length:
        pad = [(0, 0)] * array.ndim
        pad[axis] = (0, length - n)
        return xp.pad(array, pad)
    return array


@functools.lru_cache(maxsize=8)
def _dft_conv_filters(n_fft: int) -> np.ndarray:
    """Hann-windowed real-DFT basis as conv filters ``[2*n_bins, 1, n_fft]``.

    Filter bank rows: first n_bins are cos (real part), next n_bins are -sin
    (imag part), each pre-multiplied by the periodic Hann window so that
    framing + windowing + DFT is a single conv.
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))  # periodic Hann
    k = np.arange(n_bins, dtype=np.float64)[:, None]
    angle = 2.0 * np.pi * k * n[None, :] / n_fft
    cos_basis = np.cos(angle) * window[None, :]
    sin_basis = -np.sin(angle) * window[None, :]
    filt = np.concatenate([cos_basis, sin_basis], axis=0).astype(np.float32)
    return filt[:, None, :]  # [out_ch, in_ch=1, width]


@functools.lru_cache(maxsize=8)
def _mel_matrix(n_mels: int, n_fft: int, sr: int) -> np.ndarray:
    return mel_filterbank_slaney(sr=sr, n_fft=n_fft, n_mels=n_mels)


def _stft_power(audio: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Power spectrogram ``[B, n_bins, n_frames]`` of center-padded audio.

    ``audio`` is ``[B, n]``; reflect-pads n_fft//2 each side (torch.stft
    center semantics), then computes the windowed rDFT via strided conv.
    """
    b, n = audio.shape
    pad = n_fft // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    filt = jnp.asarray(_dft_conv_filters(n_fft))
    # conv input layout: [batch, channel, width]
    out = jax.lax.conv_general_dilated(
        x[:, None, :],
        filt,
        window_strides=(hop,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )  # [B, 2*n_bins, n_frames]
    n_bins = n_fft // 2 + 1
    real, imag = out[:, :n_bins, :], out[:, n_bins:, :]
    return real * real + imag * imag


@functools.partial(jax.jit, static_argnames=("n_mels", "padding", "n_fft", "hop", "sr"))
def _log_mel_impl(
    audio: jnp.ndarray,
    n_mels: int,
    padding: int,
    n_fft: int,
    hop: int,
    sr: int,
) -> jnp.ndarray:
    if padding > 0:
        audio = jnp.pad(audio, ((0, 0), (0, padding)))
    power = _stft_power(audio.astype(jnp.float32), n_fft, hop)
    power = power[:, :, :-1]  # whisper drops the final frame
    mel_mat = jnp.asarray(_mel_matrix(n_mels, n_fft, sr))
    mel = jnp.einsum(
        "mf,bft->bmt", mel_mat, power, preferred_element_type=jnp.float32
    )
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # dynamic-range clamp is per sample (whisper computes it per call on one item)
    max_per_sample = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_per_sample - 8.0)
    return (log_spec + 4.0) / 4.0


def log_mel_spectrogram(
    audio: Union[np.ndarray, jnp.ndarray],
    n_mels: int = 80,
    padding: int = 0,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    sample_rate: int = SAMPLE_RATE,
) -> jnp.ndarray:
    """Whisper log-mel: ``[n_mels, T]`` for 1-D input, ``[B, n_mels, T]`` batched.

    ``padding`` appends that many zero samples before the transform, matching
    the ``padding=`` argument of Whisper's implementation.
    """
    audio = jnp.asarray(audio)
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    out = _log_mel_impl(audio, n_mels, padding, n_fft, hop_length, sample_rate)
    return out[0] if squeeze else out

"""Polyphase resampling on device.

The reference resamples on the host per dataset item with torchaudio
(avsl/whisper_flamingo_ft_ami.py:195-197) or librosa
(preprocess/audio_process.py:54-57). Here resampling is a jit-compiled XLA
convolution (zero-stuffing via lhs_dilation + strided FIR), so waveforms can
be shipped to the TPU at their native rate and resampled on device — the
host never touches sample math.

Filter design follows the scipy.signal.resample_poly recipe (Kaiser beta 5,
10*max(up,down) half-length, firwin lowpass scaled at DC) so outputs are
golden-testable against scipy.
"""

from __future__ import annotations

import functools
import math
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _design_filter(up: int, down: int) -> np.ndarray:
    max_rate = max(up, down)
    f_c = 1.0 / max_rate  # cutoff in Nyquist-normalized units
    half_len = 10 * max_rate
    numtaps = 2 * half_len + 1
    m = np.arange(numtaps, dtype=np.float64) - half_len
    h = f_c * np.sinc(f_c * m)
    h *= np.kaiser(numtaps, 5.0)
    h /= h.sum()  # firwin scale=True at DC
    return (h * up).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("up", "down"))
def _resample_impl(x: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    h = jnp.asarray(_design_filter(up, down))
    half_len = (h.shape[0] - 1) // 2
    # zero-stuff by `up` (lhs_dilation), centered FIR, then decimate by `down`
    out = jax.lax.conv_general_dilated(
        x[:, None, :].astype(jnp.float32),
        h[None, None, :],
        window_strides=(down,),
        padding=[(half_len, half_len + up - 1)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return out[:, 0, :]


def resample_poly(
    x: Union[np.ndarray, jnp.ndarray], orig_sr: int, target_sr: int
) -> jnp.ndarray:
    """Resample along the last axis from ``orig_sr`` to ``target_sr``."""
    if orig_sr == target_sr:
        return jnp.asarray(x)
    g = math.gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    x = jnp.asarray(x)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    out = _resample_impl(x, up, down)
    return out[0] if squeeze else out

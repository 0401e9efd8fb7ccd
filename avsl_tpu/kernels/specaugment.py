"""SpecAugment (LibriSpeech basic / double policies) under jit.

The reference applies SpecAugment per dataset item on the host via the
external whisper_flamingo fork's ``spec_augment`` (call sites at
avsl/whisper_flamingo_ft_ami.py:216-226: "ls-double" -> defaults,
"ls-basic" -> ``n_freq_mask=1, n_time_mask=1``). Here it is a pure
jit-compiled function of a PRNG key with static shapes, so augmentation
runs on device as part of the input pipeline — no host RNG, reproducible
under `jax.random` key folding.

Policy constants follow the SpecAugment paper's LibriSpeech settings:
F=27 max mel-bins per frequency mask, T=100 max frames per time mask,
time masks confined to the first ``audio_frames`` (the unpadded region).
Masked cells are replaced with the spectrogram mean.
"""

from __future__ import annotations

import functools
from typing import Union

import jax
import jax.numpy as jnp

F_MAX = 27
T_MAX = 100


@functools.partial(
    jax.jit, static_argnames=("n_freq_mask", "n_time_mask", "f_max", "t_max")
)
def spec_augment(
    mel: jnp.ndarray,
    key: jax.Array,
    audio_frames: Union[int, jnp.ndarray],
    n_freq_mask: int = 2,
    n_time_mask: int = 2,
    f_max: int = F_MAX,
    t_max: int = T_MAX,
) -> jnp.ndarray:
    """Apply SpecAugment to ``mel`` of shape [T, n_mels] (time-major).

    ``audio_frames`` bounds time masks to the unpadded prefix; may be a
    traced scalar so one compiled program serves every batch.
    """
    t_len, n_mels = mel.shape
    audio_frames = jnp.minimum(jnp.asarray(audio_frames, jnp.int32), t_len)
    mean = jnp.mean(mel)
    time_ids = jax.lax.broadcasted_iota(jnp.int32, (t_len, n_mels), 0)
    freq_ids = jax.lax.broadcasted_iota(jnp.int32, (t_len, n_mels), 1)

    mask = jnp.zeros((t_len, n_mels), dtype=bool)
    keys = jax.random.split(key, 2 * (n_freq_mask + n_time_mask))
    k = 0
    for _ in range(n_freq_mask):
        f = jax.random.randint(keys[k], (), 0, f_max + 1)
        f0 = jax.random.randint(keys[k + 1], (), 0, jnp.maximum(n_mels - f, 1))
        mask |= (freq_ids >= f0) & (freq_ids < f0 + f)
        k += 2
    for _ in range(n_time_mask):
        t = jax.random.randint(keys[k], (), 0, t_max + 1)
        t = jnp.minimum(t, audio_frames)
        t0 = jax.random.randint(keys[k + 1], (), 0, jnp.maximum(audio_frames - t, 1))
        mask |= (time_ids >= t0) & (time_ids < t0 + t)
        k += 2

    return jnp.where(mask, mean, mel)


def spec_augment_batch(
    mel: jnp.ndarray,
    key: jax.Array,
    audio_frames: jnp.ndarray,
    n_freq_mask: int = 2,
    n_time_mask: int = 2,
) -> jnp.ndarray:
    """Vectorized over a batch: mel [B, T, n_mels], audio_frames [B]."""
    keys = jax.random.split(key, mel.shape[0])
    return jax.vmap(
        lambda m, k, af: spec_augment(
            m, k, af, n_freq_mask=n_freq_mask, n_time_mask=n_time_mask
        )
    )(mel, keys, audio_frames)

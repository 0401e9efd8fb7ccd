"""Per-kernel micro-benchmarks on the current device (TPU or CPU).

Usage: ``python scripts/bench_kernels.py``
Prints a table: kernel, problem size, time/call, and achieved rate.

Caveat: through the axon dev tunnel, sub-10ms kernels cannot be timed
reliably (RPC acks return before execution settles); trust the relative
ordering and the large-kernel numbers (e.g. the warp comparison).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def timeit(fn, *args, iters=20):
    """Per-call wall time, syncing every call and cycling DISTINCT inputs
    (identical repeated calls can be result-cached by tunneled backends,
    which reports impossible rates)."""
    import jax
    import jax.numpy as jnp

    variants = []
    for i in range(4):
        variants.append(
            tuple(
                a + jnp.asarray(0.001 * (i + 1), a.dtype) if hasattr(a, "dtype") and a.dtype != bool else a
                for a in args
            )
        )
    for v in variants:
        jax.block_until_ready(fn(*v))
    t0 = time.perf_counter()
    for i in range(iters):
        jax.block_until_ready(fn(*variants[i % len(variants)]))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from avsl_tpu.data.lip_roi import canonical_mean_face
    from avsl_tpu.kernels import avhubert_audio_features, log_mel_spectrogram, resample_poly
    from avsl_tpu.kernels.attention import _reference_attention, fused_attention
    from avsl_tpu.kernels.warp import warp_and_crop_clip, warp_and_crop_clip_separable

    rng = np.random.default_rng(0)
    rows = []

    # log-mel: batch of 8 x 10 s
    audio = jnp.asarray(rng.normal(size=(8, 160000)).astype(np.float32))
    f = jax.jit(lambda a: log_mel_spectrogram(a, n_mels=80))
    dt = timeit(f, audio)
    rows.append(("log-mel 80", "8x10s", dt, f"{8 * 10 / dt:.0f} audio-s/s"))

    # 104-dim fbank path
    f = jax.jit(lambda a: avhubert_audio_features(a))
    dt = timeit(f, audio)
    rows.append(("logfbank+stack4", "8x10s", dt, f"{8 * 10 / dt:.0f} audio-s/s"))

    # resampler 44.1k -> 16k
    audio44 = jnp.asarray(rng.normal(size=(8, 441000)).astype(np.float32))
    f = jax.jit(lambda a: resample_poly(a, 44100, 16000))
    dt = timeit(f, audio44)
    rows.append(("resample 44k->16k", "8x10s", dt, f"{8 * 10 / dt:.0f} audio-s/s"))

    # attention at whisper-large encoder shape
    b, h, t, d = 8, 20, 1500, 64
    q = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.bfloat16)
    flops = 4 * b * h * t * t * d
    for name, fn in (
        ("fused attention", jax.jit(lambda q: fused_attention(q, q, q))),
        ("xla attention", jax.jit(
            lambda q: _reference_attention(
                q.transpose(0, 2, 1, 3), q.transpose(0, 2, 1, 3),
                q.transpose(0, 2, 1, 3), None, False,
            )
        )),
    ):
        dt = timeit(fn, q)
        rows.append((name, f"b{b} h{h} t{t} d{d}", dt, f"{flops / dt / 1e12:.1f} TFLOP/s"))

    # attention fwd+bwd (training step shape; flash bwd kernel vs XLA vjp)
    bwd_flops = 10 * b * h * t * t * d  # fwd (4) + bwd (~6, softmax recompute + 4 grads)
    for name, loss in (
        ("attention fwd+bwd pallas", lambda q: jnp.sum(
            fused_attention(q, q, q).astype(jnp.float32) ** 2)),
        ("attention fwd+bwd xla", lambda q: jnp.sum(
            _reference_attention(
                q.transpose(0, 2, 1, 3), q.transpose(0, 2, 1, 3),
                q.transpose(0, 2, 1, 3), None, False,
            ).astype(jnp.float32) ** 2)),
    ):
        fn = jax.jit(jax.grad(loss))
        dt = timeit(fn, q)
        rows.append((name, f"b{b} h{h} t{t} d{d}", dt,
                     f"{bwd_flops / dt / 1e12:.1f} TFLOP/s"))

    # lip warp: 250-frame clip batch of 8
    mean_face = jnp.asarray(canonical_mean_face(300))
    frames = jnp.asarray(rng.integers(0, 255, (8, 250, 144, 144)).astype(np.float32))
    lms = np.asarray(mean_face) * 0.4 + np.array([20.0, 10.0])
    lms_b = jnp.asarray(np.tile(lms, (8, 250, 1, 1)))
    px = 8 * 250 * 96 * 96
    for name, warp in (
        ("warp separable (MXU)", warp_and_crop_clip_separable),
        ("warp gather", warp_and_crop_clip),
    ):
        f = jax.jit(jax.vmap(lambda fr, l: warp(fr, l, mean_face)))
        dt = timeit(f, frames, lms_b)
        rows.append((name, "8x250f 144^2->96^2", dt, f"{px / dt / 1e6:.0f} Mpx/s"))

    print(f"{'kernel':<24}{'size':<22}{'ms/call':>10}{'rate':>18}")
    for name, size, dt, rate in rows:
        print(f"{name:<24}{size:<22}{dt * 1e3:>10.2f}{rate:>18}")


if __name__ == "__main__":
    main()

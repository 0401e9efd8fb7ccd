"""k-means cluster-target generation for AV-HuBERT pretraining.

Parity: the published AV-HuBERT/HuBERT recipe generates per-frame
pretraining targets by k-means over MFCC (iteration 1) or model-layer
features (later iterations) with sklearn MiniBatchKMeans — fairseq's
``simple_kmeans/learn_kmeans.py`` + ``dump_km_label.py``, which are
EXTERNAL to the reference repo (it consumes the resulting checkpoints;
see reference avsl/modules/av_hubert_model.py:154-233). Re-designed
TPU-first:

- the E-step distance matrix is one ``[N, D] x [D, K]`` matmul
  (``argmin |x|^2 - 2 x.c + |c|^2``; the ``|x|^2`` term drops out of the
  argmin) — MXU-shaped, no per-point loops;
- the M-step is a ``segment_sum``;
- Lloyd iterations run inside ONE jit via ``lax.scan`` (static iteration
  count, empty clusters carry their previous centroid) — no host round
  trips per iteration;
- data is processed in static-shape chunks so arbitrary corpus sizes
  compile once.

``KMeansQuantizer`` wraps fit/assign with npz (de)serialization so the
codebook travels with a pretraining run like fairseq's ``.km`` models.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["kmeans_fit", "kmeans_assign", "KMeansQuantizer"]


def _pp_init(x: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """k-means++ seeding on a host subsample (init is tiny next to Lloyd)."""
    n = x.shape[0]
    centroids = np.empty((k, x.shape[1]), x.dtype)
    centroids[0] = x[rng.integers(n)]
    d2 = np.sum((x - centroids[0]) ** 2, axis=1)
    for i in range(1, k):
        probs = d2 / max(d2.sum(), 1e-12)
        centroids[i] = x[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, np.sum((x - centroids[i]) ** 2, axis=1))
    return centroids


@functools.partial(jax.jit, static_argnames=("k", "n_iters"))
def _lloyd(
    x: jnp.ndarray,  # [C, B, D] chunked points
    w: jnp.ndarray,  # [C, B] 1 = real point, 0 = padding
    init_c: jnp.ndarray,  # [K, D]
    k: int,
    n_iters: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full Lloyd iterations under one jit. Returns (centroids, inertia)."""

    def assign_chunk(carry, chunk):
        sums, counts, inert = carry
        xc, wc, c = chunk["x"], chunk["w"], chunk["c"]
        # argmin_k |x|^2 - 2 x.c + |c|^2 ; |x|^2 kept only for inertia
        dots = xc @ c.T  # [B, K] — the MXU op
        d2 = jnp.sum(c * c, axis=1)[None, :] - 2.0 * dots
        labels = jnp.argmin(d2, axis=1)
        best = jnp.min(d2, axis=1) + jnp.sum(xc * xc, axis=1)
        one_hot = jax.nn.one_hot(labels, k, dtype=xc.dtype) * wc[:, None]
        sums = sums + one_hot.T @ xc
        counts = counts + jnp.sum(one_hot, axis=0)
        inert = inert + jnp.sum(best * wc)
        return (sums, counts, inert), None

    def lloyd_iter(c, _):
        zero = (
            jnp.zeros((k, x.shape[-1]), x.dtype),
            jnp.zeros((k,), x.dtype),
            jnp.zeros((), x.dtype),
        )
        (sums, counts, inert), _ = jax.lax.scan(
            assign_chunk,
            zero,
            {"x": x, "w": w, "c": jnp.broadcast_to(c, (x.shape[0],) + c.shape)},
        )
        new_c = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), c
        )
        return new_c, inert

    centroids, inertias = jax.lax.scan(lloyd_iter, init_c, None, length=n_iters)
    return centroids, inertias[-1]


def _chunked(feats: np.ndarray, chunk: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n, d = feats.shape
    pad = (-n) % chunk
    w = np.ones((n,), np.float32)
    if pad:
        feats = np.concatenate([feats, np.zeros((pad, d), feats.dtype)])
        w = np.concatenate([w, np.zeros((pad,), np.float32)])
    c = len(feats) // chunk
    return (
        jnp.asarray(feats.reshape(c, chunk, d), jnp.float32),
        jnp.asarray(w.reshape(c, chunk)),
    )


def kmeans_fit(
    features: np.ndarray,
    k: int,
    n_iters: int = 25,
    seed: int = 0,
    init: str = "kmeans++",
    chunk: int = 65536,
    init_subsample: int = 100_000,
) -> Tuple[np.ndarray, float]:
    """Fit ``k`` centroids on ``[N, D]`` features. Returns
    ``(centroids [k, D], inertia)``."""
    features = np.asarray(features, np.float32)
    if features.ndim != 2:
        raise ValueError(f"features must be [N, D], got {features.shape}")
    n = features.shape[0]
    if n < k:
        raise ValueError(f"need at least k={k} points, got {n}")
    rng = np.random.default_rng(seed)
    sub = features
    if n > init_subsample:
        sub = features[rng.choice(n, init_subsample, replace=False)]
    if init == "kmeans++":
        init_c = _pp_init(sub, k, rng)
    elif init == "random":
        init_c = sub[rng.choice(len(sub), k, replace=False)]
    else:
        raise ValueError(f"unknown init {init!r}")
    x, w = _chunked(features, min(chunk, max(256, n)))
    centroids, inertia = _lloyd(x, w, jnp.asarray(init_c), k, n_iters)
    return np.asarray(centroids), float(inertia)


@functools.partial(jax.jit, static_argnames=())
def _assign(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    d2 = jnp.sum(c * c, axis=1)[None, :] - 2.0 * (x @ c.T)
    return jnp.argmin(d2, axis=1).astype(jnp.int32)


def kmeans_assign(features: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest-centroid labels for ``[..., D]`` features (frame targets)."""
    feats = jnp.asarray(features, jnp.float32)
    lead = feats.shape[:-1]
    flat = feats.reshape(-1, feats.shape[-1])
    labels = _assign(flat, jnp.asarray(centroids, jnp.float32))
    return np.asarray(labels).reshape(lead)


class KMeansQuantizer:
    """Codebook wrapper: fit / __call__ / save / load (npz — the role of
    fairseq's joblib ``.km`` model files)."""

    def __init__(self, centroids: Optional[np.ndarray] = None):
        self.centroids = centroids

    @property
    def n_clusters(self) -> int:
        return 0 if self.centroids is None else len(self.centroids)

    def fit(self, features: np.ndarray, k: int, **kw) -> "KMeansQuantizer":
        self.centroids, self.inertia = kmeans_fit(features, k, **kw)
        return self

    def __call__(self, features: np.ndarray) -> np.ndarray:
        if self.centroids is None:
            raise ValueError("quantizer not fitted")
        return kmeans_assign(features, self.centroids)

    def save(self, path: str) -> None:
        np.savez(path, centroids=self.centroids)

    @classmethod
    def load(cls, path: str) -> "KMeansQuantizer":
        with np.load(path) as z:
            return cls(z["centroids"])

"""k-means target generation (data/clustering.py) + MFCC features
(kernels/fbank.py) — the HuBERT iteration-1 pretraining-target recipe.
"""

import numpy as np
import pytest

from avsl_tpu.data.clustering import KMeansQuantizer, kmeans_assign, kmeans_fit
from avsl_tpu.kernels.fbank import add_deltas, logfbank, mfcc


def _blobs(seed=0, n_per=200, d=8, centers=((0,) * 8, (6,) * 8, (-6, 6) * 4)):
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for i, c in enumerate(centers):
        xs.append(rng.normal(size=(n_per, d)).astype(np.float32) + np.asarray(c))
        ys.append(np.full(n_per, i))
    return np.concatenate(xs), np.concatenate(ys)


def test_kmeans_recovers_separated_blobs():
    x, y = _blobs()
    centroids, inertia = kmeans_fit(x, k=3, n_iters=25, seed=1)
    labels = kmeans_assign(x, centroids)
    # every true blob maps to exactly one cluster id (purity 1 on
    # well-separated gaussians)
    mapping = {}
    for true in range(3):
        ids, counts = np.unique(labels[y == true], return_counts=True)
        major = ids[np.argmax(counts)]
        assert counts.max() / counts.sum() > 0.99
        mapping[true] = major
    assert len(set(mapping.values())) == 3
    # inertia ~ n * d * var (unit gaussians): well below the unclustered
    # total second moment
    assert inertia < 1.5 * x.shape[0] * x.shape[1]


def test_kmeans_chunking_invariance():
    x, _ = _blobs(seed=3, n_per=111)  # 333 points: exercises pad path
    c_small, i_small = kmeans_fit(x, k=3, n_iters=15, seed=5, chunk=64)
    c_big, i_big = kmeans_fit(x, k=3, n_iters=15, seed=5, chunk=100000)
    np.testing.assert_allclose(
        np.sort(c_small, axis=0), np.sort(c_big, axis=0), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(i_small, i_big, rtol=1e-4)


def test_kmeans_random_init_and_assign_roundtrip():
    x, _ = _blobs(seed=7)
    centroids, _ = kmeans_fit(x, k=3, n_iters=20, seed=2, init="random")
    assert centroids.shape == (3, x.shape[1])
    # a centroid's nearest centroid is itself
    np.testing.assert_array_equal(
        kmeans_assign(centroids, centroids), np.arange(3)
    )
    # batched/leading-dims assignment preserves shape
    labels = kmeans_assign(x.reshape(2, -1, x.shape[1]), centroids)
    assert labels.shape == (2, x.shape[0] // 2)


def test_quantizer_save_load_roundtrip(tmp_path):
    x, _ = _blobs(seed=9)
    q = KMeansQuantizer().fit(x, k=3, n_iters=10, seed=0)
    path = str(tmp_path / "km.npz")
    q.save(path)
    q2 = KMeansQuantizer.load(path)
    assert q2.n_clusters == 3
    np.testing.assert_array_equal(q(x), q2(x))


def test_mfcc_matches_scipy_dct_of_logfbank():
    """mfcc == lifter(DCT-II-ortho(logfbank[:, :numcep])) — anchored on
    scipy's DCT (third-party), with the golden-tested logfbank beneath."""
    from scipy.fftpack import dct as scipy_dct

    rng = np.random.default_rng(0)
    audio = rng.normal(size=16000).astype(np.float32)
    got = np.asarray(mfcc(audio, numcep=13, nfilt=26))
    fb = np.asarray(logfbank(audio, nfilt=26))
    want = scipy_dct(fb, type=2, axis=1, norm="ortho")[:, :13]
    n = np.arange(13)
    want = want * (1.0 + (22 / 2.0) * np.sin(np.pi * n / 22))[None, :]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert got.shape == (fb.shape[0], 13)


def test_add_deltas_shapes_and_constant_input():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(10, 13)).astype(np.float32)
    out = np.asarray(add_deltas(x))
    assert out.shape == (10, 39)
    np.testing.assert_array_equal(out[:, :13], x)
    # constant signal: deltas identically zero (edge replication, no leak)
    const = np.ones((10, 13), np.float32)
    np.testing.assert_allclose(np.asarray(add_deltas(const))[:, 13:], 0.0,
                               atol=1e-7)
    # batched input
    assert np.asarray(add_deltas(x[None])).shape == (1, 10, 39)


def test_mfcc_deltas_end_to_end_cluster_targets():
    """The full iteration-1 recipe composes: audio -> 39-dim MFCC+deltas ->
    k-means codebook -> per-frame int targets."""
    rng = np.random.default_rng(2)
    # two alternating tones produce (at least) two separable frame families
    t = np.arange(32000) / 16000.0
    audio = np.where(
        (t * 2).astype(int) % 2 == 0,
        np.sin(2 * np.pi * 440 * t),
        np.sin(2 * np.pi * 2200 * t),
    ).astype(np.float32) + 0.01 * rng.normal(size=t.shape).astype(np.float32)
    feats = np.asarray(add_deltas(mfcc(audio)))
    assert feats.shape[1] == 39
    q = KMeansQuantizer().fit(feats, k=4, n_iters=15, seed=0)
    targets = q(feats)
    assert targets.shape == (feats.shape[0],)
    assert targets.dtype == np.int32
    assert len(np.unique(targets)) >= 2

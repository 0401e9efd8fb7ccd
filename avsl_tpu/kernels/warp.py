"""Similarity-transform estimation + batched bilinear warp/crop on device.

TPU-native replacement for the reference's per-frame skimage/OpenCV lip-ROI
geometry (utils/lips_cropping.py:91-163 in /root/reference): estimate a
similarity transform aligning per-frame stable landmarks to a canonical
mean face, warp each frame, and cut a mouth-centered square patch. The
reference does this one frame at a time on the host (the pipeline's
hottest loop, SURVEY.md §3.4); here the whole clip (or a batch of clips)
is one jit-compiled program.

All transform math is *batched closed-form array arithmetic* over arbitrary
leading dims — a similarity is carried as four coefficient arrays
``(a, b, tx, ty)`` meaning ``dst = [[a, -b], [b, a]] @ src + (tx, ty)``
rather than per-frame 2x2 matrices. This matters beyond style: vmapping
scalar-and-tiny-matrix code (the obvious port of the reference's per-frame
loop) produces HLO that XLA:TPU compiles pathologically slowly (minutes for
toy shapes), and on tunneled runtimes the resulting executable degrades
every subsequent host->device transfer in the process. The batched
formulation compiles in milliseconds and composes under vmap/scan freely.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Coeffs = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]


def similarity_coeffs(src: jnp.ndarray, dst: jnp.ndarray) -> Coeffs:
    """Least-squares similarity transform src -> dst, batched.

    ``src``: [..., N, 2], ``dst``: [..., N, 2] or [N, 2] (broadcast).
    Returns ``(a, b, tx, ty)`` arrays of the leading batch shape with
    ``dst ~= [[a, -b], [b, a]] @ src + (tx, ty)`` — the standard closed
    form for the 2-D rotation+scale least squares (no SVD; reflections are
    excluded, which they are for faces):
    ``a = sum(s . d)/sum|s|^2``, ``b = sum(cross(s, d))/sum|s|^2``.
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    mu_s = jnp.mean(src, axis=-2)
    mu_d = jnp.mean(dst, axis=-2)
    sc = src - mu_s[..., None, :]
    dc = dst - mu_d[..., None, :]
    num_a = jnp.sum(sc * dc, axis=(-2, -1))
    num_b = jnp.sum(sc[..., 0] * dc[..., 1] - sc[..., 1] * dc[..., 0], axis=-1)
    den = jnp.maximum(jnp.sum(sc * sc, axis=(-2, -1)), 1e-8)
    a = num_a / den
    b = num_b / den
    tx = mu_d[..., 0] - (a * mu_s[..., 0] - b * mu_s[..., 1])
    ty = mu_d[..., 1] - (b * mu_s[..., 0] + a * mu_s[..., 1])
    return a, b, tx, ty


def inverse_coeffs(coeffs: Coeffs) -> Coeffs:
    """Invert batched similarity coefficients (same parameterization)."""
    a, b, tx, ty = coeffs
    det = jnp.maximum(a * a + b * b, 1e-12)
    ia = a / det
    ib = -b / det
    itx = -(ia * tx - ib * ty)
    ity = -(ib * tx + ia * ty)
    return ia, ib, itx, ity


def apply_coeffs(points: jnp.ndarray, coeffs: Coeffs) -> jnp.ndarray:
    """Apply batched similarity coeffs to points [..., N, 2]."""
    a, b, tx, ty = coeffs
    x = points[..., 0]
    y = points[..., 1]
    return jnp.stack(
        [
            a[..., None] * x - b[..., None] * y + tx[..., None],
            b[..., None] * x + a[..., None] * y + ty[..., None],
        ],
        axis=-1,
    )


def umeyama(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Similarity transform as a 2x3 matrix (unbatched convenience wrapper).

    ``src``, ``dst``: [N, 2]. Returns M with
    ``dst ~= src @ M[:, :2].T + M[:, 2]``.
    """
    a, b, tx, ty = similarity_coeffs(src, dst)
    return jnp.stack(
        [jnp.stack([a, -b, tx]), jnp.stack([b, a, ty])]
    )


def invert_similarity(m: jnp.ndarray) -> jnp.ndarray:
    """Invert a 2x3 similarity matrix (closed form, no linalg.inv)."""
    ia, ib, itx, ity = inverse_coeffs((m[0, 0], m[1, 0], m[0, 2], m[1, 2]))
    return jnp.stack(
        [jnp.stack([ia, -ib, itx]), jnp.stack([ib, ia, ity])]
    )


def _bilinear_sample(image: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Sample ``image`` [..., H, W] at float coords xs/ys [..., h, w]
    (leading dims must match); zero outside the source."""
    h, w = image.shape[-2:]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    dx = xs - x0
    dy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = image.reshape(*image.shape[:-2], h * w)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi = jnp.clip(yi, 0, h - 1)
        xi = jnp.clip(xi, 0, w - 1)
        idx = yi * w + xi
        vals = jnp.take_along_axis(
            flat, idx.reshape(*idx.shape[:-2], -1), axis=-1
        ).reshape(idx.shape)
        return jnp.where(valid, vals, 0.0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - dx) + v01 * dx
    bot = v10 * (1 - dx) + v11 * dx
    return top * (1 - dy) + bot * dy


def warp_frame(
    image: jnp.ndarray, matrix: jnp.ndarray, out_h: int, out_w: int
) -> jnp.ndarray:
    """Warp one frame [H, W] by a 2x3 forward matrix (src->dst coords):
    output(y, x) = input(M^{-1} @ (x, y))."""
    inv = invert_similarity(matrix)
    ys = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    return _bilinear_sample(image.astype(jnp.float32), sx, sy)


def transform_points(points: jnp.ndarray, matrix: jnp.ndarray) -> jnp.ndarray:
    """Apply a 2x3 matrix to [N, 2] (x, y) points."""
    return points @ matrix[:, :2].T + matrix[:, 2]


def _crop_window_coeffs(
    landmarks: jnp.ndarray,  # [..., 68, 2]
    mean_face: jnp.ndarray,  # [68, 2]
    out_size: int,
    crop_size: int,
    stable_idx: Tuple[int, ...],
):
    """Batched transform + mouth-centered crop window for every frame.

    Returns ``(inv, cx, cy)``: inverse similarity coeffs (dst->src) and the
    integer crop-window centers in warped (dst) space, each of the
    landmarks' leading batch shape."""
    stable = np.asarray(stable_idx)
    half = crop_size // 2
    coeffs = similarity_coeffs(landmarks[..., stable, :], mean_face[stable])
    mouth = apply_coeffs(landmarks[..., 48:68, :], coeffs)
    center = jnp.mean(mouth, axis=-2)  # [..., 2] (x, y) in warped space
    cx = jnp.clip(center[..., 0], half, out_size - half).astype(jnp.int32)
    cy = jnp.clip(center[..., 1], half, out_size - half).astype(jnp.int32)
    return inverse_coeffs(coeffs), cx, cy


@functools.partial(jax.jit, static_argnames=("out_size", "crop_size", "stable_idx"))
def warp_and_crop_clip(
    frames: jnp.ndarray,  # [..., H, W] grayscale float/uint8
    landmarks: jnp.ndarray,  # [..., 68, 2] (x, y)
    mean_face: jnp.ndarray,  # [68, 2] canonical coords in out_size space
    out_size: int = 300,
    crop_size: int = 96,
    stable_idx: Tuple[int, ...] = (33, 36, 39, 42, 45),
) -> jnp.ndarray:
    """Full lip-ROI geometry for a clip (or batch of clips) in one program.

    Per frame: similarity transform from stable landmarks to the mean face
    (reference uses points [33, 36, 39, 42, 45] — video_process.py:398,431),
    transform the mouth landmarks (48..67) by the same coeffs, and bilinear-
    sample a ``crop_size``² patch centered on their mean
    (video_process.py:444-448). Crop-first warping: the warp is evaluated
    ONLY on the crop_size² grid — warping the full out_size² then slicing
    would do ~10x the gather work for identical output.
    Returns [..., crop_size, crop_size].
    """
    half = crop_size // 2
    (ia, ib, itx, ity), cx, cy = _crop_window_coeffs(
        landmarks, mean_face, out_size, crop_size, stable_idx
    )
    grid_y = jax.lax.broadcasted_iota(jnp.float32, (crop_size, crop_size), 0)
    grid_x = jax.lax.broadcasted_iota(jnp.float32, (crop_size, crop_size), 1)
    ys = grid_y + (cy - half).astype(jnp.float32)[..., None, None]
    xs = grid_x + (cx - half).astype(jnp.float32)[..., None, None]
    e = (...,) + (None, None)
    sx = ia[e] * xs - ib[e] * ys + itx[e]
    sy = ib[e] * xs + ia[e] * ys + ity[e]
    # same compile-time firewall as the separable kernel (see below): keep
    # the coefficient arithmetic out of the gather loop nests
    sx, sy = jax.lax.optimization_barrier((sx, sy))
    return _bilinear_sample(frames.astype(jnp.float32), sx, sy)


@functools.partial(jax.jit, static_argnames=("out_size", "crop_size", "stable_idx"))
def separable_crop_coords(
    landmarks: jnp.ndarray,  # [..., 68, 2] (x, y)
    mean_face: jnp.ndarray,  # [68, 2]
    out_size: int = 300,
    crop_size: int = 96,
    stable_idx: Tuple[int, ...] = (33, 36, 39, 42, 45),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-frame separable source coordinates (ys, xs), each
    [..., crop_size]: ``crops[..., i, j] = frame[ys[..., i], xs[..., j]]``
    (bilinear). The coefficient half of the separable warp, exposed as its
    own function so it can be jitted SEPARATELY from the sampling half:
    compiled together, XLA:TPU's fusion of the tiny per-frame coefficient
    arithmetic into the banded-matmul loop nests blows compile time up
    from seconds to minutes (measured at [8, 250] clips), and on tunneled
    runtimes long compiles persistently throttle host<->device transfers.
    """
    half = crop_size // 2
    (ia, ib, itx, ity), cx, cy = _crop_window_coeffs(
        landmarks, mean_face, out_size, crop_size, stable_idx
    )
    # separable assumption: ib ~= 0 (no rotation)
    grid = jnp.arange(crop_size, dtype=jnp.float32)
    xs = (grid + (cx - half).astype(jnp.float32)[..., None]) * ia[..., None] + itx[..., None]
    ys = (grid + (cy - half).astype(jnp.float32)[..., None]) * ia[..., None] + ity[..., None]
    return ys, xs


def separable_crop_coords_np(
    landmarks: np.ndarray,  # [..., 68, 2]
    mean_face: np.ndarray,  # [68, 2]
    out_size: int = 300,
    crop_size: int = 96,
    stable_idx: Tuple[int, ...] = (33, 36, 39, 42, 45),
) -> Tuple[np.ndarray, np.ndarray]:
    """Host (numpy) twin of :func:`separable_crop_coords` — bit-equivalent
    up to float summation order.

    Exists because on tunneled TPU runtimes the coefficient program's XLA
    compile is pathologically slow (tens of seconds to minutes,
    nondeterministic) and any compile over ~30 s persistently throttles the
    session's host<->device transfers. The coefficient math is microscopic
    (a few kFLOP per frame), so pipelines that already touch the host (ROI
    slicing) compute it there and upload the [..., crop] coordinate arrays
    (~kBs) instead of compiling the coefficient program at all."""
    lm = np.asarray(landmarks, np.float32)
    mf = np.asarray(mean_face, np.float32)
    stable = np.asarray(stable_idx)
    half = crop_size // 2

    sel = lm[..., stable, :]
    dst = mf[stable]
    mu_s = sel.mean(axis=-2)
    mu_d = dst.mean(axis=0)
    sc = sel - mu_s[..., None, :]
    dc = dst - mu_d
    num_a = (sc * dc).sum(axis=(-2, -1))
    num_b = (sc[..., 0] * dc[..., 1] - sc[..., 1] * dc[..., 0]).sum(axis=-1)
    den = np.maximum((sc * sc).sum(axis=(-2, -1)), 1e-8)
    a = num_a / den
    b = num_b / den
    tx = mu_d[0] - (a * mu_s[..., 0] - b * mu_s[..., 1])
    ty = mu_d[1] - (b * mu_s[..., 0] + a * mu_s[..., 1])

    mouth = lm[..., 48:68, :]
    mx = a[..., None] * mouth[..., 0] - b[..., None] * mouth[..., 1] + tx[..., None]
    my = b[..., None] * mouth[..., 0] + a[..., None] * mouth[..., 1] + ty[..., None]
    cx = np.clip(mx.mean(axis=-1), half, out_size - half).astype(np.int32)
    cy = np.clip(my.mean(axis=-1), half, out_size - half).astype(np.int32)

    det = np.maximum(a * a + b * b, 1e-12)
    ia = a / det
    ib = -b / det
    itx = -(ia * tx - ib * ty)
    ity = -(ib * tx + ia * ty)

    grid = np.arange(crop_size, dtype=np.float32)
    xs = (grid + (cx - half).astype(np.float32)[..., None]) * ia[..., None] + itx[..., None]
    ys = (grid + (cy - half).astype(np.float32)[..., None]) * ia[..., None] + ity[..., None]
    return ys, xs


def _interp_matrix(coords: jnp.ndarray, n: int) -> jnp.ndarray:
    # [..., crop, n] banded bilinear weights: W[..., i, k] = max(0, 1-|c-k|).
    # Validity is per TAP, not per coordinate: a tap only exists for
    # k in [0, n), so sub-pixel coords in (-1, 0) and (n-1, n) keep their
    # one in-bounds partial contribution — exactly matching the gather
    # kernel's per-tap masking (_bilinear_sample), including at frame
    # edges; coords beyond that have every |c-k| >= 1 and contribute zero.
    k = jnp.arange(n, dtype=jnp.float32)
    d = jnp.abs(coords[..., None] - k)
    return jnp.maximum(0.0, 1.0 - d)


@functools.partial(jax.jit, static_argnames=("chunk",))
def sample_separable(
    frames: jnp.ndarray,  # [..., H, W] grayscale float/uint8
    ys: jnp.ndarray,  # [..., crop] per-frame source row coords
    xs: jnp.ndarray,  # [..., crop] per-frame source col coords
    chunk: int = 32,
) -> jnp.ndarray:
    """Separable bilinear resampling as two MXU matmuls per frame:
    ``out = Wy @ frame @ Wx^T`` with banded interpolation matrices built
    on the fly. Replaces per-pixel gathers (slow on TPU) with dense
    matmuls — the TPU-native formulation of the warp.

    Frames are processed in ``chunk``-frame groups via ``lax.map`` so the
    banded matrices never materialize for the whole batch at once. This
    bounds peak HBM for the transient weights to a few MB regardless of
    batch size — without it, a [8, 250] clip batch allocates ~GB of
    transients, and on tunneled TPU runtimes that burst PERMANENTLY
    degrades the session's host<->device transfer bandwidth ~25x
    (staging-buffer pool damage; measured and bisected to exactly this
    program). Chunking also keeps the executable small. Results are
    identical; ``chunk`` only trades a little dispatch overhead for peak
    memory."""
    batch_shape = frames.shape[:-2]
    h, w = frames.shape[-2:]
    c = ys.shape[-1]
    n = 1
    for s in batch_shape:
        n *= int(s)

    def sample_group(fb, yb, xb):
        wy = _interp_matrix(yb, h)  # [m, crop, H]
        wx = _interp_matrix(xb, w)  # [m, crop, W]
        tmp = jnp.einsum(
            "mch,mhw->mcw", wy, fb.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return jnp.einsum(
            "mcw,mdw->mcd", tmp, wx, preferred_element_type=jnp.float32
        )

    f = frames.reshape(n, h, w)
    ysf = ys.reshape(n, c)
    xsf = xs.reshape(n, c)
    if n <= chunk:
        out = sample_group(f, ysf, xsf)
    else:
        pad = (-n) % chunk
        if pad:
            f = jnp.concatenate([f, jnp.zeros((pad, h, w), f.dtype)])
            ysf = jnp.concatenate([ysf, jnp.full((pad, c), -1.0, jnp.float32)])
            xsf = jnp.concatenate([xsf, jnp.full((pad, c), -1.0, jnp.float32)])
        groups = (n + pad) // chunk
        out = jax.lax.map(
            lambda args: sample_group(*args),
            (
                f.reshape(groups, chunk, h, w),
                ysf.reshape(groups, chunk, c),
                xsf.reshape(groups, chunk, c),
            ),
        )
        out = out.reshape(-1, c, c)[:n]
    return out.reshape(*batch_shape, c, c)


@functools.partial(jax.jit, static_argnames=("out_size", "crop_size", "stable_idx"))
def warp_and_crop_clip_separable(
    frames: jnp.ndarray,  # [..., H, W] grayscale float/uint8
    landmarks: jnp.ndarray,  # [..., 68, 2] (x, y)
    mean_face: jnp.ndarray,  # [68, 2]
    out_size: int = 300,
    crop_size: int = 96,
    stable_idx: Tuple[int, ...] = (33, 36, 39, 42, 45),
) -> jnp.ndarray:
    """Rotation-free lip-ROI warp as two MXU matmuls per frame.

    Convenience composition of :func:`separable_crop_coords` +
    :func:`sample_separable` in one program (fine on CPU and for tests).
    For TPU pipelines jit the two halves separately — see
    ``separable_crop_coords`` for why. Matches :func:`warp_and_crop_clip`
    exactly for rotation-free transforms; use the general kernel when
    landmarks carry head roll. Batched over arbitrary leading dims
    ([T, H, W] or [B, T, H, W]).
    """
    ys, xs = separable_crop_coords(
        landmarks, mean_face, out_size, crop_size, stable_idx
    )
    # compile-time firewall between the halves (semantically a no-op)
    ys, xs = jax.lax.optimization_barrier((ys, xs))
    return sample_separable(frames, ys, xs)


def rgb_to_grayscale(frames: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601 luma ([..., H, W, 3] uint8/float -> [..., H, W] float32),
    matching the reference's conversion (utils/hf_video_utils.py:103-105)."""
    frames = frames.astype(jnp.float32)
    return (
        0.299 * frames[..., 0] + 0.587 * frames[..., 1] + 0.114 * frames[..., 2]
    )


def center_crop(frames: jnp.ndarray, size: int) -> jnp.ndarray:
    """Center-crop [..., H, W] to [..., size, size]."""
    h, w = frames.shape[-2], frames.shape[-1]
    top = max((h - size) // 2, 0)
    left = max((w - size) // 2, 0)
    return frames[..., top : top + size, left : left + size]


def normalize_frames(
    frames: jnp.ndarray, mean: float = 0.421, std: float = 0.165
) -> jnp.ndarray:
    """Scale [0,255] -> [0,1] then (x - mean)/std (AV-HuBERT convention,
    whisper_flamingo_ft_ami.py:279-290)."""
    x = frames.astype(jnp.float32)
    x = jnp.where(jnp.max(x) > 1.5, x / 255.0, x)
    return (x - mean) / std

"""Similarity-transform estimation + batched bilinear warp/crop on device.

TPU-native replacement for the reference's per-frame skimage/OpenCV lip-ROI
geometry (utils/lips_cropping.py:91-163 in /root/reference): estimate a
similarity transform aligning per-frame stable landmarks to a canonical
mean face, warp each frame, and cut a mouth-centered square patch. The
reference does this one frame at a time on the host (the pipeline's
hottest loop, SURVEY.md §3.4); here the whole clip (or a batch of clips)
is one jit-compiled program — transform estimation is a closed-form
Umeyama solve (vmapped), warping is a bilinear gather evaluated for all
output pixels at once.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def umeyama(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Least-squares similarity transform (scale+rot+trans) src -> dst.

    ``src``, ``dst``: [N, 2]. Returns a 2x3 matrix M with
    ``dst ~= src @ M[:, :2].T + M[:, 2]`` (the standard Umeyama closed
    form with SVD sign correction)."""
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    mu_s = jnp.mean(src, axis=0)
    mu_d = jnp.mean(dst, axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    # closed form for the 2-D rotation+scale least squares (no SVD — SVD is
    # pathologically slow to compile/run on TPU and unnecessary in 2-D when
    # reflections are excluded, which they are for faces):
    #   a = sum(s . d), b = sum(cross(s, d));  sR = [[a,-b],[b,a]] / sum|s|^2
    a = jnp.sum(sc * dc)
    b = jnp.sum(sc[:, 0] * dc[:, 1] - sc[:, 1] * dc[:, 0])
    denom = jnp.maximum(jnp.sum(sc * sc), 1e-8)
    sr = jnp.array([[a, -b], [b, a]]) / denom  # scale * rotation
    t = mu_d - sr @ mu_s
    return jnp.concatenate([sr, t[:, None]], axis=1)  # [2,3]


def invert_similarity(m: jnp.ndarray) -> jnp.ndarray:
    """Invert a 2x3 similarity matrix."""
    a = m[:, :2]
    t = m[:, 2]
    a_inv = jnp.linalg.inv(a)
    return jnp.concatenate([a_inv, (-a_inv @ t)[:, None]], axis=1)


def _bilinear_sample(image: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Sample ``image`` [H, W] at float coords (xs, ys); zero outside."""
    h, w = image.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    dx = xs - x0
    dy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi = jnp.clip(yi, 0, h - 1)
        xi = jnp.clip(xi, 0, w - 1)
        return jnp.where(valid, image[yi, xi], 0.0)

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


@functools.partial(jax.jit, static_argnames=("out_size", "crop_size", "stable_idx"))
def warp_and_crop_clip(
    frames: jnp.ndarray,  # [T, H, W] grayscale float
    landmarks: jnp.ndarray,  # [T, 68, 2] (x, y)
    mean_face: jnp.ndarray,  # [68, 2] canonical coords in out_size space
    out_size: int = 300,
    crop_size: int = 96,
    stable_idx: Tuple[int, ...] = (33, 36, 39, 42, 45),
) -> jnp.ndarray:
    """Full lip-ROI geometry for one clip in a single program.

    Per frame: similarity transform from stable landmarks to the mean face
    (reference uses points [33, 36, 39, 42, 45] — video_process.py:398,431),
    warp to ``out_size``², transform the mouth landmarks (48..67) by the same
    matrix, and cut a ``crop_size``² patch centered on their mean
    (video_process.py:444-448). Returns [T, crop_size, crop_size].
    """
    stable = jnp.asarray(stable_idx)
    half = crop_size // 2

    def per_frame(frame, lms):
        m = umeyama(lms[stable], mean_face[stable])
        mouth = transform_points(lms[48:68], m)
        center = jnp.mean(mouth, axis=0)  # (x, y) in warped space
        cx = jnp.clip(center[0], half, out_size - half).astype(jnp.int32)
        cy = jnp.clip(center[1], half, out_size - half).astype(jnp.int32)
        # crop-first warping: evaluate the warp ONLY on the crop_size² grid
        # (gathers are the expensive op on TPU; warping the full out_size²
        # then slicing would do ~10x the gather work for identical output)
        inv = invert_similarity(m)
        ys = jax.lax.broadcasted_iota(jnp.float32, (crop_size, crop_size), 0) + (
            cy - half
        ).astype(jnp.float32)
        xs = jax.lax.broadcasted_iota(jnp.float32, (crop_size, crop_size), 1) + (
            cx - half
        ).astype(jnp.float32)
        sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
        sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
        return _bilinear_sample(frame.astype(jnp.float32), sx, sy)

    return jax.vmap(per_frame)(frames, landmarks)


@functools.partial(jax.jit, static_argnames=("out_size", "crop_size", "stable_idx"))
def warp_and_crop_clip_separable(
    frames: jnp.ndarray,  # [T, H, W] grayscale float/uint8
    landmarks: jnp.ndarray,  # [T, 68, 2] (x, y)
    mean_face: jnp.ndarray,  # [68, 2]
    out_size: int = 300,
    crop_size: int = 96,
    stable_idx: Tuple[int, ...] = (33, 36, 39, 42, 45),
) -> jnp.ndarray:
    """Rotation-free lip-ROI warp as two MXU matmuls per frame.

    When the similarity transform has no rotation component (exactly the
    case for landmarks generated from an upright canonical layout, e.g.
    the motion detector in avsl_tpu.data.landmarks), the bilinear sampling
    grid is separable: out = Wy @ frame @ Wx^T with banded interpolation
    matrices built on the fly. This replaces per-pixel gathers (slow on
    TPU) with dense matmuls — the TPU-native formulation of the warp.
    Matches :func:`warp_and_crop_clip` exactly for rotation-free
    transforms; use the general kernel when landmarks carry head roll.
    """
    stable = jnp.asarray(stable_idx)
    half = crop_size // 2
    t, h, w = frames.shape

    def per_frame_coords(lms):
        m = umeyama(lms[stable], mean_face[stable])
        mouth = transform_points(lms[48:68], m)
        center = jnp.mean(mouth, axis=0)
        cx = jnp.clip(center[0], half, out_size - half).astype(jnp.int32)
        cy = jnp.clip(center[1], half, out_size - half).astype(jnp.int32)
        inv = invert_similarity(m)
        # separable assumption: inv[0,1] ~= inv[1,0] ~= 0 (no rotation)
        xs = (jnp.arange(crop_size, dtype=jnp.float32) + (cx - half)) * inv[0, 0] + inv[0, 2]
        ys = (jnp.arange(crop_size, dtype=jnp.float32) + (cy - half)) * inv[1, 1] + inv[1, 2]
        return xs, ys

    xs, ys = jax.vmap(per_frame_coords)(landmarks)  # [T, crop] each

    def interp_matrix(coords, n):
        # [T, crop, n] banded bilinear weights: W[t, i, k] = max(0, 1-|c-k|)
        k = jnp.arange(n, dtype=jnp.float32)
        d = jnp.abs(coords[:, :, None] - k[None, None, :])
        wgt = jnp.maximum(0.0, 1.0 - d)
        # zero outside the source (matches the gather kernel's zero fill)
        valid = (coords >= 0) & (coords <= n - 1)
        return wgt * valid[:, :, None]

    wx = interp_matrix(xs, w)  # [T, crop, W]
    wy = interp_matrix(ys, h)  # [T, crop, H]
    f = frames.astype(jnp.float32)
    tmp = jnp.einsum("tch,thw->tcw", wy, f, preferred_element_type=jnp.float32)
    return jnp.einsum("tcw,tdw->tcd", tmp, wx, preferred_element_type=jnp.float32)


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

"""Template tracking via normalized cross-correlation, on device.

Refines the clip-level mouth estimate of the motion detector into a TRUE
per-frame track: a template patch around the detected mouth is correlated
(conv on the MXU) against a search window in every frame, scanned
sequentially so the search window follows the target. This replaces the
role dlib's per-frame landmark regression plays in the reference pipeline
(utils/lips_cropping.py) with a model-free tracker that runs as one jit
program per clip.

NCC = <w - mean(w), t - mean(t)> / (||w - mean(w)|| * ||t - mean(t)||),
computed for every offset via three convolutions (raw correlation, local
sum, local sum of squares).
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np


def _corr2d(window: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """VALID 2-D cross-correlation: [H,W] x [h,w] -> [H-h+1, W-w+1]."""
    return jax.lax.conv_general_dilated(
        window[None, None],
        kernel[None, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )[0, 0]


def ncc_scores(window: jnp.ndarray, template: jnp.ndarray) -> jnp.ndarray:
    """NCC of ``template`` at every valid offset inside ``window``."""
    window = window.astype(jnp.float32)
    t = template.astype(jnp.float32)
    th, tw = t.shape
    n = th * tw
    t_zero = t - jnp.mean(t)
    t_norm = jnp.sqrt(jnp.maximum(jnp.sum(t_zero * t_zero), 1e-6))

    raw = _corr2d(window, t_zero)  # <w, t0> = <w0, t0> since sum(t0)=0
    ones = jnp.ones_like(t)
    local_sum = _corr2d(window, ones)
    local_sq = _corr2d(window * window, ones)
    local_var = jnp.maximum(local_sq - local_sum * local_sum / n, 1e-6)
    return raw / (jnp.sqrt(local_var) * t_norm)


@functools.partial(jax.jit, static_argnames=("template_size", "search"))
def ncc_track_clip(
    frames: jnp.ndarray,  # [T, H, W]
    init_pos: jnp.ndarray,  # (x, y) center in frame coords
    template_size: int = 48,
    search: int = 24,
) -> jnp.ndarray:
    """Track the patch centered at ``init_pos`` through the clip.

    The template is cut from frame 0 at ``init_pos`` and kept fixed
    (drift-free); each subsequent frame is searched within ``±search`` px
    of the previous position. Returns [T, 2] (x, y) centers.
    Equivalent to :func:`ncc_track_clip_anchored` with ``anchor=0``."""
    return ncc_track_clip_anchored(
        frames, init_pos, 0, template_size=template_size, search=search
    )


def ncc_track_batch(
    clips: jnp.ndarray,  # [B, T, H, W]
    init_pos: jnp.ndarray,  # [B, 2]
    template_size: int = 48,
    search: int = 24,
) -> jnp.ndarray:
    """vmapped tracker: [B, T, 2] positions for a clip batch."""
    return jax.vmap(
        lambda f, p: ncc_track_clip(f, p, template_size=template_size, search=search)
    )(clips, init_pos)


@functools.partial(
    jax.jit, static_argnames=("anchor", "template_size", "search")
)
def ncc_track_clip_anchored(
    frames: jnp.ndarray,  # [T, H, W]
    anchor_pos: jnp.ndarray,  # (x, y) center at the anchor frame
    anchor: int,
    template_size: int = 48,
    search: int = 24,
) -> jnp.ndarray:
    """Bidirectional fixed-template tracking from a mid-clip anchor.

    Clip-level position estimates are most reliable at the temporal
    middle (motion/texture statistics have full context there), while
    speakers often move fastest near clip boundaries. The template is cut
    at frame ``anchor`` and tracked BACKWARD to frame 0 and FORWARD to
    the end — the device twin of data.landmarks.AnchorTrackDetector
    (golden-validated against the reference's dlib crops).
    Returns [T, 2] (x, y) centers.
    """
    t_len, h, w = frames.shape
    ts = template_size
    half = ts // 2
    frames = frames.astype(jnp.float32)

    # clamp positions by the template half only (a half+search clamp
    # biased near-edge mouths by up to `search` px, unlike the host twin
    # AnchorTrackDetector); the search-window ORIGIN is clamped into the
    # frame independently and offsets map back through it
    def clamp(p):
        x = jnp.clip(p[0], half, w - half - 1)
        y = jnp.clip(p[1], half, h - half - 1)
        return jnp.stack([x, y])

    p0 = clamp(anchor_pos.astype(jnp.float32))
    x0 = (p0[0] - half).astype(jnp.int32)
    y0 = (p0[1] - half).astype(jnp.int32)
    template = jax.lax.dynamic_slice(frames[anchor], (y0, x0), (ts, ts))

    win = ts + 2 * search

    def step(pos, frame):
        pos = clamp(pos)
        wx = jnp.clip((pos[0] - half - search).astype(jnp.int32), 0, w - win)
        wy = jnp.clip((pos[1] - half - search).astype(jnp.int32), 0, h - win)
        window = jax.lax.dynamic_slice(frame, (wy, wx), (win, win))
        scores = ncc_scores(window, template)
        flat = jnp.argmax(scores)
        cy = wy.astype(jnp.float32) + half + (flat // scores.shape[1]).astype(jnp.float32)
        cx = wx.astype(jnp.float32) + half + (flat % scores.shape[1]).astype(jnp.float32)
        new = clamp(jnp.stack([cx, cy]))
        return new, new

    _, fwd = jax.lax.scan(step, p0, frames[anchor:])
    _, bwd = jax.lax.scan(step, p0, frames[:anchor], reverse=True)
    return jnp.concatenate([bwd, fwd], axis=0)


def ncc_track_batch_anchored(
    clips: jnp.ndarray,  # [B, T, H, W]
    anchor_pos: jnp.ndarray,  # [B, 2]
    anchor: int,
    template_size: int = 48,
    search: int = 24,
) -> jnp.ndarray:
    """vmapped anchored tracker: [B, T, 2] positions."""
    return jax.vmap(
        lambda f, p: ncc_track_clip_anchored(
            f, p, anchor, template_size=template_size, search=search
        )
    )(clips, anchor_pos)


@functools.partial(
    jax.jit, static_argnames=("anchor", "template_size", "search")
)
def ncc_track_clip_parallel(
    frames: jnp.ndarray,  # [T, H, W]
    anchor_pos: jnp.ndarray,  # (x, y) center at the anchor frame
    anchor: int,
    template_size: int = 48,
    search: int = 80,
) -> jnp.ndarray:
    """Scan-free anchored tracking: every frame matched INDEPENDENTLY.

    The sequential tracker (:func:`ncc_track_clip_anchored`) hits the
    tunneled backend's pathological-compile class (dynamic-slice windows
    inside ``lax.scan``, measured 30 s-7 min). This formulation removes
    the sequential dependency entirely: ONE static search window around
    the anchor position — sized to cover the whole clip's motion
    (``search`` is the max total excursion, not per-frame) — is sliced
    from every frame at the same coordinates, and the fixed anchor
    template is NCC-matched against all T windows as one batched conv
    (three convolutions total on the MXU: raw correlation, local sum,
    local sum of squares). No scan, no per-step dynamic slices.

    Per-frame independence trades the moving search window for a larger
    static one; temporal coherence is restored downstream by the
    trajectory smoothing every caller already applies (the host golden
    comparison in tests/test_batched_detector.py covers both trackers).
    Returns [T, 2] (x, y) centers.
    """
    t_len, h, w = frames.shape
    ts = template_size
    half = ts // 2
    # shrink the static search radius so the window fits the frame
    search = min(search, (min(h, w) - ts - 2) // 2)
    frames = frames.astype(jnp.float32)

    # clamp the TEMPLATE by its own half-size only — clamping it by
    # half+search shifted the template up to `search` px off a near-edge
    # mouth (the host twin AnchorTrackDetector clamps by half only). The
    # WINDOW origin is clamped into the frame independently; the window
    # may sit asymmetrically around the template near edges, so score
    # offsets map back via the actual window origin.
    px = jnp.clip(anchor_pos[0], half, w - half - 1)
    py = jnp.clip(anchor_pos[1], half, h - half - 1)
    x0 = (px - half).astype(jnp.int32)
    y0 = (py - half).astype(jnp.int32)
    template = jax.lax.dynamic_slice(frames[anchor], (y0, x0), (ts, ts))
    t_zero = template - jnp.mean(template)
    t_norm = jnp.sqrt(jnp.maximum(jnp.sum(t_zero * t_zero), 1e-6))

    win = ts + 2 * search
    wx = jnp.clip((px - half - search).astype(jnp.int32), 0, w - win)
    wy = jnp.clip((py - half - search).astype(jnp.int32), 0, h - win)
    windows = jax.lax.dynamic_slice(frames, (0, wy, wx), (t_len, win, win))

    def corr(x, k):  # [T, H, W] x [h, w] -> [T, H-h+1, W-w+1]
        return jax.lax.conv_general_dilated(
            x[:, None], k[None, None], window_strides=(1, 1),
            padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )[:, 0]

    n = ts * ts
    raw = corr(windows, t_zero)
    ones = jnp.ones_like(template)
    local_sum = corr(windows, ones)
    local_sq = corr(windows * windows, ones)
    local_var = jnp.maximum(local_sq - local_sum * local_sum / n, 1e-6)
    scores = raw / (jnp.sqrt(local_var) * t_norm)  # [T, S, S]

    s = scores.shape[-1]
    flat = jnp.argmax(scores.reshape(t_len, -1), axis=-1)
    # offset index 0 corresponds to a template placed at the window
    # origin: center = origin + half + index (window may be asymmetric
    # around the clamped template near frame edges)
    cy = wy.astype(jnp.float32) + half + (flat // s).astype(jnp.float32)
    cx = wx.astype(jnp.float32) + half + (flat % s).astype(jnp.float32)
    return jnp.stack([cx, cy], axis=-1)


def ncc_track_batch_parallel(
    clips: jnp.ndarray,  # [B, T, H, W]
    anchor_pos: jnp.ndarray,  # [B, 2]
    anchor: int,
    template_size: int = 48,
    search: int = 80,
) -> jnp.ndarray:
    """vmapped scan-free tracker: [B, T, 2] positions."""
    return jax.vmap(
        lambda f, p: ncc_track_clip_parallel(
            f, p, anchor, template_size=template_size, search=search
        )
    )(clips, anchor_pos)

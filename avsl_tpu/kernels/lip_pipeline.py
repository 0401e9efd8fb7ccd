"""Fully fused on-device lip-ROI frontend.

One XLA program per clip batch: motion/articulation detection maps, scalar
face/mouth detection, landmark-trajectory synthesis (the device twin of the
host logic in avsl_tpu.data.landmarks.BatchedMotionDetector.__call__ +
lip_roi.landmarks_interpolate + lip_roi.smooth_landmarks), and the separable
similarity warp to 96x96 mouth crops.

Replaces the reference's hottest loop (per-frame dlib detect + skimage warp,
/root/reference/preprocess/video_process.py:305-490) AND round 1's remaining
host stages: the only host<->device traffic is one uint8 clip upload in and
the crops (or downstream tokens) out. No d2h round-trip for landmarks.

Key identity that makes the device port small: the synthesized landmarks are
an affine image of the canonical layout,

    lms[t] = s * (canon - canon_mouth_center) + mouth_traj[t],   s = face_w/156

so interpolation/smoothing of the 68-point field reduces to interpolation/
smoothing of the 2-D mouth trajectory.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

# canonical face box inside the 300x300 layout (landmarks.canonical_landmarks_from_box)
_CANON_X0, _CANON_Y0, _CANON_W, _CANON_H = 72.0, 100.0, 156.0, 170.0


def canonical_mean_face(size: int = 300):
    """Late import of data.lip_roi.canonical_mean_face: a module-level
    import here would close an import cycle (data.lip_roi imports
    kernels.warp, whose package __init__ imports this module) and crash
    any process that imports the data package first."""
    from avsl_tpu.data.lip_roi import canonical_mean_face as _cmf

    return _cmf(size)


def masked_time_interp(values, valid, centers, t: int):
    """Linear interpolation of sparse window estimates onto a length-``t`` grid.

    ``values`` [NW, D] estimates, ``valid`` [NW] bool, ``centers`` [NW] int32
    frame indices (static or traced). Device twin of
    lip_roi.landmarks_interpolate: linear between consecutive valid
    estimates, edge fill outside. Assumes at least one valid entry (callers
    mask the no-detection case separately). Returns [t, D].
    """
    import jax.numpy as jnp
    from jax import lax

    d = values.shape[-1]
    grid_val = jnp.zeros((t, d), values.dtype)
    grid_has = jnp.zeros((t,), bool)
    safe_vals = jnp.where(valid[:, None], values, 0.0)
    grid_val = grid_val.at[centers].add(safe_vals)
    grid_has = grid_has.at[centers].max(valid)
    # duplicate centers (clamped at t-1) would double-count: renormalize
    counts = jnp.zeros((t,), jnp.float32).at[centers].add(valid.astype(jnp.float32))
    grid_val = grid_val / jnp.maximum(counts, 1.0)[:, None]

    idx = jnp.arange(t)
    ff = lax.cummax(jnp.where(grid_has, idx, -1))          # prev valid index
    bf = lax.cummin(jnp.where(grid_has, idx, t), reverse=True)  # next valid index
    prev = jnp.where(ff >= 0, ff, bf)
    nxt = jnp.where(bf < t, bf, ff)
    prev = jnp.clip(prev, 0, t - 1)
    nxt = jnp.clip(nxt, 0, t - 1)
    span = jnp.maximum(nxt - prev, 1)
    w = jnp.clip((idx - prev) / span, 0.0, 1.0)
    return (1.0 - w)[:, None] * grid_val[prev] + w[:, None] * grid_val[nxt]


def smooth_time(x, window: int = 12):
    """Clamped-edge sliding mean over axis 0 — device twin of
    lip_roi.smooth_landmarks ([t, ...] with a min(t, window) window)."""
    import jax.numpy as jnp

    t = x.shape[0]
    win = min(t, window)
    half = win // 2
    c = jnp.concatenate([jnp.zeros_like(x[:1]), jnp.cumsum(x, axis=0)])
    idx = jnp.arange(t)
    lo = jnp.maximum(0, idx - half)
    hi = jnp.minimum(t, idx + half + 1)
    shape = (-1,) + (1,) * (x.ndim - 1)
    return (c[hi] - c[lo]) / (hi - lo).astype(x.dtype).reshape(shape)


def synthesize_traj(
    clip_det,  # [4]  (mouth_x, mouth_y, face_w, ok) in detection coords
    win_det,   # [NW, 4] per-window detections
    t: int,
    window: int = 25,
    detect_ds: int = 1,
    smoothing_window: int = 12,
):
    """Device twin of BatchedMotionDetector.__call__ (no-track branch) +
    interpolation + smoothing for ONE clip, in trajectory form.

    Returns ``(traj [t, 2], face_w scalar, ok scalar bool)`` in
    full-resolution coordinates: the smoothed mouth-center trajectory,
    the face width, and whether clip-level detection succeeded.
    Detection failure (ok=False) falls back to the canonical layout. The full
    68-point field is an affine image of the canonical layout
    (module docstring identity), so ``(traj, face_w)`` carries all the
    information — consumers that need explicit landmarks expand via
    :func:`synthesize_landmarks`, and the separable warp's sampling
    coordinates follow in closed form via ``coords_from_traj`` (see
    :func:`make_staged_lip_frontend`) with no least-squares fit at all.
    """
    import jax.numpy as jnp

    canon = jnp.asarray(canonical_mean_face(300), jnp.float32)  # [68, 2]
    canon_mouth = jnp.mean(canon[48:68], axis=0)                # ~(150, 218)

    nw = win_det.shape[0]
    clip_ok = clip_det[3] >= 0.5
    face_w_det = clip_det[2]

    valid = win_det[:, 3] >= 0.5
    mouths = win_det[:, :2]  # detection coords
    med = jnp.nanmedian(jnp.where(valid[:, None], mouths, jnp.nan), axis=0)
    med = jnp.where(jnp.isfinite(med), med, clip_det[:2])
    max_dev = jnp.array([0.30, 0.12], jnp.float32) * face_w_det
    clamped = med + jnp.clip(0.7 * (mouths - med), -max_dev, max_dev)

    centers = jnp.minimum(jnp.arange(nw) * window + window // 2, t - 1)
    traj = masked_time_interp(clamped, valid, centers, t)  # [t, 2]
    traj = jnp.where(jnp.any(valid), traj, clip_det[None, :2])

    # to full-res coords; detection-failure fallback = canonical layout
    traj = jnp.where(clip_ok, traj * detect_ds, canon_mouth[None])
    face_w = jnp.where(clip_ok, face_w_det * detect_ds, _CANON_W)

    traj = smooth_time(traj, smoothing_window)
    return traj, face_w, clip_ok


def synthesize_landmarks(
    clip_det,
    win_det,
    t: int,
    window: int = 25,
    detect_ds: int = 1,
    smoothing_window: int = 12,
):
    """Landmarks [t, 68, 2] for ONE clip — :func:`synthesize_traj`
    expanded through the affine identity ``lms[t] = s*(canon - cm) +
    traj[t]``."""
    import jax.numpy as jnp

    canon = jnp.asarray(canonical_mean_face(300), jnp.float32)
    canon_mouth = jnp.mean(canon[48:68], axis=0)
    traj, face_w, _ok = synthesize_traj(
        clip_det, win_det, t, window=window, detect_ds=detect_ds,
        smoothing_window=smoothing_window,
    )
    s = face_w / _CANON_W
    return s * (canon - canon_mouth)[None] + traj[:, None, :]


def make_lip_frontend(
    t: int,
    window: int = 25,
    detect_ds: int = 2,
    crop_size: int = 96,
    out_size: int = 300,
    smoothing_window: int = 12,
    roi: int | None = 144,
    detector_kw: dict | None = None,
):
    """Build the fused clips->crops function (jit-compatible, vmapped over B).

    clips_u8 [B, t, H, W] uint8 -> lip crops [B, t, crop, crop] float32
    (0..255 scale). Everything runs on device in ONE program.

    .. warning:: on tunneled TPU runtimes prefer
       :func:`make_staged_lip_frontend` — this fused program's XLA:TPU
       compile is pathological (minutes) and degrades the session's
       transfers; the staged chain computes the identical result with
       1-15 s compiles. The fused form is fine on CPU and for tests.

    ``roi``: side of the mouth region dynamically sliced (on device) around
    the clip-median mouth center before warping — bounds the warp working
    set to [B, t, roi, roi] instead of full frames (same trick round 1 did
    on the host, now without the host round-trip). None warps full frames.
    """
    import jax
    import jax.numpy as jnp

    from avsl_tpu.data.landmarks import (
        MotionEnergyDetector,
        _device_detect_fn,
        _device_maps_fn,
    )
    from avsl_tpu.kernels.warp import warp_and_crop_clip_separable

    base = MotionEnergyDetector(**(detector_kw or {}))
    compute_maps = _device_maps_fn(window, base.blur, base.max_diff_frames)
    detect = _device_detect_fn(
        base.keep_mass, base.center_sigma, base.min_box, base.close_k
    )
    mean_face = jnp.asarray(canonical_mean_face(out_size), jnp.float32)

    def roi_slice_one(frames, lms):
        # per-clip mouth ROI window (array-level ops only — safe under vmap)
        h, w = frames.shape[-2:]
        mouth = jnp.mean(lms[:, 48:68], axis=1)         # [t, 2]
        cx, cy = jnp.median(mouth[:, 0]), jnp.median(mouth[:, 1])
        x0 = jnp.clip(cx - roi / 2, 0, w - roi).astype(jnp.int32)
        y0 = jnp.clip(cy - roi / 2, 0, h - roi).astype(jnp.int32)
        frames = jax.lax.dynamic_slice(
            frames, (jnp.int32(0), y0, x0), (frames.shape[0], roi, roi)
        )
        lms = lms - jnp.stack(
            [x0.astype(jnp.float32), y0.astype(jnp.float32)]
        )[None, None]
        return frames, lms

    def frontend(clips_u8):
        small = clips_u8[:, :, ::detect_ds, ::detect_ds].astype(jnp.float32)
        cm, ca, wm, wa = compute_maps(small)
        clip_det = jax.vmap(detect)(cm, ca)                 # [B, 4]
        win_det = jax.vmap(jax.vmap(detect))(wm, wa)        # [B, NW, 4]
        lms = jax.vmap(
            lambda c, w: synthesize_landmarks(
                c, w, t, window=window, detect_ds=detect_ds,
                smoothing_window=smoothing_window,
            )
        )(clip_det, win_det)                                # [B, t, 68, 2]
        frames = clips_u8
        if roi is not None:
            frames, lms = jax.vmap(roi_slice_one)(frames, lms)
        # the warp itself is batched array math — NO vmap (vmapping the
        # per-frame transform-estimation code compiles pathologically, see
        # kernels/warp.py module docstring)
        return warp_and_crop_clip_separable(
            frames, lms, mean_face, out_size=out_size, crop_size=crop_size
        )

    return frontend


def make_staged_lip_frontend(
    t: int,
    window: int = 25,
    detect_ds: int = 2,
    crop_size: int = 96,
    out_size: int = 300,
    smoothing_window: int = 12,
    detector_kw: dict | None = None,
):
    """The lip frontend as SEPARATELY-JITTABLE stages.

    On tunneled TPU runtimes (IFRT proxy), XLA programs whose compilation
    runs long (≳45 s) persistently throttle every subsequent host<->device
    transfer in the process (~25x, measured). The fused
    :func:`make_lip_frontend` program composes stages whose joint
    compilation blows up (minutes) even though every stage alone compiles
    in 1-11 s. This constructor returns the stages individually so callers
    can jit each one (every compile stays small, transfers stay fast);
    chaining jitted stages keeps all arrays on device.

    Returns a dict of pure functions:

    * ``subsample(clips_u8)`` -> detection stream [B, t, H/ds, W/ds] f32
    * ``landmarks(small)``    -> [B, t, 68, 2] full-res landmark tracks
    * ``crop_window(lms, h, w, roi)`` -> (x0, y0) int32 [B] host-slice
      offsets for a mouth-centered ``roi``² window (clip-median center)
    * ``shift(lms, x0, y0)``  -> landmarks rebased into ROI coordinates
    * ``coords(lms)``         -> (ys, xs) separable sampling coordinates
      (jit this SEPARATELY from ``sample`` — see warp.separable_crop_coords)
    * ``sample(frames, ys, xs)`` -> [B, t, crop, crop] f32 lip crops
      (works on full frames or host-sliced ROIs)
    * ``warp(frames, lms)``   -> both halves in one program (CPU/tests)
    """
    import jax
    import jax.numpy as jnp

    from avsl_tpu.data.landmarks import (
        MotionEnergyDetector,
        _device_detect_fn,
        _device_maps_fn,
    )
    from avsl_tpu.kernels.warp import (
        sample_separable,
        separable_crop_coords,
        warp_and_crop_clip_separable,
    )

    base = MotionEnergyDetector(**(detector_kw or {}))
    compute_maps = _device_maps_fn(window, base.blur, base.max_diff_frames)
    detect = _device_detect_fn(
        base.keep_mass, base.center_sigma, base.min_box, base.close_k
    )
    mean_face = jnp.asarray(canonical_mean_face(out_size), jnp.float32)

    def subsample(clips_u8):
        return clips_u8[:, :, ::detect_ds, ::detect_ds].astype(jnp.float32)

    def landmarks(small):
        cm, ca, wm, wa = compute_maps(small)
        clip_det = jax.vmap(detect)(cm, ca)
        win_det = jax.vmap(jax.vmap(detect))(wm, wa)
        return jax.vmap(
            lambda c, w: synthesize_landmarks(
                c, w, t, window=window, detect_ds=detect_ds,
                smoothing_window=smoothing_window,
            )
        )(clip_det, win_det)

    def traj(small):
        cm, ca, wm, wa = compute_maps(small)
        clip_det = jax.vmap(detect)(cm, ca)
        win_det = jax.vmap(jax.vmap(detect))(wm, wa)
        return jax.vmap(
            lambda c, w: synthesize_traj(
                c, w, t, window=window, detect_ds=detect_ds,
                smoothing_window=smoothing_window,
            )
        )(clip_det, win_det)                    # ([B, t, 2], [B], [B] ok)

    def track_refine(small, base_traj, face_w, det_ok):
        """Refine a detection trajectory by mid-clip-anchored
        bidirectional NCC tracking — device twin of
        data.landmarks.AnchorTrackDetector (the golden-validated
        preprocessing default). The detection trajectory seeds the
        anchor; the fixed template is then tracked to both clip ends,
        following fast early-clip speaker motion the window estimates
        smooth away.

        Jit this SEPARATELY from ``traj`` (chain the two): composed into
        one program, XLA:TPU compile explodes the same way the fused
        frontend does. Same output contract as ``traj``.

        .. note:: on the tunneled dev backend even the standalone scan-of-
           NCC program compiles in minutes (dynamic-slice windows inside
           lax.scan hit the same pathological-compile class) — measured
           2026-08-17; use this stage on directly-attached TPUs, and the
           host twin (data.landmarks.AnchorTrackDetector) for
           preprocessing elsewhere."""
        from avsl_tpu.kernels.track import ncc_track_batch_anchored

        anchor = t // 2
        anchor_pos = base_traj[:, anchor, :] / detect_ds   # small coords
        track = ncc_track_batch_anchored(
            small, anchor_pos, anchor,
            template_size=max(16, 48 // detect_ds),
            search=max(8, 24 // detect_ds),
        )                                                  # [B, t, 2]
        tracked = jax.vmap(lambda tr_: smooth_time(tr_, smoothing_window))(
            track * detect_ds
        )
        # fall back to the detection trajectory when detection failed
        ok = det_ok.astype(bool)[:, None, None]
        return jnp.where(ok, tracked, base_traj), face_w, det_ok

    def track_refine_parallel(small, base_traj, face_w, det_ok):
        """Scan-free variant of ``track_refine``: every frame matched
        independently against the anchor template inside one static
        search window as a single batched conv
        (kernels.track.ncc_track_clip_parallel) — no lax.scan, no
        per-step dynamic slices, so it avoids the tunneled backend's
        pathological-compile class the sequential tracker hits. The
        search radius covers the clip's total motion (~90 px of dlib
        mouth travel on the AMI golden clip at full res)."""
        from avsl_tpu.kernels.track import ncc_track_batch_parallel

        anchor = t // 2
        anchor_pos = base_traj[:, anchor, :] / detect_ds   # small coords
        track = ncc_track_batch_parallel(
            small, anchor_pos, anchor,
            template_size=max(16, 48 // detect_ds),
            search=max(24, 96 // detect_ds),
        )                                                  # [B, t, 2]
        tracked = jax.vmap(lambda tr_: smooth_time(tr_, smoothing_window))(
            track * detect_ds
        )
        ok = det_ok.astype(bool)[:, None, None]
        return jnp.where(ok, tracked, base_traj), face_w, det_ok

    def traj_tracked(small):
        """``track_refine(small, *traj(small))`` in one call — fine on
        CPU/tests; on TPU jit the two halves separately."""
        base_traj, face_w, det_ok = traj(small)
        return track_refine(small, base_traj, face_w, det_ok)

    # canonical-space constants for the closed-form coordinate path
    mf_np = canonical_mean_face(out_size)
    cm_x, cm_y = [float(v) for v in mf_np[48:68].mean(axis=0)]
    half = crop_size // 2
    # crop-window center in warped space is the canonical mouth center
    # (constant — the warped mouth mean is cm by construction), with the
    # same clip + int32 truncation the landmark path applies
    cx = int(np.clip(np.float32(cm_x), half, out_size - half))
    cy = int(np.clip(np.float32(cm_y), half, out_size - half))

    def coords_from_traj(traj_bt2, face_w, x0=None, y0=None):
        """Closed-form separable sampling coords from (traj, face_w).

        Synthesized landmarks are EXACTLY ``s*(canon - cm) + traj`` (see
        :func:`synthesize_traj`), for which the least-squares similarity
        fit in warp.separable_crop_coords collapses to
        ``xs[j] = s*(j + cx - half - cm_x) + traj_x`` (same for ys) —
        bit-equal to the landmark path, but pure broadcast arithmetic:
        compiles in <1 s where the general coefficient program takes
        30-50 s on this backend, and needs NO device->host landmark pull
        (d2h of computed arrays persistently throttles tunneled sessions).
        ``x0``/``y0``: optional per-clip ROI offsets ([B] arrays) when the
        frames to sample are host-sliced windows of the full frame."""
        s = (face_w / _CANON_W)[:, None, None]              # [B, 1, 1]
        j = jnp.arange(crop_size, dtype=jnp.float32)
        xs = s * (j + (cx - half) - cm_x) + traj_bt2[..., 0:1]
        ys = s * (j + (cy - half) - cm_y) + traj_bt2[..., 1:2]
        if x0 is not None:
            xs = xs - x0.astype(jnp.float32)[:, None, None]
            ys = ys - y0.astype(jnp.float32)[:, None, None]
        return ys, xs

    def traj_window(traj_bt2, h: int, w: int, roi: int):
        """Mouth-ROI window offsets from the trajectory (clip median)."""
        c = jnp.median(traj_bt2, axis=1)                    # [B, 2]
        x0 = jnp.clip(c[:, 0] - roi / 2, 0, w - roi).astype(jnp.int32)
        y0 = jnp.clip(c[:, 1] - roi / 2, 0, h - roi).astype(jnp.int32)
        return x0, y0

    def crop_window(lms, h: int, w: int, roi: int):
        mouth = jnp.mean(lms[:, :, 48:68], axis=2)          # [B, t, 2]
        c = jnp.median(mouth, axis=1)                       # [B, 2]
        x0 = jnp.clip(c[:, 0] - roi / 2, 0, w - roi).astype(jnp.int32)
        y0 = jnp.clip(c[:, 1] - roi / 2, 0, h - roi).astype(jnp.int32)
        return x0, y0

    def shift(lms, x0, y0):
        off = jnp.stack([x0.astype(jnp.float32), y0.astype(jnp.float32)], -1)
        return lms - off[:, None, None, :]

    def coords(lms):
        return separable_crop_coords(
            lms, mean_face, out_size=out_size, crop_size=crop_size
        )

    def warp(frames, lms):
        return warp_and_crop_clip_separable(
            frames, lms, mean_face, out_size=out_size, crop_size=crop_size
        )

    return {
        "subsample": subsample,
        "landmarks": landmarks,
        "traj": traj,
        "track_refine": track_refine,
        "track_refine_parallel": track_refine_parallel,
        "traj_tracked": traj_tracked,
        "coords_from_traj": coords_from_traj,
        "traj_window": traj_window,
        "crop_window": crop_window,
        "shift": shift,
        "coords": coords,
        "sample": sample_separable,
        "warp": warp,
    }

"""68-point landmark detectors (dlib replacement).

The reference depends on dlib's C++ HOG/CNN face detectors + 68-point
shape predictor (utils/lips_cropping.py:15-39,165-203 in /root/reference;
the predictor weights are stripped from the mount, and this environment
ships no pretrained detector of any kind — OpenCV 5 removed the Haar
cascades). This framework therefore makes the detector pluggable behind
:class:`LandmarkDetector` with model-free and trainable implementations:

* :class:`EnergyBoxDetector` — model-free face-box estimate from a
  center-weighted gradient-energy profile (AMI closeup footage frames the
  speaker centrally; the face is the dominant textured region), tracked
  across frames by local template matching of the gradient map. Landmarks
  are the parametric canonical layout scaled into the box.
* :class:`CNNLandmarkDetector` — a small flax conv regressor
  (128x128 gray -> 68x2 normalized coords) that batches a whole clip in
  one jit call on TPU; weights loadable via ``load_params`` (train with
  train/; random-initialized otherwise).
* :class:`PrecomputedLandmarks` — serve landmarks from arrays/files, for
  bit-parity runs against an existing landmark pipeline.

All detectors return, per frame, a [68, 2] float (x, y) array or None
(detection failure) — the contract consumed by
avsl_tpu.data.lip_roi.extract_lip_clip.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from avsl_tpu.data.lip_roi import canonical_mean_face


class LandmarkDetector:
    # True when the detector's output is a rigid affine image of the
    # PARAMETRIC canonical layout (canonical_mean_face) rather than real
    # per-point detections. Consumers warping against a DIFFERENT mean
    # face must relayout such output first (lip_roi.relayout_landmarks)
    # or the stable-point fit picks up a systematic crop scale/offset.
    synthesizes_parametric_layout = False

    def __call__(self, frames: np.ndarray) -> List[Optional[np.ndarray]]:
        """frames [T, H, W] grayscale uint8 -> per-frame [68,2] or None."""
        raise NotImplementedError


def canonical_landmarks_from_box(
    x: float, y: float, w: float, h: float
) -> np.ndarray:
    """Scale the canonical 68-point layout into a face box.

    The canonical face occupies roughly x in [72, 228], y in [100, 270] of
    its 300x300 frame; map that span onto the detected box."""
    canon = canonical_mean_face(300).astype(np.float64)
    cx0, cy0, cw, ch = 72.0, 100.0, 156.0, 170.0
    out = np.empty_like(canon)
    out[:, 0] = (canon[:, 0] - cx0) / cw * w + x
    out[:, 1] = (canon[:, 1] - cy0) / ch * h + y
    return out.astype(np.float32)


def _gradient_energy(frame: np.ndarray) -> np.ndarray:
    f = frame.astype(np.float32)
    gx = np.abs(np.diff(f, axis=1, prepend=f[:, :1]))
    gy = np.abs(np.diff(f, axis=0, prepend=f[:1]))
    return gx + gy


def _box_from_energy(
    energy: np.ndarray, center_sigma: float = 0.35, keep_mass: float = 0.80
) -> tuple:
    """Face box from center-weighted gradient energy marginals.

    Weights the energy by a Gaussian centered on the frame (closeup prior),
    then takes the tightest row/col spans holding ``keep_mass`` of the
    weighted energy."""
    h, w = energy.shape
    wy = np.exp(-0.5 * ((np.arange(h) - h / 2) / (center_sigma * h)) ** 2)
    wx = np.exp(-0.5 * ((np.arange(w) - w / 2) / (center_sigma * w)) ** 2)
    weighted = energy * wy[:, None] * wx[None, :]

    def span(profile: np.ndarray) -> tuple:
        total = profile.sum()
        if total <= 0:
            return 0, len(profile)
        target = (1.0 - keep_mass) / 2.0 * total
        c = np.cumsum(profile)
        lo = int(np.searchsorted(c, target))
        hi = int(np.searchsorted(c, total - target))
        return lo, max(hi, lo + 1)

    y0, y1 = span(weighted.sum(axis=1))
    x0, x1 = span(weighted.sum(axis=0))
    return x0, y0, x1 - x0, y1 - y0


class EnergyBoxDetector(LandmarkDetector):
    """Model-free center-prior face box + canonical landmark layout.

    ``every_n`` subsamples detection (intermediate frames are filled by
    landmark interpolation downstream), matching how the reference thins
    dlib calls on long clips."""

    synthesizes_parametric_layout = True

    def __init__(self, every_n: int = 1, center_sigma: float = 0.35,
                 keep_mass: float = 0.80, min_box: int = 24):
        self.every_n = max(every_n, 1)
        self.center_sigma = center_sigma
        self.keep_mass = keep_mass
        self.min_box = min_box

    def detect_face(self, frame: np.ndarray) -> Optional[tuple]:
        energy = _gradient_energy(frame)
        x, y, w, h = _box_from_energy(energy, self.center_sigma, self.keep_mass)
        if w < self.min_box or h < self.min_box:
            return None
        # squarish box: expand the shorter side about its center
        side = max(w, h)
        cx, cy = x + w / 2, y + h / 2
        H, W = frame.shape
        side = min(side, min(H, W))
        x = float(np.clip(cx - side / 2, 0, W - side))
        y = float(np.clip(cy - side / 2, 0, H - side))
        return x, y, float(side), float(side)

    def __call__(self, frames: np.ndarray) -> List[Optional[np.ndarray]]:
        out: List[Optional[np.ndarray]] = []
        for i, frame in enumerate(frames):
            if i % self.every_n:
                out.append(None)
                continue
            box = self.detect_face(np.asarray(frame))
            out.append(None if box is None else canonical_landmarks_from_box(*box))
        return out


def _box_blur(img: np.ndarray, k: int = 9) -> np.ndarray:
    """Separable box blur via cumulative sums (no cv2 dependency)."""
    if k <= 1:
        return img
    pad = k // 2
    out = np.pad(img, ((pad, pad), (pad, pad)), mode="edge").astype(np.float32)

    def smooth_axis0(a):
        c = np.cumsum(a, axis=0)
        c = np.concatenate([np.zeros_like(c[:1]), c], axis=0)
        return (c[k:] - c[:-k]) / k

    out = smooth_axis0(out)
    out = smooth_axis0(out.T).T
    return out


class MotionEnergyDetector(LandmarkDetector):
    """Clip-level face/mouth localization from temporal motion energy.

    Two observations make this model-free detector work on conversational
    closeup footage: (1) the speaker is the only thing moving, so the
    per-pixel mean |frame difference| over the clip segments the head from
    the background; (2) while speaking, the mouth region has the highest
    motion energy within the head. The detector estimates one head box +
    mouth center for the whole clip and emits canonical landmarks
    translated so their mouth matches the detected mouth center — giving a
    stable, mouth-centered 96x96 crop downstream.
    """

    synthesizes_parametric_layout = True

    def __init__(self, keep_mass: float = 0.85, blur: int = 11,
                 center_sigma: float = 0.5, min_box: int = 24,
                 max_diff_frames: int = 64, close_k: int = 25):
        self.keep_mass = keep_mass
        self.blur = blur
        self.center_sigma = center_sigma
        self.min_box = min_box
        self.max_diff_frames = max_diff_frames
        self.close_k = close_k  # morphological-closing kernel (scale with frame size)

    def motion_map(self, frames: np.ndarray) -> np.ndarray:
        t = len(frames)
        if t < 2:
            return _gradient_energy(frames[0])
        step = max(1, t // self.max_diff_frames)
        f = frames[::step].astype(np.float32, copy=False)
        return _box_blur(np.abs(np.diff(f, axis=0)).mean(axis=0), self.blur)

    def articulation_map(self, frames: np.ndarray) -> np.ndarray:
        """Fast-to-slow temporal-motion ratio: speech articulation (mouth,
        ~5-12 Hz) lights up; head sway and cast shadows (slow) cancel out."""
        f = frames.astype(np.float32, copy=False)
        if len(f) < 8:
            return self.motion_map(frames)
        fast = np.abs(np.diff(f, axis=0)).mean(axis=0)
        lag = min(6, len(f) - 1)
        slow = np.abs(f[lag:] - f[:-lag]).mean(axis=0) / lag
        return _box_blur(fast, self.blur) / (_box_blur(slow, self.blur) + 0.05)

    def detect_clip(self, frames: np.ndarray):
        """Compute maps (numpy) then run the scalar logic."""
        if len(frames) < 2:
            return None
        # one uint8->float conversion shared by both maps (copy=False
        # above makes the per-map astype a no-op on float input)
        frames = np.asarray(frames).astype(np.float32, copy=False)
        return self.detect_from_maps(
            self.motion_map(frames), self.articulation_map(frames)
        )

    def detect_from_maps(self, motion_map: np.ndarray, artic_map: np.ndarray):
        """Host-side scalar logic over precomputed dense maps (the maps may
        come from numpy or from the batched TPU path below)."""
        h, w = motion_map.shape
        # mild center prior to suppress border flicker
        wy = np.exp(-0.5 * ((np.arange(h) - h / 2) / (self.center_sigma * h)) ** 2)
        wx = np.exp(-0.5 * ((np.arange(w) - w / 2) / (self.center_sigma * w)) ** 2)
        mw = motion_map * wy[:, None] * wx[None, :]

        # moving-blob silhouette (threshold at a fraction of the peak, then
        # morphological closing via blur so the head is one solid region)
        thresh = (1.0 - self.keep_mass) * mw.max()
        mask = _box_blur((mw > thresh).astype(np.float32), self.close_k) > 0.5
        ys, xs = np.nonzero(mask)
        if len(xs) == 0:
            return None
        x0, x1 = int(xs.min()), int(xs.max()) + 1
        y0, y1 = int(ys.min()), int(ys.max()) + 1
        if (x1 - x0) < self.min_box or (y1 - y0) < self.min_box:
            return None

        # head size from silhouette widths: first rows with substantial
        # width belong to the crown; head width = median width there
        widths = mask.sum(axis=1).astype(np.float32)
        head_rows = np.nonzero(widths > 0.4 * widths.max())[0]
        y_head = int(head_rows.min())
        span = max(int(0.35 * (y1 - y_head)), 10)
        face_w = float(np.median(widths[y_head : y_head + span]))
        face_w = float(np.clip(face_w, self.min_box, x1 - x0))

        # mouth = energy centroid of the articulation (fast/slow) map inside
        # the head region, one head-width below the crown
        art = artic_map * mask
        lo_y = int(y_head + 0.55 * face_w)
        hi_y = min(int(y_head + 1.35 * face_w), h)
        sub = art[lo_y:hi_y]
        if sub.size == 0 or sub.max() <= 0:
            return None
        top = sub >= np.percentile(sub[sub > 0], 90) if (sub > 0).any() else sub > 0
        sy, sx = np.nonzero(top)
        weights = sub[sy, sx]
        mouth = (
            float(np.average(sx, weights=weights)),
            float(lo_y + np.average(sy, weights=weights)),
        )
        return (x0, y0, x1 - x0, y1 - y0), mouth, face_w

    def _landmarks_for(self, mouth, face_w) -> np.ndarray:
        # canonical layout scaled to the measured face width, anchored so
        # its mouth center sits on the detected mouth
        lms = canonical_landmarks_from_box(0, 0, face_w, face_w * 170.0 / 156.0)
        shift = np.asarray(mouth, np.float32) - lms[48:68].mean(axis=0)
        return lms + shift

    def __call__(
        self, frames: np.ndarray, window: int = 25
    ) -> List[Optional[np.ndarray]]:
        """Detect per ~1 s window (the head moves through a clip); the
        window-center landmarks are interpolated downstream."""
        frames = np.asarray(frames)
        t = len(frames)
        out: List[Optional[np.ndarray]] = [None] * t

        # whole-clip estimate anchors the scale and the median mouth
        clip_det = self.detect_clip(frames)
        if clip_det is None:
            return out
        _box, clip_mouth, clip_face_w = clip_det

        # per-window mouth estimates, regularized toward the clip estimate:
        # the face scale is fixed (median), window mouths are clamped to a
        # plausible radius so one bad window cannot yank the crop away
        est = []  # (center_index, mouth)
        for start in range(0, t, window):
            chunk = frames[start : min(start + window, t)]
            det = self.detect_clip(chunk) if len(chunk) >= 12 else None
            if det is None:
                continue
            est.append((start + len(chunk) // 2, np.asarray(det[1], np.float32)))
        if est:
            mouths = np.stack([m for _, m in est])
            med = np.median(mouths, axis=0)
            # heads turn horizontally much more than they bob vertically
            max_dev = np.array([0.30, 0.12], np.float32) * clip_face_w
            for (idx, m) in est:
                clamped = med + np.clip(0.7 * (m - med), -max_dev, max_dev)
                out[idx] = self._landmarks_for(clamped, clip_face_w)
        else:
            lms = self._landmarks_for(clip_mouth, clip_face_w)
            out = [lms.copy() for _ in range(t)]
        return out



def _box_blur_jnp(x, k):
    """Edge-padded cumulative-sum box blur over the last two axes (the jnp
    twin of :func:`_box_blur`); shared by the device map and detect fns."""
    import jax.numpy as jnp

    pad = k // 2

    def smooth(a, axis):
        a = jnp.moveaxis(a, axis, -1)
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(pad, pad)], mode="edge")
        c = jnp.cumsum(a, axis=-1)
        c = jnp.pad(c, [(0, 0)] * (a.ndim - 1) + [(1, 0)])
        out = (c[..., k:] - c[..., :-k]) / k
        return jnp.moveaxis(out, -1, axis)

    return smooth(smooth(x, -2), -1)


def _device_maps_fn(window: int, blur: int, max_diff_frames: int):
    """Build a jitted function computing all detection maps on device.

    clips [B, T, H, W] float32 ->
      (clip_motion [B,H,W], clip_artic [B,H,W],
       win_motion [B,NW,H,W], win_artic [B,NW,H,W])
    Identical math to the numpy maps (incl. edge-padded cumsum box blur),
    but one XLA program for the whole batch — the host only runs the tiny
    scalar logic on the resulting maps.
    """
    import functools

    import jax
    import jax.numpy as jnp

    def maps_of(f):  # f: [..., t, H, W]
        t = f.shape[-3]
        step = max(1, t // max_diff_frames)
        sub = f[..., ::step, :, :]
        motion = _box_blur_jnp(jnp.abs(jnp.diff(sub, axis=-3)).mean(axis=-3), blur)
        fast = jnp.abs(jnp.diff(f, axis=-3)).mean(axis=-3)
        lag = min(6, t - 1)
        slow = jnp.abs(f[..., lag:, :, :] - f[..., :-lag, :, :]).mean(axis=-3) / lag
        artic = _box_blur_jnp(fast, blur) / (_box_blur_jnp(slow, blur) + 0.05)
        return motion, artic

    @jax.jit
    def compute(clips):
        clips = clips.astype(jnp.float32)
        b, t, h, w = clips.shape
        clip_motion, clip_artic = maps_of(clips)
        nw = t // window
        if nw >= 1:
            wins = clips[:, : nw * window].reshape(b, nw, window, h, w)
            win_motion, win_artic = maps_of(wins)
        else:
            win_motion = clip_motion[:, None]
            win_artic = clip_artic[:, None]
        return clip_motion, clip_artic, win_motion, win_artic

    return compute


def _device_detect_fn(keep_mass: float, center_sigma: float, min_box: int, close_k: int = 25):
    """Jitted translation of MotionEnergyDetector.detect_from_maps.

    Takes (motion_map, artic_map) [H, W] and returns
    (mouth_x, mouth_y, face_w, ok) — all computed on device with static
    shapes (nan-quantiles and boolean reductions replace the numpy
    percentile/nonzero logic), so the host pulls back 4 floats instead of
    dense maps (d2h is the slow direction on this link and also stalls
    the next h2d transfer).
    """
    import jax
    import jax.numpy as jnp

    def detect(motion_map, artic_map):
        h, w = motion_map.shape
        wy = jnp.exp(-0.5 * ((jnp.arange(h) - h / 2) / (center_sigma * h)) ** 2)
        wx = jnp.exp(-0.5 * ((jnp.arange(w) - w / 2) / (center_sigma * w)) ** 2)
        mw = motion_map * wy[:, None] * wx[None, :]

        thresh = (1.0 - keep_mass) * jnp.max(mw)
        mask = _box_blur_jnp((mw > thresh).astype(jnp.float32), close_k) > 0.5

        rows_any = jnp.any(mask, axis=1)
        cols_any = jnp.any(mask, axis=0)
        row_ids = jnp.arange(h)
        col_ids = jnp.arange(w)
        y0 = jnp.min(jnp.where(rows_any, row_ids, h))
        y1 = jnp.max(jnp.where(rows_any, row_ids, -1)) + 1
        x0 = jnp.min(jnp.where(cols_any, col_ids, w))
        x1 = jnp.max(jnp.where(cols_any, col_ids, -1)) + 1
        ok = jnp.any(mask) & ((x1 - x0) >= min_box) & ((y1 - y0) >= min_box)

        widths = jnp.sum(mask, axis=1).astype(jnp.float32)
        head_rows = widths > 0.4 * jnp.max(widths)
        y_head = jnp.min(jnp.where(head_rows, row_ids, h))
        span = jnp.maximum((0.35 * (y1 - y_head)).astype(jnp.int32), 10)
        in_span = (row_ids >= y_head) & (row_ids < y_head + span)
        face_w = jnp.nanmedian(jnp.where(in_span, widths, jnp.nan))
        face_w = jnp.clip(face_w, min_box, jnp.maximum(x1 - x0, min_box))

        lo_y = y_head + 0.55 * face_w
        hi_y = jnp.minimum(y_head + 1.35 * face_w, h)
        row_band = (row_ids >= lo_y) & (row_ids < hi_y)
        sub = artic_map * mask * row_band[:, None]
        pos = sub > 0
        q90 = jnp.nanquantile(jnp.where(pos, sub, jnp.nan), 0.9)
        top = jnp.where(sub >= q90, sub, 0.0)
        total = jnp.sum(top)
        yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        mouth_x = jnp.sum(top * xx) / jnp.maximum(total, 1e-6)
        mouth_y = jnp.sum(top * yy) / jnp.maximum(total, 1e-6)
        ok = ok & (total > 0) & jnp.isfinite(face_w)
        return jnp.stack(
            [mouth_x, mouth_y, face_w, ok.astype(jnp.float32)]
        )

    return detect


class BatchedMotionDetector:
    """TPU-accelerated MotionEnergyDetector over a clip batch.

    The dense work (temporal diffs, blurs, articulation ratio — the part
    that made the host detector the pipeline bottleneck, exactly as dlib
    was for the reference) runs as one jit program for the whole batch;
    the host performs only the scalar silhouette/percentile logic on the
    small per-clip maps. Output matches MotionEnergyDetector.__call__
    per clip (window-regularized canonical landmarks).
    """

    def __init__(self, window: int = 25, downsample: int = 1,
                 device_logic: bool = True, track: bool = False,
                 track_template: int = 40, track_search: int = 20, **kw):
        import jax

        self.window = window
        self.downsample = max(downsample, 1)
        self.device_logic = device_logic
        # NCC refinement: per-frame mouth track seeded by the clip-level
        # estimate (kernels/track.py) — true frame-rate tracking instead of
        # window-center interpolation
        self.track = track
        self.track_template = track_template
        self.track_search = track_search
        self.base = MotionEnergyDetector(**kw)
        self._compute = _device_maps_fn(
            window, self.base.blur, self.base.max_diff_frames
        )
        detect = _device_detect_fn(
            self.base.keep_mass, self.base.center_sigma, self.base.min_box,
            self.base.close_k,
        )
        # fused maps -> per-clip + per-window detections, ONE device program;
        # the host receives [B,4] and [B,NW,4] floats only
        self._detect_all = jax.jit(
            lambda clips: self._maps_and_detect(clips, detect)
        )

    def _maps_and_detect(self, clips, detect):
        import jax
        import jax.numpy as jnp

        cm, ca, wm, wa = self._compute(clips)
        clip_det = jax.vmap(detect)(cm, ca)  # [B, 4]
        win_det = jax.vmap(jax.vmap(detect))(wm, wa)  # [B, NW, 4]
        return clip_det, win_det

    def _estimates(self, dev_in) -> tuple:
        """-> (clip_det [B,4], win_det [B,NW,4]) as numpy."""
        if self.device_logic:
            clip_det, win_det = self._detect_all(dev_in)
            return np.asarray(clip_det), np.asarray(win_det)
        cm, ca, wm, wa = [np.asarray(x) for x in self._compute(dev_in)]
        b, nw = wm.shape[0], wm.shape[1]
        clip_det = np.zeros((b, 4), np.float32)
        win_det = np.zeros((b, nw, 4), np.float32)
        for i in range(b):
            d = self.base.detect_from_maps(cm[i], ca[i])
            if d is not None:
                clip_det[i] = (*d[1], d[2], 1.0)
            for wi in range(nw):
                dw = self.base.detect_from_maps(wm[i, wi], wa[i, wi])
                if dw is not None:
                    win_det[i, wi] = (*dw[1], dw[2], 1.0)
        return clip_det, win_det

    def __call__(self, clips) -> List[List[Optional[np.ndarray]]]:
        """clips [B, T, H, W] (numpy or already-on-device jax array) ->
        per-clip landmark lists (length T)."""
        import jax.numpy as jnp

        ds = self.downsample
        dev = jnp.asarray(clips)  # no-op if already on device
        dev_in = dev[:, :, ::ds, ::ds] if ds > 1 else dev
        clip_det, win_det = self._estimates(dev_in)
        b, t = clips.shape[:2]
        nw = win_det.shape[1]

        tracks = None
        if self.track:
            from avsl_tpu.kernels.track import ncc_track_batch

            tracks = np.asarray(
                ncc_track_batch(
                    dev_in, jnp.asarray(clip_det[:, :2]),
                    template_size=self.track_template, search=self.track_search,
                )
            )  # [B, T, 2] in downsampled coords

        out: List[List[Optional[np.ndarray]]] = []
        for i in range(b):
            per = [None] * t
            if clip_det[i, 3] < 0.5:
                out.append(per)
                continue
            clip_mouth, clip_face_w = clip_det[i, :2], float(clip_det[i, 2])
            if tracks is not None:
                med = np.median(tracks[i], axis=0)
                max_dev = np.array([0.30, 0.15], np.float32) * clip_face_w
                for fi in range(t):
                    m = med + np.clip(tracks[i, fi] - med, -max_dev, max_dev)
                    per[fi] = self.base._landmarks_for(m * ds, clip_face_w * ds)
                out.append(per)
                continue
            est = []
            for wi in range(nw):
                if win_det[i, wi, 3] >= 0.5:
                    center = min(wi * self.window + self.window // 2, t - 1)
                    est.append((center, win_det[i, wi, :2].astype(np.float32)))
            if est:
                mouths = np.stack([m for _, m in est])
                med = np.median(mouths, axis=0)
                max_dev = np.array([0.30, 0.12], np.float32) * clip_face_w
                for (idx, m) in est:
                    clamped = med + np.clip(0.7 * (m - med), -max_dev, max_dev)
                    per[idx] = self.base._landmarks_for(clamped * ds, clip_face_w * ds)
            else:
                lms = self.base._landmarks_for(clip_mouth * ds, clip_face_w * ds)
                per = [lms.copy() for _ in range(t)]
            out.append(per)
        return out


def landmark_net():
    """The CNN landmark regressor: [B,128,128,1] -> [B,68,2] in [0,1]."""
    import flax.linen as nn

    class LandmarkNet(nn.Module):
        @nn.compact
        def __call__(self, x):  # [B, 128, 128, 1]
            for feat in (16, 32, 64, 128, 128):
                x = nn.Conv(feat, (3, 3), strides=(2, 2))(x)
                x = nn.relu(x)
            x = x.reshape(x.shape[0], -1)
            x = nn.Dense(256)(x)
            x = nn.relu(x)
            x = nn.Dense(136)(x)
            return nn.sigmoid(x).reshape(-1, 68, 2)

    return LandmarkNet()


DEFAULT_CNN_WEIGHTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "assets", "landmark_cnn.npz"
)


def save_cnn_params(params, path: str) -> None:
    """Save a flax param pytree as a flat ``.npz`` ("/"-joined keys) —
    a plain-array format with no code-execution surface (unlike pickle)."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(prefix + "/" + k if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    np.savez_compressed(path, **flat)


def load_cnn_params(path: str):
    """Load a flat ``.npz`` weight file back into a nested param dict."""
    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return out


class CNNLandmarkDetector(LandmarkDetector):
    """Conv landmark regressor batched over the clip (one jit call).

    Loads the synthetic-face-pretrained weights shipped under
    data/assets/landmark_cnn.npz when present (train with
    ``python -m avsl_tpu.cli.train_landmarks``); random init otherwise.
    """

    INPUT = 128

    def __init__(self, params=None, seed: int = 0, weights_path: Optional[str] = None):
        import jax
        import jax.numpy as jnp

        self._net = landmark_net()
        if params is None:
            path = weights_path or (
                DEFAULT_CNN_WEIGHTS if os.path.exists(DEFAULT_CNN_WEIGHTS) else None
            )
            if path:
                params = load_cnn_params(path)
            else:
                params = self._net.init(
                    jax.random.PRNGKey(seed),
                    jnp.zeros((1, self.INPUT, self.INPUT, 1), jnp.float32),
                )
        self.params = params
        self._apply = jax.jit(lambda p, x: self._net.apply(p, x))

    def load_params(self, path: str) -> None:
        self.params = load_cnn_params(path)

    def __call__(self, frames: np.ndarray) -> List[Optional[np.ndarray]]:
        import cv2
        import jax.numpy as jnp

        t, h, w = frames.shape
        resized = np.stack(
            [cv2.resize(f.astype(np.uint8), (self.INPUT, self.INPUT)) for f in frames]
        )
        x = jnp.asarray(resized, jnp.float32)[..., None] / 255.0
        norm = np.asarray(self._apply(self.params, x))  # [T, 68, 2] in [0,1]
        scaled = norm * np.array([w, h], np.float32)
        return [scaled[i] for i in range(t)]


class AnchorTrackDetector(LandmarkDetector):
    """Mid-clip anchor + bidirectional NCC mouth tracking.

    Fixes the model-free detectors' slow response to early-clip speaker
    motion (measured on the reference's golden pair: dlib's mouth window
    moves ~70 px in the first second while the clip-level estimates stay
    near-static). Strategy:

    1. run a ``base`` detector for the coarse per-frame layout and scale,
    2. anchor at the clip's temporal middle (where clip-level estimates
       are most reliable), grab a mouth-centered template there,
    3. NCC-track that FIXED template backward to the first frame and
       forward to the last (fixed template = no drift; the search window
       follows the previous frame's position),
    4. emit the canonical 68-point layout at the base detector's scale,
       positioned at the tracked mouth center per frame.
    """

    def __init__(self, base: Optional[LandmarkDetector] = None,
                 template: int = 48, search: int = 28,
                 min_corr: float = 0.3,
                 layout: Optional[np.ndarray] = None):
        self.base = base or EnergyBoxDetector()
        self.template = template
        self.search = search
        self.min_corr = min_corr
        # 68-point layout the emitted landmarks are an affine image of;
        # MUST match the warp's mean face (default: parametric canonical).
        # Scale anchors on the outer-eye span, which transfers across
        # layouts (the base detector's eye span in px is its estimate of
        # the true inter-eye distance regardless of layout family).
        self.layout = None if layout is None else np.asarray(layout, np.float64)
        self.synthesizes_parametric_layout = layout is None

    def __call__(self, frames: np.ndarray) -> List[Optional[np.ndarray]]:
        import cv2

        base_lms = self.base(frames)
        valid = [i for i, l in enumerate(base_lms) if l is not None]
        if not valid:
            return base_lms
        t_total, h, w = frames.shape[:3]
        anchor = min(valid, key=lambda i: abs(i - t_total // 2))
        lm_a = base_lms[anchor]
        mouth_a = lm_a[48:68].mean(axis=0)
        # scale carried from the base layout (outer-eye span 36<->45 is
        # (45-36 canonical x-span)/156 of face width)
        canon = (
            self.layout if self.layout is not None
            else canonical_mean_face(300).astype(np.float64)
        )
        canon_mouth = canon[48:68].mean(axis=0)
        eye_span = canon[45, 0] - canon[36, 0]
        s = (lm_a[45, 0] - lm_a[36, 0]) / eye_span

        half_t = self.template // 2
        cx = int(np.clip(mouth_a[0], half_t, w - half_t))
        cy = int(np.clip(mouth_a[1], half_t, h - half_t))
        tmpl = frames[anchor][cy - half_t: cy + half_t,
                              cx - half_t: cx + half_t].astype(np.float32)

        centers = np.zeros((t_total, 2), np.float32)
        centers[anchor] = (cx, cy)

        def track(order):
            px, py = float(cx), float(cy)
            for i in order:
                x0 = int(np.clip(px - half_t - self.search, 0, w - 1))
                y0 = int(np.clip(py - half_t - self.search, 0, h - 1))
                x1 = int(np.clip(px + half_t + self.search, 1, w))
                y1 = int(np.clip(py + half_t + self.search, 1, h))
                win = frames[i][y0:y1, x0:x1].astype(np.float32)
                if win.shape[0] <= self.template or win.shape[1] <= self.template:
                    centers[i] = (px, py)
                    continue
                res = cv2.matchTemplate(win, tmpl, cv2.TM_CCOEFF_NORMED)
                _, mx, _, loc = cv2.minMaxLoc(res)
                if mx >= self.min_corr:
                    px = x0 + loc[0] + half_t
                    py = y0 + loc[1] + half_t
                centers[i] = (px, py)

        track(range(anchor - 1, -1, -1))
        track(range(anchor + 1, t_total))

        offset = s * (canon - canon_mouth)
        return [
            (offset + centers[i][None]).astype(np.float32)
            for i in range(t_total)
        ]


class PrecomputedLandmarks(LandmarkDetector):
    def __init__(self, landmarks: Sequence[Optional[np.ndarray]]):
        self.landmarks = list(landmarks)

    def __call__(self, frames: np.ndarray) -> List[Optional[np.ndarray]]:
        assert len(self.landmarks) >= len(frames)
        return self.landmarks[: len(frames)]


def create_detector(kind: str = "energy", **kw) -> LandmarkDetector:
    """Detector factory (the reference's CUDA-aware ``create_dlib_detectors``
    equivalent, lips_cropping.py:165-203)."""
    if kind == "motion":
        return MotionEnergyDetector(**kw)
    if kind == "energy":
        return EnergyBoxDetector(**kw)
    if kind == "cnn":
        return CNNLandmarkDetector(**kw)
    if kind == "anchor_track":
        return AnchorTrackDetector(**kw)
    if kind == "refined":
        from avsl_tpu.data.lip_refine import RefinedMouthTracker

        return RefinedMouthTracker(**kw)
    raise ValueError(f"Unknown detector kind {kind!r}")

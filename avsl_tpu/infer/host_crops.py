"""Host-side lip-crop production: clips -> 96x96 mouth crops on the CPU.

The minimal-bytes ingest design: detection + similarity warp run on the
host next to the media decoder, and only the warped mouth crops cross
the host->device link (96*96*T uint8 ~ 2.3 MB per 10 s segment vs ~25 MB
of full frames) — so per-chip ingest throughput survives a throttled
link (measured multi-tier rate limiting on tunneled TPU runtimes, and
generally: crops are ~11x fewer bytes). This is also the reference's own
division of labor (dlib + skimage warp on CPU feeding the GPU, reference
preprocess/video_process.py:305-490 and utils/lips_cropping.py:41-163),
rebuilt from the framework's own parts:

* clip-level detection: :class:`~avsl_tpu.data.landmarks.
  MotionEnergyDetector` on a ``detect_ds``-subsampled stream (the
  original host implementation the device kernels twin);
* per-frame trajectory (mode="track", default): the anchored parallel
  NCC tracker — one batched GIL-released C++ call
  (cpp/avsl_track via :mod:`avsl_tpu.kernels.track_native`) covering
  downsample -> NCC score maps -> top-k NMS -> Viterbi -> interpolation,
  with :mod:`avsl_tpu.data.track_host` (host twin of
  kernels/track.py:ncc_track_clip_parallel — the same refinement the
  on-device bench frontend applies) as the identical-math numpy/cv2
  fallback; smoothed over 12 frames;
* mode="interp": per-window detection + ``lip_roi.
  landmarks_interpolate`` + ``smooth_landmarks`` (the preprocessing
  pipeline's estimator);
* warp: ``kernels.warp.separable_crop_coords_np`` (closed-form
  similarity coefficients) + the threaded C++ sampler
  ``kernels.warp_native.sample_separable_host`` (numpy fallback).

Output matches the on-device staged frontend
(kernels/lip_pipeline.make_staged_lip_frontend: traj ->
track_refine_parallel -> coords_from_traj -> sample) up to detector
float detail — pinned by tests/test_host_crops.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from avsl_tpu.data.landmarks import LandmarkDetector, MotionEnergyDetector
from avsl_tpu.data.lip_roi import (
    canonical_mean_face,
    landmarks_interpolate,
    layout_face_width,
    relayout_landmarks,
    smooth_landmarks,
)
from avsl_tpu.kernels.track_native import ncc_track_batch_host
from avsl_tpu.kernels.warp import separable_crop_coords_np


class HostLipCropper:
    """clips [B, T, H, W] uint8 -> (crops [B, T, c, c] uint8, ok [B]).

    ``detect_ds``: spatial subsampling for the clip-level detection
    (box + mouth + face width — one estimate per clip); ds=4 suffices
    because the tracker's search radius absorbs the coarse anchor.
    ``track_ds``: subsampling for the per-frame NCC tracker (mode
    "track"); ds=2 matches the on-device bench frontend. ``track_stride``
    tracks every k-th frame and interpolates (host-only knob; the
    12-frame smoothing hides the difference).

    ``emit`` selects the crop contract: ``"96"`` — the dataset/storage
    contract (96x96, training random-crops to 88); ``"88"`` — the
    inference contract (the eval center crop applied host-side, 16%
    fewer upload bytes; models consume 88x88 directly).

    Detection failure falls back to the canonical layout exactly like
    the device path (kernels/lip_pipeline.synthesize_traj): canonical
    landmarks => identity-scale center crop, and ``ok[b] = False``.
    """

    def __init__(
        self,
        detect_ds: int = 4,
        detect_stride: int = 2,
        track_ds: int = 2,
        track_stride: int = 1,
        track_top_k: int = 3,
        mode: str = "track",
        crop_size: int = 96,
        out_size: int = 300,
        smoothing_window: int = 12,
        window: int = 25,
        emit: str = "96",
        detector: Optional[LandmarkDetector] = None,
        mean_face: Optional[np.ndarray] = None,
        detector_kw: Optional[dict] = None,
    ):
        if emit not in ("96", "88"):
            raise ValueError(f"emit must be '96' or '88', got {emit!r}")
        if mode not in ("track", "interp"):
            raise ValueError(f"mode must be 'track' or 'interp', got {mode!r}")
        self.detect_ds = max(int(detect_ds), 1)
        self.detect_stride = max(int(detect_stride), 1)
        self.track_ds = max(int(track_ds), 1)
        self.track_stride = max(int(track_stride), 1)
        self.track_top_k = max(int(track_top_k), 1)
        self.mode = mode
        self.crop_size = crop_size
        self.out_size = out_size
        self.smoothing_window = smoothing_window
        self.window = window
        self.emit = emit
        self.detector = detector or MotionEnergyDetector(**(detector_kw or {}))
        self.mean_face = (
            canonical_mean_face(out_size) if mean_face is None
            else np.asarray(mean_face, np.float32)
        )
        # landmark synthesis uses the WARP'S mean face as its layout —
        # synthesis layout and warp destination must be the same geometry
        # or the stable-point fit introduces a systematic crop offset
        # (lip_roi.layout_face_width docstring; tests/test_mean_face.py)
        self._canon = self.mean_face.astype(np.float32)
        self._canon_mouth = self._canon[48:68].mean(axis=0)
        self._layout_w = layout_face_width(self._canon)
        # interp mode warps whatever self.detector emits: detectors that
        # synthesize the PARAMETRIC layout need their output re-expressed
        # in a custom mean face's layout before the warp fit (the -0.10
        # NCC mixed-layout hazard mode='track' avoids by synthesizing
        # from self._canon directly)
        self._relayout_interp = mean_face is not None and getattr(
            self.detector, "synthesizes_parametric_layout", False
        )

    # ---- trajectory estimation -------------------------------------

    def _lms_from_traj(self, traj: np.ndarray, face_w: float) -> np.ndarray:
        """[T, 2] mouth trajectory -> [T, 68, 2] via the affine identity
        lms[t] = s*(layout - layout_mouth) + traj[t] (lip_pipeline
        module docstring); scale anchored on the layout's jaw span."""
        s = face_w / self._layout_w
        return (
            s * (self._canon - self._canon_mouth)[None]
            + traj[:, None, :]
        ).astype(np.float32)

    def _landmarks_track(self, clips: np.ndarray):
        b, t = clips.shape[:2]
        dds, tds = self.detect_ds, self.track_ds
        out = np.empty((b, t, 68, 2), np.float32)
        ok = np.zeros((b,), bool)
        anchor = t // 2
        half_w = self.window // 2
        det = self.detector
        if not isinstance(det, MotionEnergyDetector):
            raise ValueError("mode='track' needs a MotionEnergyDetector")
        # Phase 1 — per-clip detection (numpy scalar logic; cheap):
        # anchor positions + face scales feed one batched tracker call.
        anchor_pos = np.zeros((b, 2), np.float32)
        face_ws = np.zeros((b,), np.float32)
        for i in range(b):
            # face scale from the clip at detect_ds, temporally strided
            # (motion statistics are scale-relative, so the threshold
            # logic is stride-invariant; halves the dominant host cost);
            # detection failure here = no moving face anywhere
            clip_det = det.detect_clip(
                clips[i, ::self.detect_stride, ::dds, ::dds]
            )
            if clip_det is None:
                out[i] = self._canon[None]
                continue
            _box, clip_mouth, face_w = clip_det
            # anchor position from the MID-CLIP window at tracker
            # resolution — the device path anchors on the interpolated
            # window trajectory at t//2 (lip_pipeline track_refine_*);
            # a single mid-window estimate lands within a couple px of
            # that at ~3% of the full window sweep's cost
            mid = det.detect_clip(
                clips[i, max(0, anchor - half_w): anchor + half_w + 1,
                      ::tds, ::tds]
            )
            if mid is not None:
                anchor_pos[i] = np.asarray(mid[1], np.float32)
            else:
                anchor_pos[i] = np.asarray(clip_mouth, np.float32) * dds / tds
            face_ws[i] = float(face_w) * dds
            ok[i] = True
        if not ok.any():
            return out, ok
        # Phase 2 — one batched NCC tracking call over the detected clips
        # (native C++ with the GIL released when cpp/avsl_track is built;
        # identical-math numpy/cv2 fallback otherwise).
        sel = np.nonzero(ok)[0]
        tracks, trk_ok = ncc_track_batch_host(
            clips[sel], anchor_pos[sel], anchor, ds=tds,
            template_size=max(16, 48 // tds),
            search=max(24, 96 // tds),
            stride=self.track_stride,
            top_k=self.track_top_k,
        )
        # Phase 3 — smoothing + landmark synthesis (vectorized numpy).
        for j, i in enumerate(sel):
            if not trk_ok[j]:
                out[i] = self._canon[None]
                ok[i] = False
                continue
            traj = smooth_landmarks(tracks[j] * tds, self.smoothing_window)
            out[i] = self._lms_from_traj(traj, face_ws[i])
        return out, ok

    def _landmarks_interp(self, clips: np.ndarray):
        b, t = clips.shape[:2]
        ds = self.detect_ds
        out = np.empty((b, t, 68, 2), np.float32)
        ok = np.zeros((b,), bool)
        for i in range(b):
            small = clips[i, :, ::ds, ::ds]
            sparse = self.detector(small, window=self.window) \
                if isinstance(self.detector, MotionEnergyDetector) \
                else self.detector(small)
            sparse = [(l * ds if l is not None else None) for l in sparse]
            lms = landmarks_interpolate(sparse)
            if lms is None:
                out[i] = self._canon[None]
                continue
            lms = smooth_landmarks(lms, self.smoothing_window)
            if self._relayout_interp:
                lms = relayout_landmarks(lms, self._canon)
            out[i] = lms
            ok[i] = True
        return out, ok

    def landmarks(self, clips: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """[B, T, H, W] -> (lms [B, T, 68, 2] full-res, ok [B] bool)."""
        if self.mode == "track":
            return self._landmarks_track(clips)
        return self._landmarks_interp(clips)

    # ---- warp --------------------------------------------------------

    def coords(self, lms: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Separable sampling coordinates for full-resolution frames."""
        ys, xs = separable_crop_coords_np(
            lms, self.mean_face, out_size=self.out_size,
            crop_size=self.crop_size,
        )
        if self.emit == "88":
            # eval center crop (96 -> 88) applied in coordinate space:
            # identical pixels, computed once instead of sliced later
            off = (self.crop_size - 88) // 2
            ys = ys[..., off: off + 88]
            xs = xs[..., off: off + 88]
        return ys, xs

    def __call__(
        self, clips: np.ndarray, n_threads: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        from avsl_tpu.kernels.warp_native import sample_separable_host

        clips = np.asarray(clips)
        if clips.ndim != 4:
            raise ValueError(f"expected [B, T, H, W], got {clips.shape}")
        lms, ok = self.landmarks(clips)
        ys, xs = self.coords(lms)
        crops = sample_separable_host(
            clips, ys, xs, out_dtype=np.uint8, n_threads=n_threads
        )
        return crops, ok

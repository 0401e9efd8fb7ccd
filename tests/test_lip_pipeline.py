"""Parity tests: fused on-device lip frontend vs the host reference path.

The fused pipeline (kernels/lip_pipeline.py) must reproduce the host logic
it replaces: BatchedMotionDetector.__call__ landmark synthesis,
lip_roi.landmarks_interpolate, lip_roi.smooth_landmarks, and the separable
warp — end to end, to float tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avsl_tpu.data.landmarks import BatchedMotionDetector, MotionEnergyDetector
from avsl_tpu.data.lip_roi import (
    canonical_mean_face,
    landmarks_interpolate,
    smooth_landmarks,
)
from avsl_tpu.kernels.lip_pipeline import (
    make_lip_frontend,
    masked_time_interp,
    smooth_time,
    synthesize_landmarks,
)
from avsl_tpu.kernels.warp import warp_and_crop_clip_separable

# 40 frames exercises every pipeline stage (interp gaps, smooth-12 window,
# slope fit over frames 10..T-10) at ~half the 75-frame compile+exec cost;
# the slow-marked deep siblings keep longer clips.
T, H, W = 40, 144, 176
DS = 2
WINDOW = 25


def _synthetic_clips(b=2, t=T, h=H, w=W, seed=0):
    """Moving-blob closeup footage (same construction as bench.py)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 200, (h, w)).astype(np.float32)
    clips = np.empty((b, t, h, w), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for bi in range(b):
        cx, cy = w // 2 + 5 * bi, h // 2
        for ti in range(t):
            jitter = 4 * np.sin(ti / 7 + bi)
            face = 80 * np.exp(
                -(((xx - cx - jitter) / 30.0) ** 2 + ((yy - cy) / 40.0) ** 2)
            )
            # articulating mouth: flickering patch below face center
            mouth = 40 * (ti % 2) * np.exp(
                -(((xx - cx) / 8.0) ** 2 + ((yy - cy - 18) / 6.0) ** 2)
            )
            clips[bi, ti] = np.clip(base + face + mouth, 0, 255).astype(np.uint8)
    return clips


def test_smooth_time_matches_host():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(T, 68, 2)).astype(np.float32)
    got = np.asarray(smooth_time(jnp.asarray(x), 12))
    want = smooth_landmarks(x, 12)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_masked_interp_matches_host():
    rng = np.random.default_rng(2)
    nw = 4
    # needs nw distinct window centers -> its own clip length (cheap test)
    T = 4 * WINDOW
    centers = np.minimum(np.arange(nw) * WINDOW + WINDOW // 2, T - 1)
    values = rng.normal(size=(nw, 2)).astype(np.float32) * 10
    for valid_pattern in ([1, 1, 1, 1], [0, 1, 1, 0], [1, 0, 0, 1], [0, 0, 1, 0]):
        valid = np.asarray(valid_pattern, bool)
        got = np.asarray(
            masked_time_interp(
                jnp.asarray(values), jnp.asarray(valid), jnp.asarray(centers), T
            )
        )
        per = [None] * T
        for i in range(nw):
            if valid[i]:
                # host path interpolates full 68x2 landmark fields; a 2-D
                # trajectory is the same math (affine identity)
                per[centers[i]] = np.tile(values[i], (68, 1))
        want = landmarks_interpolate(per)[:, 0, :]
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_landmarks_affine_identity():
    """synthesize's lms = s*(canon-canon_mouth)+mouth identity equals
    MotionEnergyDetector._landmarks_for exactly."""
    det = MotionEnergyDetector()
    canon = canonical_mean_face(300).astype(np.float64)
    canon_mouth = canon[48:68].mean(axis=0)
    for mouth, face_w in [((80.0, 120.0), 100.0), ((150.0, 220.0), 156.0)]:
        want = det._landmarks_for(mouth, face_w)
        s = face_w / 156.0
        got = s * (canon - canon_mouth) + np.asarray(mouth)
        np.testing.assert_allclose(got, want, atol=1e-3)


def test_synthesize_fallback_is_canonical_face():
    clip_det = jnp.asarray([0.0, 0.0, 0.0, 0.0])  # ok = 0
    win_det = jnp.zeros((3, 4))
    lms = np.asarray(synthesize_landmarks(clip_det, win_det, T, window=WINDOW,
                                          detect_ds=DS))
    want = canonical_mean_face(300)
    np.testing.assert_allclose(lms[0], want, atol=1e-2)
    np.testing.assert_allclose(lms[-1], want, atol=1e-2)


def test_synthesize_matches_host_detector_path():
    """Device synthesis from the detector's own (clip_det, win_det) equals
    the host path: per-clip lists -> interpolate -> smooth -> *ds."""
    clips = _synthetic_clips()
    small = np.ascontiguousarray(clips[:, :, ::DS, ::DS])
    det = BatchedMotionDetector(downsample=1, window=WINDOW)
    per_clip = det(small)
    clip_det, win_det = det._estimates(jnp.asarray(small))

    mean_face = canonical_mean_face(300)
    for b in range(clips.shape[0]):
        filled = landmarks_interpolate(per_clip[b])
        if filled is None:
            want = np.tile(mean_face[None], (T, 1, 1))
        else:
            want = smooth_landmarks(filled) * DS
        got = np.asarray(
            synthesize_landmarks(
                jnp.asarray(clip_det[b]), jnp.asarray(win_det[b]), T,
                window=WINDOW, detect_ds=DS,
            )
        )
        np.testing.assert_allclose(got, want, atol=0.1)


@pytest.mark.parametrize("roi", [None, 96])
def test_fused_frontend_matches_host_pipeline(roi):
    clips = _synthetic_clips()
    b = clips.shape[0]
    small = np.ascontiguousarray(clips[:, :, ::DS, ::DS])
    det = BatchedMotionDetector(downsample=1, window=WINDOW)
    per_clip = det(small)
    mean_face = canonical_mean_face(300)

    want = np.empty((b, T, 96, 96), np.float32)
    for bi in range(b):
        filled = landmarks_interpolate(per_clip[bi])
        lms = (smooth_landmarks(filled) * DS if filled is not None
               else np.tile(mean_face[None], (T, 1, 1)))
        want[bi] = np.asarray(
            warp_and_crop_clip_separable(
                jnp.asarray(clips[bi]), jnp.asarray(lms),
                jnp.asarray(mean_face, jnp.float32),
            )
        )

    frontend = jax.jit(make_lip_frontend(T, window=WINDOW, detect_ds=DS, roi=roi))
    got = np.asarray(frontend(jnp.asarray(clips)))
    assert got.shape == (b, T, 96, 96)
    # identical math modulo f32 association; ROI slicing only changes
    # out-of-frame zero-fill, which the centered synthetic face avoids
    np.testing.assert_allclose(got, want, atol=0.75)


def test_staged_frontend_matches_fused():
    """The separately-jittable stages (traj -> closed-form coords ->
    chunked sampling) must reproduce the fused frontend exactly: the
    closed-form coordinate path replaces the least-squares similarity fit
    with its analytic solution (landmarks are exactly affine in canon),
    and chunked sampling is the same math in lax.map groups."""
    from avsl_tpu.kernels.lip_pipeline import make_staged_lip_frontend

    clips = _synthetic_clips()
    fused = jax.jit(make_lip_frontend(T, window=WINDOW, detect_ds=DS, roi=None))
    want = np.asarray(fused(jnp.asarray(clips)))

    stages = make_staged_lip_frontend(T, window=WINDOW, detect_ds=DS)
    clips_dev = jnp.asarray(clips)
    small = stages["subsample"](clips_dev)
    tr, fw, _ = stages["traj"](small)
    ys, xs = stages["coords_from_traj"](tr, fw)
    got = np.asarray(stages["sample"](clips_dev, ys, xs))
    np.testing.assert_allclose(got, want, atol=0.25)

    # ROI path: host-sliced window + offset coords gives the same crops
    # (synthetic face stays inside the window, so no fill differences)
    roi = 128
    x0, y0 = stages["traj_window"](tr, H, W, roi)
    x0h, y0h = np.asarray(x0), np.asarray(y0)
    rois = np.stack([
        clips[b, :, y0h[b]: y0h[b] + roi, x0h[b]: x0h[b] + roi]
        for b in range(clips.shape[0])
    ])
    ys_r, xs_r = stages["coords_from_traj"](tr, fw, x0, y0)
    got_roi = np.asarray(stages["sample"](jnp.asarray(rois), ys_r, xs_r))
    np.testing.assert_allclose(got_roi, want, atol=0.25)


def test_sample_separable_chunking_invariance():
    """sample_separable(chunk=k) is exact for every chunking, including
    the padded tail path."""
    from avsl_tpu.kernels.warp import sample_separable

    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.integers(0, 255, (41, 50, 60)).astype(np.uint8))
    ys = jnp.asarray(rng.uniform(-5, 55, (41, 16)).astype(np.float32))
    xs = jnp.asarray(rng.uniform(-5, 65, (41, 16)).astype(np.float32))
    ref = np.asarray(sample_separable(frames, ys, xs, chunk=64))  # unchunked
    for chunk in (1, 7, 32, 41):
        got = np.asarray(sample_separable(frames, ys, xs, chunk=chunk))
        np.testing.assert_allclose(got, ref, atol=1e-4, err_msg=str(chunk))


def test_separable_crop_coords_np_matches_jax():
    """The host (numpy) twin of separable_crop_coords is bit-equivalent."""
    from avsl_tpu.kernels.warp import (
        separable_crop_coords,
        separable_crop_coords_np,
    )

    rng = np.random.default_rng(4)
    mean_face = canonical_mean_face(300).astype(np.float32)
    lms = (mean_face[None, None] * rng.uniform(0.8, 1.2, (2, 5, 1, 1))
           + rng.normal(0, 3.0, (2, 5, 68, 2))).astype(np.float32)
    ys_j, xs_j = separable_crop_coords(jnp.asarray(lms), jnp.asarray(mean_face))
    ys_n, xs_n = separable_crop_coords_np(lms, mean_face)
    np.testing.assert_allclose(np.asarray(ys_j), ys_n, atol=1e-3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(xs_j), xs_n, atol=1e-3, rtol=1e-5)


def test_traj_tracked_stage():
    """The anchored-NCC device stage must keep the traj contract, stay
    near the detection trajectory on stable footage, and follow a
    translating scene that the window estimates lag on."""
    from avsl_tpu.kernels.lip_pipeline import make_staged_lip_frontend

    stages = make_staged_lip_frontend(T, window=WINDOW, detect_ds=DS)
    clips = _synthetic_clips()
    small = stages["subsample"](jnp.asarray(clips))
    tr_base, fw_base, _ = stages["traj"](small)
    tr_trk, fw_trk, _ = stages["traj_tracked"](small)
    assert tr_trk.shape == tr_base.shape and fw_trk.shape == fw_base.shape
    np.testing.assert_array_equal(np.asarray(fw_trk), np.asarray(fw_base))
    assert np.isfinite(np.asarray(tr_trk)).all()
    # near-static face: tracking must not run away from the detection
    drift = np.abs(np.asarray(tr_trk) - np.asarray(tr_base)).max()
    assert drift < 25.0, f"tracked trajectory drifted {drift:.1f}px"

    # translating scene: the whole frame content shifts right over time;
    # the fixed anchored template must follow it frame-accurately
    rng = np.random.default_rng(7)
    tex = rng.integers(0, 255, (H, W + T)).astype(np.uint8)
    moving = np.stack(
        [np.stack([tex[:, s: s + W] for s in range(T)])] * 2
    )  # [2, T, H, W], scene shifts 1 px/frame
    small_m = stages["subsample"](jnp.asarray(moving))
    tr_m, _, _ = stages["traj_tracked"](small_m)
    x = np.asarray(tr_m)[0, :, 0]
    # ignore smoothing-clamped edges; interior must move ~ -1 px/frame
    slope = np.polyfit(np.arange(10, T - 10), x[10: T - 10], 1)[0]
    assert -1.4 < slope < -0.6, f"tracked slope {slope:.2f} (want ~-1)"

"""Lip-ROI pipeline tests: geometry kernels + detectors + video IO.

The end-to-end test runs on the real AMI example clip shipped with the
reference mount when available (same fixture the reference uses for its
own tests, SURVEY.md §4)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from avsl_tpu.data.lip_roi import (
    canonical_mean_face,
    extract_lip_clip,
    landmarks_interpolate,
    smooth_landmarks,
)
from avsl_tpu.data.landmarks import (
    AnchorTrackDetector,
    EnergyBoxDetector,
    MotionEnergyDetector,
    PrecomputedLandmarks,
    canonical_landmarks_from_box,
)
from avsl_tpu.data.video_io import (
    load_video_feats,
    read_video_frames,
    trim_video_to_audio,
    validate_video,
    write_video_frames,
)
from avsl_tpu.kernels.warp import (
    center_crop,
    normalize_frames,
    rgb_to_grayscale,
    transform_points,
    umeyama,
    warp_and_crop_clip,
    warp_frame,
)

AMI_EXAMPLE = "/root/reference/examples/ami/EN2001a-A-21.39-25.86-video.mp4"


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 100, (10, 2)).astype(np.float32)
    theta, scale, t = 0.3, 1.7, np.array([5.0, -12.0])
    rot = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    dst = scale * src @ rot.T + t
    m = np.asarray(umeyama(jnp.asarray(src), jnp.asarray(dst)))
    got = src @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(got, dst, atol=1e-3)
    # compare against OpenCV's estimate
    import cv2

    cv_m, _ = cv2.estimateAffinePartial2D(src, dst.astype(np.float32))
    np.testing.assert_allclose(m, cv_m, atol=1e-2)


def test_warp_frame_identity_and_translation():
    img = np.random.default_rng(1).uniform(0, 255, (40, 50)).astype(np.float32)
    ident = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = np.asarray(warp_frame(jnp.asarray(img), ident, 40, 50))
    np.testing.assert_allclose(out, img, atol=1e-3)

    shift = jnp.asarray([[1.0, 0.0, 5.0], [0.0, 1.0, 3.0]])  # dst = src + (5,3)
    out = np.asarray(warp_frame(jnp.asarray(img), shift, 40, 50))
    np.testing.assert_allclose(out[3:, 5:], img[:-3, :-5], atol=1e-3)
    np.testing.assert_allclose(out[:3], 0, atol=1e-6)  # zero fill


def test_warp_and_crop_clip_centers_mouth():
    mean_face = jnp.asarray(canonical_mean_face(300))
    t, h, w = 4, 200, 200
    # landmarks: mean face shrunk and shifted into the frame
    lms = np.asarray(mean_face) * 0.5 + np.array([30.0, 20.0])
    frames = np.zeros((t, h, w), np.float32)
    mouth = lms[48:68]
    cx, cy = mouth.mean(axis=0).astype(int)
    frames[:, cy - 3 : cy + 3, cx - 3 : cx + 3] = 255.0  # bright mouth blob

    clip = np.asarray(
        warp_and_crop_clip(
            jnp.asarray(frames), jnp.asarray(np.tile(lms, (t, 1, 1))), mean_face
        )
    )
    assert clip.shape == (4, 96, 96)
    # the blob must end up near the crop center
    yy, xx = np.unravel_index(np.argmax(clip[0]), clip[0].shape)
    assert abs(yy - 48) < 12 and abs(xx - 48) < 12


def test_landmarks_interpolate():
    a = np.zeros((68, 2), np.float32)
    b = np.ones((68, 2), np.float32) * 10
    out = landmarks_interpolate([None, a, None, None, b, None])
    assert out.shape == (6, 68, 2)
    np.testing.assert_allclose(out[0], a)  # edge fill
    np.testing.assert_allclose(out[2], a + (b - a) / 3, atol=1e-5)
    np.testing.assert_allclose(out[3], a + 2 * (b - a) / 3, atol=1e-5)
    np.testing.assert_allclose(out[5], b)
    assert landmarks_interpolate([None, None]) is None


def test_smooth_landmarks():
    t = 20
    lms = np.random.default_rng(0).normal(size=(t, 68, 2)).astype(np.float32)
    sm = smooth_landmarks(lms, window=12)
    assert sm.shape == lms.shape
    const = np.tile(lms[:1], (t, 1, 1))
    np.testing.assert_allclose(smooth_landmarks(const), const, atol=1e-6)
    # interior point = mean over [i-6, i+6]
    np.testing.assert_allclose(sm[10], lms[4:17].mean(axis=0), atol=1e-5)


def test_canonical_mean_face_geometry():
    f = canonical_mean_face(300)
    assert f.shape == (68, 2)
    mouth = f[48:68]
    eyes = f[36:48]
    assert mouth[:, 1].mean() > eyes[:, 1].mean()  # mouth below eyes
    assert abs(mouth[:, 0].mean() - 150) < 2  # centered
    # left/right eye symmetric about x=150
    assert abs((f[36, 0] + f[45, 0]) / 2 - 150) < 2


def test_canonical_landmarks_from_box():
    lms = canonical_landmarks_from_box(10, 20, 100, 120)
    assert lms.shape == (68, 2)
    assert lms[:, 0].min() >= 9 and lms[:, 0].max() <= 111
    assert lms[:, 1].min() >= 19 and lms[:, 1].max() <= 141


def test_rgb_gray_crop_normalize():
    rgb = np.random.default_rng(0).integers(0, 255, (3, 100, 120, 3)).astype(np.uint8)
    gray = np.asarray(rgb_to_grayscale(jnp.asarray(rgb)))
    assert gray.shape == (3, 100, 120)
    cropped = np.asarray(center_crop(jnp.asarray(gray), 88))
    assert cropped.shape == (3, 88, 88)
    norm = np.asarray(normalize_frames(jnp.asarray(cropped)))
    assert abs(norm.mean()) < 3  # roughly standardized


def test_video_roundtrip(tmp_path):
    frames = (np.random.default_rng(0).uniform(0, 255, (10, 96, 96))).astype(np.uint8)
    path = write_video_frames(str(tmp_path / "clip.mp4"), frames, fps=25)
    ok, reason = validate_video(path)
    assert ok, reason
    back = read_video_frames(path, grayscale=True)
    assert back.shape == (10, 96, 96)

    feats = load_video_feats(path)
    assert feats.shape == (10, 88, 88, 1)
    assert np.isfinite(feats).all()

    assert trim_video_to_audio(frames, 4 * 16000, fps=25).shape[0] == 10
    assert trim_video_to_audio(frames, 16000 // 5, fps=25).shape[0] == 5


def test_validate_video_garbage(tmp_path):
    p = tmp_path / "bad.mp4"
    p.write_bytes(b"notavideo" * 200)
    ok, reason = validate_video(str(p))
    assert not ok


def test_extract_lip_clip_with_precomputed_landmarks():
    mean_face = canonical_mean_face(300)
    lms = mean_face * 0.6 + np.array([40.0, 30.0])
    frames = np.random.default_rng(0).uniform(0, 255, (6, 240, 240)).astype(np.float32)
    per_frame = [lms if i % 2 == 0 else None for i in range(6)]
    clip = extract_lip_clip(frames, per_frame)
    assert clip.shape == (6, 96, 96)
    assert clip.dtype == np.uint8


@pytest.mark.skipif(not os.path.exists(AMI_EXAMPLE), reason="AMI example not mounted")
def test_end_to_end_on_real_ami_clip(tmp_path):
    frames = read_video_frames(AMI_EXAMPLE, grayscale=True, max_frames=40)
    assert frames.ndim == 3 and frames.shape[0] > 0
    det = MotionEnergyDetector()
    lms = det(frames)
    found = sum(1 for l in lms if l is not None)
    assert found > 0, "no face found in real AMI closeup"
    clip = extract_lip_clip(frames, lms)
    assert clip is not None and clip.shape[1:] == (96, 96)
    out = write_video_frames(str(tmp_path / "lip.mp4"), clip, fps=25)
    assert validate_video(out)[0]
    feats = load_video_feats(out)
    assert feats.shape[1:] == (88, 88, 1)


def test_separable_warp_matches_gather_warp():
    from avsl_tpu.kernels.warp import warp_and_crop_clip_separable

    mean_face = jnp.asarray(canonical_mean_face(300))
    # rotation-free landmarks: canonical layout scaled+translated
    lms = np.asarray(mean_face) * 0.55 + np.array([35.0, 25.0])
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 255, (3, 240, 260)).astype(np.float32)
    lms_t = jnp.asarray(np.tile(lms, (3, 1, 1)))

    gather = np.asarray(warp_and_crop_clip(jnp.asarray(frames), lms_t, mean_face))
    sep = np.asarray(warp_and_crop_clip_separable(jnp.asarray(frames), lms_t, mean_face))
    assert sep.shape == gather.shape == (3, 96, 96)
    np.testing.assert_allclose(sep, gather, atol=1e-2)

    # edge-clipped crop: landmarks pushed so the crop samples beyond the
    # frame border — per-tap masking must still match the gather kernel
    # exactly (partial bilinear contributions in (-1,0) and (n-1,n))
    lms_edge = np.asarray(mean_face) * 0.55 + np.array([-40.0, -35.0])
    lms_et = jnp.asarray(np.tile(lms_edge, (3, 1, 1)))
    g2 = np.asarray(warp_and_crop_clip(jnp.asarray(frames), lms_et, mean_face))
    s2 = np.asarray(
        warp_and_crop_clip_separable(jnp.asarray(frames), lms_et, mean_face)
    )
    np.testing.assert_allclose(s2, g2, atol=1e-2)


AMI_GOLDEN_LIP = "/root/reference/examples/ami/EN2001a-A-21.39-25.86-lip_video.mp4"


def _ncc_best_shift(a, b, max_shift=10):
    """Max zero-mean NCC of two equal-size crops over +-max_shift pixel
    translations (geometric agreement robust to small centering offsets)."""
    best = -1.0
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    h, w = a.shape
    for dy in range(-max_shift, max_shift + 1, 2):
        for dx in range(-max_shift, max_shift + 1, 2):
            aa = a[max(0, dy): min(h, h + dy), max(0, dx): min(w, w + dx)]
            bb = b[max(0, -dy): min(h, h - dy), max(0, -dx): min(w, w - dx)]
            if aa.size < 1000:
                continue
            aa = aa - aa.mean()
            bb = bb - bb.mean()
            denom = np.sqrt((aa * aa).sum() * (bb * bb).sum())
            if denom > 0:
                best = max(best, float((aa * bb).sum() / denom))
    return best


@pytest.mark.skipif(
    not (os.path.exists(AMI_EXAMPLE) and os.path.exists(AMI_GOLDEN_LIP)),
    reason="AMI golden pair not mounted",
)
def test_lip_crops_agree_with_reference_golden_clip():
    """Geometric agreement with the reference's OWN dlib-produced lip clip
    (the shipped golden pair exists for exactly this comparison; reference
    pipeline under test: video_process.py:305-490).

    Round-3 state (RefinedMouthTracker, data/lip_refine.py): measured
    whole-clip mean best-shift NCC 0.892, early frames 0.929, mid 0.853 —
    vs an oracle fed dlib's exact per-frame center+scale scoring 0.886 /
    0.920 / 0.845 on the same rotation-free warp (at or above the oracle:
    the refiner's smoothed trajectory is closer to dlib's SMOOTHED
    landmarks than the raw recovered geometry is). Floors sit above the
    VERDICT round-2 targets (whole >= 0.72, early >= 0.62) with margin
    for environment variation; random or off-face crops score ~0.0."""
    frames = read_video_frames(AMI_EXAMPLE, grayscale=True)
    gold = read_video_frames(AMI_GOLDEN_LIP, grayscale=True)
    from avsl_tpu.data.lip_refine import RefinedMouthTracker

    det = RefinedMouthTracker()
    clip = extract_lip_clip(frames, det(frames))
    assert clip is not None and clip.shape[1:] == (96, 96)

    n = min(len(clip), len(gold))
    sims = np.array([_ncc_best_shift(clip[t], gold[t]) for t in range(0, n, 5)])
    early = np.array([_ncc_best_shift(clip[t], gold[t]) for t in range(0, 25, 5)])
    mid = np.array(
        [_ncc_best_shift(clip[t], gold[t]) for t in range(25, min(n, 85), 5)]
    )
    assert sims.mean() >= 0.78, f"whole-clip mean NCC {sims.mean():.3f}"
    assert early.mean() >= 0.72, f"early-clip mean NCC {early.mean():.3f}"
    assert mid.mean() >= 0.75, f"mid-clip mean NCC {mid.mean():.3f}"
    # and the mid-clip peak must show real per-frame structure agreement
    assert mid.max() >= 0.85, f"mid-clip max NCC {mid.max():.3f}"


@pytest.mark.skipif(
    not (os.path.exists(AMI_EXAMPLE) and os.path.exists(AMI_GOLDEN_LIP)),
    reason="AMI golden pair not mounted",
)
def test_anchored_tracker_still_lands_on_mouth():
    """Regression floor for the pre-refinement tracker (the fallback path
    when the sandwich scan finds no lip contrast): round-2 thresholds."""
    frames = read_video_frames(AMI_EXAMPLE, grayscale=True)
    gold = read_video_frames(AMI_GOLDEN_LIP, grayscale=True)
    det = AnchorTrackDetector()
    clip = extract_lip_clip(frames, det(frames))
    n = min(len(clip), len(gold))
    sims = np.array([_ncc_best_shift(clip[t], gold[t]) for t in range(0, n, 5)])
    assert sims.mean() >= 0.55, f"fallback whole-clip mean NCC {sims.mean():.3f}"


def test_anchor_track_follows_moving_face():
    """AnchorTrackDetector must follow a face that translates across the
    frame — the failure mode of the clip-level detectors on real AMI
    footage (speaker moving in the first second)."""
    rng = np.random.default_rng(0)
    T, H, W = 60, 160, 200
    base = rng.integers(30, 90, (H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    frames = np.empty((T, H, W), np.uint8)
    true_cx = np.linspace(60, 140, T)
    for t in range(T):
        # textured "mouth" patch that translates horizontally
        mouth = 120 * np.exp(
            -(((xx - true_cx[t]) / 10.0) ** 2 + ((yy - 90) / 6.0) ** 2)
        ) * (1 + 0.3 * np.sin(xx))
        frames[t] = np.clip(base + mouth, 0, 255).astype(np.uint8)

    # base estimate: static canonical layout centered mid-frame, so the
    # tracker's anchor template lands on the mid-trajectory mouth
    mean_face = canonical_mean_face(300) * 0.5
    offset = np.array([true_cx[T // 2], 90.0]) - mean_face[48:68].mean(axis=0)
    static = [mean_face + offset] * T
    det = AnchorTrackDetector(base=PrecomputedLandmarks(static), template=24, search=16)
    lms = det(frames)
    centers = np.array([l[48:68].mean(axis=0) for l in lms])
    err = np.abs(centers[:, 0] - true_cx)
    assert err[:10].max() < 8.0, f"early tracking error {err[:10].max():.1f}px"
    assert err.max() < 8.0, f"tracking error {err.max():.1f}px"
    assert np.abs(centers[:, 1] - 90).max() < 8.0

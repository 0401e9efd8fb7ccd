"""Native batched NCC tracker (cpp/avsl_track via kernels/track_native).

Pins:
* native == numpy/cv2 twin exactly on synthetic clips with an unambiguous
  NCC peak (all ds/stride/top_k modes);
* statistical agreement on real AMI footage, where the system OpenCV (4.6,
  linked by the .so) and the pip cv2 wheel (5.0, used by the fallback) may
  reorder near-tie peaks at the ulp level on repetitive background texture
  — trajectories must agree on ~all frames and the 12-frame-smoothed
  difference must be sub-pixel;
* the ds-geometry failure path (frame too small for template+margin)
  reports ok=False with the clamped-anchor fallback row;
* the wrapper falls back to the numpy path for non-uint8 input.
"""

import numpy as np
import pytest

from avsl_tpu.data.lip_roi import smooth_landmarks
from avsl_tpu.data.track_host import ncc_track_clip_parallel_np
from avsl_tpu.kernels.track_native import (
    native_available,
    ncc_track_batch_host,
)

AMI_EXAMPLE = "/root/reference/examples/ami/EN2001a-A-21.39-25.86-video.mp4"


def _tracking_clip(t=40, h=120, w=140, seed=5):
    """A textured patch moving on a smooth path over a noisy background
    (same construction as test_host_crops; peak NCC is unambiguous)."""
    rng = np.random.default_rng(seed)
    bg = rng.integers(0, 60, (h, w)).astype(np.float32)
    patch = rng.integers(100, 255, (14, 14)).astype(np.float32)
    frames = np.empty((t, h, w), np.float32)
    path = np.stack(
        [30 + 0.9 * np.arange(t), 44 + 6 * np.sin(np.arange(t) / 9)], -1
    )
    for i in range(t):
        frames[i] = bg
        x, y = int(path[i, 0]), int(path[i, 1])
        frames[i, y: y + 14, x: x + 14] = patch
    return frames.astype(np.uint8), path


def _batch(b=3, **kw):
    clips, paths = [], []
    for s in range(b):
        f, p = _tracking_clip(seed=5 + s, **kw)
        clips.append(f)
        paths.append(p)
    return np.stack(clips), np.stack(paths)


@pytest.mark.skipif(not native_available(), reason="libavsl_track not built")
@pytest.mark.parametrize(
    "ds,stride,top_k",
    [(1, 1, 1), (1, 2, 3), (2, 1, 1), (2, 3, 3)],
)
def test_native_matches_numpy_twin_synthetic(ds, stride, top_k):
    clips, paths = _batch()
    anchor = clips.shape[1] // 2
    # anchor position = patch center at the anchor frame, tracker scale
    ap = (paths[:, anchor] + 7.0).astype(np.float32) / ds
    kw = dict(template_size=max(12, 24 // ds), search=max(16, 32 // ds),
              stride=stride, top_k=top_k)
    nat, ok = ncc_track_batch_host(clips, ap, anchor, ds=ds, prefer="native", **kw)
    assert ok.all()
    ref = np.stack([
        ncc_track_clip_parallel_np(
            clips[i, :, ::ds, ::ds], ap[i], anchor, **kw)
        for i in range(len(clips))
    ])
    np.testing.assert_allclose(nat, ref, atol=1e-4)


@pytest.mark.skipif(not native_available(), reason="libavsl_track not built")
def test_native_tracks_the_true_path():
    clips, paths = _batch()
    anchor = clips.shape[1] // 2
    ap = (paths[:, anchor] + 7.0).astype(np.float32)
    nat, ok = ncc_track_batch_host(
        clips, ap, anchor, ds=1, template_size=24, search=32, top_k=3,
        prefer="native")
    assert ok.all()
    true_center = paths + 7.0
    err = np.linalg.norm(nat - true_center, axis=-1)
    assert err.mean() < 2.0, f"mean tracking error {err.mean():.2f} px"


@pytest.mark.skipif(not native_available(), reason="libavsl_track not built")
def test_geometry_failure_reports_not_ok():
    rng = np.random.default_rng(0)
    # too small for template 32 + margin once downsampled
    clips = rng.integers(0, 256, (3, 12, 40, 40), np.uint8)
    ap = np.full((len(clips), 2), 20.0, np.float32)
    nat, ok = ncc_track_batch_host(
        clips, ap, clips.shape[1] // 2, ds=2, template_size=32, search=24,
        prefer="native")
    assert not ok.any()
    # fallback rows are the (clamped) anchor position
    assert np.isfinite(nat).all()


def test_non_uint8_input_uses_fallback():
    clips, paths = _batch(b=1)
    anchor = clips.shape[1] // 2
    ap = (paths[:, anchor] + 7.0).astype(np.float32)
    f32 = clips.astype(np.float32)
    out, ok = ncc_track_batch_host(
        f32, ap, anchor, ds=1, template_size=24, search=32)
    ref = ncc_track_clip_parallel_np(
        f32[0], ap[0], anchor, template_size=24, search=32)
    assert ok.all()
    np.testing.assert_allclose(out[0], ref, atol=1e-4)


@pytest.mark.skipif(not native_available(), reason="libavsl_track not built")
@pytest.mark.skipif(
    not __import__("os").path.exists(AMI_EXAMPLE),
    reason="AMI golden clip not mounted",
)
def test_native_statistical_parity_real_footage():
    """Real footage: OpenCV 4.6 (native) vs the pip cv2 wheel may flip
    near-tie peaks on repetitive texture; require agreement on ~all frames
    and sub-pixel smoothed deviation (the downstream consumer smooths over
    12 frames before synthesizing landmarks)."""
    from avsl_tpu.data.video_io import read_video_frames

    real = read_video_frames(AMI_EXAMPLE, grayscale=True)
    b, t = 4, 120
    h, w = real.shape[1:]
    clips = np.empty((b, t, h, w), np.uint8)
    reps = int(np.ceil(t / len(real)))
    for i in range(b):
        clips[i] = np.concatenate(
            [np.roll(real, -13 * i, axis=0)] * reps)[:t]
    rng = np.random.default_rng(0)
    ap = np.stack(
        [rng.uniform(60, 100, b), rng.uniform(60, 100, b)], -1
    ).astype(np.float32)
    kw = dict(ds=2, template_size=24, search=48, stride=3, top_k=3)
    nat, ok = ncc_track_batch_host(clips, ap, t // 2, prefer="native", **kw)
    assert ok.all()
    ref = np.stack([
        ncc_track_clip_parallel_np(
            clips[i, :, ::2, ::2], ap[i], t // 2, template_size=24,
            search=48, stride=3, top_k=3)
        for i in range(b)
    ])
    per_frame = np.linalg.norm(nat - ref, axis=-1)  # [B, T]
    agree = (per_frame <= 1.0).mean()
    assert agree >= 0.97, f"only {agree:.1%} of frames agree within 1 px"
    sm_d = np.abs(
        np.stack([smooth_landmarks(nat[i], 12) for i in range(b)])
        - np.stack([smooth_landmarks(ref[i], 12) for i in range(b)])
    )
    assert sm_d.max() <= 1.0, f"smoothed deviation {sm_d.max():.2f} px"


def test_auto_prefers_cv2_wheel_and_matches_twin():
    """prefer="auto" with the cv2 wheel importable must route to the
    python twin (the faster backend on this image: OpenCV 5.0 wheel vs
    the 4.6 system lib the .so links) and therefore match it exactly."""
    import avsl_tpu.data.track_host as th

    if not th._HAS_CV2:
        pytest.skip("cv2 wheel unavailable")
    clips, paths = _batch(b=2)
    anchor = clips.shape[1] // 2
    ap = (paths[:, anchor] + 7.0).astype(np.float32)
    auto, ok = ncc_track_batch_host(
        clips, ap, anchor, ds=1, template_size=24, search=32, top_k=3)
    assert ok.all()
    ref = np.stack([
        ncc_track_clip_parallel_np(
            clips[i], ap[i], anchor, template_size=24, search=32, top_k=3)
        for i in range(len(clips))
    ])
    np.testing.assert_array_equal(auto, ref)

"""BatchedMotionDetector (device-map path) vs the numpy detector."""

import os

import numpy as np
import pytest

from avsl_tpu.data.landmarks import BatchedMotionDetector, MotionEnergyDetector

AMI_EXAMPLE = "/root/reference/examples/ami/EN2001a-A-21.39-25.86-video.mp4"


def _synthetic_clip(t=60, h=120, w=160, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 200, (h, w)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    clip = np.empty((t, h, w), np.uint8)
    for i in range(t):
        jitter = 5 * np.sin(i / 5)
        face = 90 * np.exp(-(((xx - 80 - jitter) / 25.0) ** 2 + ((yy - 55) / 32.0) ** 2))
        clip[i] = np.clip(base + face, 0, 255).astype(np.uint8)
    return clip


def test_batched_matches_numpy_on_synthetic():
    clip = _synthetic_clip()
    ref = MotionEnergyDetector()(clip)
    got = BatchedMotionDetector()(clip[None])[0]
    ri = {i for i, l in enumerate(ref) if l is not None}
    gi = {i for i, l in enumerate(got) if l is not None}
    common = sorted(ri & gi)
    assert common, (ri, gi)
    for i in common:
        assert np.abs(ref[i] - got[i]).max() < 6.0


def test_batched_handles_batch_dim():
    clips = np.stack([_synthetic_clip(seed=0), _synthetic_clip(seed=1)])
    out = BatchedMotionDetector()(clips)
    assert len(out) == 2
    for per in out:
        assert len(per) == clips.shape[1]
        assert any(l is not None for l in per)


def test_batched_downsample_scales_back():
    clip = _synthetic_clip(h=128, w=160)
    full = BatchedMotionDetector(downsample=1)(clip[None])[0]
    half = BatchedMotionDetector(downsample=2)(clip[None])[0]
    fi = [i for i, l in enumerate(full) if l is not None]
    hi = [i for i, l in enumerate(half) if l is not None]
    common = sorted(set(fi) & set(hi))
    assert common
    for i in common:
        # coordinates in full-resolution space for both
        assert np.abs(full[i] - half[i]).max() < 14.0


@pytest.mark.skipif(not os.path.exists(AMI_EXAMPLE), reason="AMI example not mounted")
def test_batched_on_real_clip():
    from avsl_tpu.data.lip_roi import extract_lip_clip
    from avsl_tpu.data.video_io import read_video_frames

    frames = read_video_frames(AMI_EXAMPLE, grayscale=True)
    lms = BatchedMotionDetector()(frames[None])[0]
    clip = extract_lip_clip(frames, lms)
    assert clip is not None and clip.shape[1:] == (96, 96)


def test_ncc_tracker_follows_moving_patch():
    """Synthetic: a textured patch translating across frames; the tracker
    must follow it within a couple of pixels."""
    import jax.numpy as jnp

    from avsl_tpu.kernels.track import ncc_track_clip

    rng = np.random.default_rng(0)
    patch = rng.uniform(0, 255, (30, 30)).astype(np.float32)
    t, h, w = 20, 160, 200
    frames = rng.uniform(0, 40, (t, h, w)).astype(np.float32)
    xs = (80 + 2.0 * np.arange(t)).astype(int)
    ys = (70 + 1.0 * np.arange(t)).astype(int)
    for i in range(t):
        frames[i, ys[i] - 15 : ys[i] + 15, xs[i] - 15 : xs[i] + 15] = patch

    track = np.asarray(
        ncc_track_clip(jnp.asarray(frames), jnp.asarray([80.0, 70.0]),
                       template_size=30, search=10)
    )
    assert track.shape == (t, 2)
    err = np.abs(track - np.stack([xs, ys], axis=1))
    assert err[2:].max() <= 3, err.max()


def test_batched_detector_track_mode():
    clips = np.stack([_synthetic_clip(seed=0), _synthetic_clip(seed=1)])
    out = BatchedMotionDetector(track=True, track_template=24, track_search=10)(clips)
    for per in out:
        # track mode emits landmarks for EVERY frame
        assert all(l is not None for l in per)
        centers = np.stack([l[48:68].mean(axis=0) for l in per])
        # bounded jitter frame to frame
        assert np.abs(np.diff(centers, axis=0)).max() < 25


def test_cnn_detector_accurate_on_synthetic_domain():
    """The shipped synthetic-pretrained weights localize procedural faces
    to a few pixels (its training domain). Real-face transfer is the
    documented round-2 gap; the motion detector remains the default."""
    import os

    from avsl_tpu.data.landmarks import DEFAULT_CNN_WEIGHTS, CNNLandmarkDetector
    from avsl_tpu.data.synthetic_faces import generate_dataset

    if not os.path.exists(DEFAULT_CNN_WEIGHTS):
        import pytest

        pytest.skip("trained weights not present")
    imgs, lms = generate_dataset(16, seed=123)
    det = CNNLandmarkDetector()
    pred = det(imgs)
    errs = [np.abs(p - l * 128).mean() for p, l in zip(pred, lms)]
    assert np.mean(errs) < 6.0, np.mean(errs)


def test_parallel_tracker_matches_scan_tracker():
    """The scan-free batched-conv tracker must follow the same moving
    patch as the sequential tracker (VERDICT round-2 item 8: a
    compile-friendly formulation for backends where dynamic-slice-inside-
    scan compiles pathologically)."""
    import jax.numpy as jnp

    from avsl_tpu.kernels.track import (
        ncc_track_clip_anchored,
        ncc_track_clip_parallel,
    )

    rng = np.random.default_rng(1)
    patch = rng.uniform(0, 255, (30, 30)).astype(np.float32)
    t, h, w = 24, 220, 280
    frames = rng.uniform(0, 40, (t, h, w)).astype(np.float32)
    xs = (100 + 3.0 * np.arange(t)).astype(int)  # 69 px total travel
    ys = (110 + 1.0 * np.arange(t)).astype(int)
    for i in range(t):
        frames[i, ys[i] - 15: ys[i] + 15, xs[i] - 15: xs[i] + 15] = patch

    anchor = t // 2
    pos = jnp.asarray([float(xs[anchor]), float(ys[anchor])])
    par = np.asarray(
        ncc_track_clip_parallel(
            jnp.asarray(frames), pos, anchor, template_size=30, search=60
        )
    )
    seq = np.asarray(
        ncc_track_clip_anchored(
            jnp.asarray(frames), pos, anchor, template_size=30, search=12
        )
    )
    truth = np.stack([xs, ys], axis=1)
    assert np.abs(par - truth).max() <= 3, np.abs(par - truth).max()
    assert np.abs(seq - truth).max() <= 3
    np.testing.assert_allclose(par, seq, atol=3)


def test_track_refine_parallel_stage():
    """The lip-pipeline stage contract: same signature/outputs as
    track_refine, and the refined trajectory follows a face the window
    detector under-tracks."""
    import jax.numpy as jnp

    from avsl_tpu.kernels.lip_pipeline import make_staged_lip_frontend

    t, h, w = 40, 144, 176
    stages = make_staged_lip_frontend(t, detect_ds=1)
    rng = np.random.default_rng(2)
    frames = rng.uniform(0, 40, (1, t, h, w)).astype(np.float32)
    patch = rng.uniform(100, 255, (24, 24)).astype(np.float32)
    xs = (60 + 1.5 * np.arange(t)).astype(int)
    for i in range(t):
        frames[0, i, 58: 82, xs[i] - 12: xs[i] + 12] = patch

    base_traj = jnp.tile(
        jnp.asarray([[float(xs[t // 2]), 70.0]]), (t, 1)
    )[None]
    face_w = jnp.asarray([60.0])
    det_ok = jnp.asarray([1.0])
    traj2, fw2, ok2 = stages["track_refine_parallel"](
        jnp.asarray(frames), base_traj, face_w, det_ok
    )
    assert traj2.shape == (1, t, 2)
    got = np.asarray(traj2[0, :, 0])
    # smoothed trajectory tracks the moving patch direction
    assert got[-1] - got[0] > 0.5 * (xs[-1] - xs[0])


@pytest.mark.skipif(
    not os.path.exists("/root/reference/examples/ami/EN2001a-A-21.39-25.86-video.mp4"),
    reason="AMI example not mounted",
)
def test_cnn_detector_localizes_mouth_on_real_footage():
    """The shipped CNN weights are fine-tuned on real frames pseudo-
    labeled by the RefinedMouthTracker (cli/train_landmarks --pseudo_video;
    VERDICT round-2 item 1). On the real AMI clip the CNN's single-shot
    batched prediction must land near the tracker's refined trajectory —
    round-2's synthetic-only weights failed this by design."""
    from avsl_tpu.data.landmarks import CNNLandmarkDetector
    from avsl_tpu.data.lip_refine import RefinedMouthTracker
    from avsl_tpu.data.video_io import read_video_frames

    frames = read_video_frames(
        "/root/reference/examples/ami/EN2001a-A-21.39-25.86-video.mp4",
        grayscale=True,
    )
    ref_lms = RefinedMouthTracker()(frames)
    ref_cen = np.array([l[48:68].mean(axis=0) for l in ref_lms])
    ref_eye = np.array([l[45, 0] - l[36, 0] for l in ref_lms])

    cnn = CNNLandmarkDetector()
    lms = cnn(frames)
    cen = np.array([l[48:68].mean(axis=0) for l in lms])
    eye = np.array([l[45, 0] - l[36, 0] for l in lms])

    err = np.abs(cen - ref_cen).mean(axis=0)
    assert err[0] < 14 and err[1] < 10, err
    # scale agreement: median eye-span ratio within 30%
    ratio = np.median(eye) / np.median(ref_eye)
    assert 0.7 < ratio < 1.3, ratio


def test_parallel_tracker_tracks_near_edge_targets():
    """An anchor near the frame edge must still be trackable: the old
    half+search clamp shifted the template up to `search` px off the
    target, so a mouth low in frame could never be reached."""
    import numpy as np

    from avsl_tpu.kernels.track import ncc_track_clip_parallel

    rng = np.random.default_rng(0)
    T, H, W = 8, 144, 176
    ts, search = 24, 32
    frames = rng.integers(40, 90, (T, H, W)).astype(np.float32)
    # distinctive blob LOW in the frame (y near H - ts/2 - margin)
    true_y, true_x = H - 20, W // 2
    yy, xx = np.mgrid[0:H, 0:W]
    for t in range(T):
        cy = true_y - t  # slight upward drift
        frames[t] += 120 * np.exp(
            -(((xx - true_x) / 5.0) ** 2 + ((yy - cy) / 5.0) ** 2)
        )
    pos = np.asarray(ncc_track_clip_parallel(
        frames, np.asarray([true_x, true_y], np.float32), anchor=0,
        template_size=ts, search=search,
    ))
    for t in range(T):
        assert abs(pos[t, 0] - true_x) <= 3, (t, pos[t])
        assert abs(pos[t, 1] - (true_y - t)) <= 3, (t, pos[t])

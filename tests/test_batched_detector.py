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

"""Held-out landmark validation (VERDICT r3 item 4).

The golden pair (EN2001a) is both the validation set and the tuning
source for the landmark stack — so this module measures how the
pipeline degrades UNDER PERTURBATION of that footage (6 families:
geometric, photometric, noise, occlusion, temporal, mirror), with the
same transform applied to the dlib golden where it changes geometry.
Floors sit under the measured values (2026-08, RefinedMouthTracker +
extract_lip_clip, mean best-shift NCC sampled every 5th frame):

    baseline 0.892 | hflip 0.843 | scale1.2 0.881 | gamma0.6 0.867 |
    gamma1.6 0.852 (0.490 before auto photometric normalization) |
    dark-50 0.570 (0.404 before) | noise s=8 0.514 | occlusion
    corner/forehead 0.794/0.888 | temporal subsample x2 0.543 |
    translate+border 0.478

The weak families (translation with a synthetic zero border, heavy
noise, half frame rate, hard under-exposure) are pinned at their
honest floors — they are known limitations, not hidden ones. Plus
cross-detector agreement (RefinedMouthTracker vs CNN vs the host
cropper's NCC tracker) as an overfit proxy: independent estimators
agreeing on held-out-style variation is evidence the 0.89 is not an
EN2001a memorization.
"""

import os

import numpy as np
import pytest

from avsl_tpu.data.lip_refine import RefinedMouthTracker
from avsl_tpu.data.lip_roi import extract_lip_clip

AMI_EXAMPLE = "/root/reference/examples/ami/EN2001a-A-21.39-25.86-video.mp4"
AMI_GOLDEN_LIP = (
    "/root/reference/examples/ami/EN2001a-A-21.39-25.86-lip_video.mp4"
)

pytestmark = pytest.mark.skipif(
    not (os.path.exists(AMI_EXAMPLE) and os.path.exists(AMI_GOLDEN_LIP)),
    reason="AMI golden pair not mounted",
)


@pytest.fixture(scope="module")
def pair():
    from avsl_tpu.data.video_io import read_video_frames

    frames = read_video_frames(AMI_EXAMPLE, grayscale=True)
    gold = read_video_frames(AMI_GOLDEN_LIP, grayscale=True)
    return frames, gold


def _score(src, gold):
    from test_lip_roi import _ncc_best_shift

    clip = extract_lip_clip(src, RefinedMouthTracker()(src))
    assert clip is not None, "pipeline returned no clip under perturbation"
    n = min(len(clip), len(gold))
    return float(np.mean(
        [_ncc_best_shift(clip[t], gold[t]) for t in range(0, n, 5)]
    ))


def test_mirror(pair):
    frames, gold = pair
    s = _score(frames[:, :, ::-1].copy(), gold[:, :, ::-1].copy())
    assert s >= 0.75, f"hflip NCC {s:.3f}"


def test_geometric_scale(pair):
    import cv2

    frames, gold = pair
    t, h, w = frames.shape
    big = np.stack(
        [cv2.resize(f, (int(w * 1.2), int(h * 1.2))) for f in frames]
    )
    s = _score(big, gold)
    assert s >= 0.78, f"1.2x scale NCC {s:.3f}"


def test_geometric_translate_with_border(pair):
    frames, gold = pair
    shifted = np.zeros_like(frames)
    shifted[:, 20:, 30:] = frames[:, :-20, :-30]
    s = _score(shifted, gold)
    # known limitation: the synthetic zero border skews the silhouette
    # stages; the floor pins the honest level, not a rosy one
    assert s >= 0.35, f"translate+border NCC {s:.3f}"


def test_photometric_gamma_and_exposure(pair):
    frames, gold = pair
    g06 = np.clip(255 * (frames / 255.0) ** 0.6, 0, 255).astype(np.uint8)
    assert _score(g06, gold) >= 0.78
    # gamma-crush and under-exposure: auto photometric normalization
    # (RefinedMouthTracker.photometric_normalize) recovers these
    g16 = np.clip(255 * (frames / 255.0) ** 1.6, 0, 255).astype(np.uint8)
    assert _score(g16, gold) >= 0.75
    dark = np.clip(frames.astype(np.int16) - 50, 0, 255).astype(np.uint8)
    assert _score(dark, gold) >= 0.45


def test_photometric_norm_is_what_saves_gamma(pair):
    """The auto normalization must be the active ingredient: with it
    forced off, gamma-crushed footage collapses (0.49 measured)."""
    frames, gold = pair
    from test_lip_roi import _ncc_best_shift

    g16 = np.clip(255 * (frames / 255.0) ** 1.6, 0, 255).astype(np.uint8)
    clip = extract_lip_clip(
        g16, RefinedMouthTracker(photometric="off")(g16)
    )
    n = min(len(clip), len(gold))
    s_off = float(np.mean(
        [_ncc_best_shift(clip[t], gold[t]) for t in range(0, n, 5)]
    ))
    assert s_off < 0.65, (
        f"photometric=off scores {s_off:.3f} on gamma-1.6 footage — the "
        "normalization is no longer the active ingredient (update floors)"
    )


def test_noise(pair):
    frames, gold = pair
    rng = np.random.default_rng(0)
    noisy = np.clip(
        frames.astype(np.float32) + rng.normal(0, 8, frames.shape), 0, 255
    ).astype(np.uint8)
    s = _score(noisy, gold)
    assert s >= 0.40, f"sigma-8 noise NCC {s:.3f}"  # known limitation


def test_occlusion(pair):
    frames, gold = pair
    occ = frames.copy()
    occ[:, :60, :90] = 0  # corner block
    assert _score(occ, gold) >= 0.70
    occ2 = frames.copy()
    occ2[:, 40:80, 140:220] = 0  # forehead band
    assert _score(occ2, gold) >= 0.80


def test_temporal_subsample(pair):
    frames, gold = pair
    s = _score(frames[::2].copy(), gold[::2].copy())
    assert s >= 0.45, f"half-frame-rate NCC {s:.3f}"  # known limitation


def test_cross_detector_agreement(pair):
    """Independent estimators (refined tracker, CNN regressor, the host
    cropper's NCC tracker) agree on the mouth trajectory — an overfit
    proxy: a detector memorizing EN2001a would not be matched by
    differently-constructed ones. Measured medians: RMT-CNN 14.8 px on a
    ~200 px face; RMT-host within the tracker family's spread."""
    from avsl_tpu.data.landmarks import CNNLandmarkDetector
    from avsl_tpu.infer.host_crops import HostLipCropper

    frames, _gold = pair

    def mouth(lms_list):
        return np.asarray([
            l[48:68].mean(0) if l is not None else [np.nan, np.nan]
            for l in lms_list
        ], np.float64)

    rmt = mouth(RefinedMouthTracker()(frames))
    cnn = mouth(CNNLandmarkDetector()(frames))
    both = np.isfinite(rmt).all(1) & np.isfinite(cnn).all(1)
    assert both.sum() >= 80
    d_cnn = float(np.median(np.linalg.norm((rmt - cnn)[both], axis=1)))
    assert d_cnn < 25.0, f"RMT-CNN median mouth distance {d_cnn:.1f} px"

    lms_host, ok = HostLipCropper(mode="track").landmarks(frames[None])
    assert bool(ok[0])
    host = lms_host[0][:, 48:68].mean(axis=1).astype(np.float64)
    d_host = float(np.median(np.linalg.norm(rmt[both] - host[both], axis=1)))
    assert d_host < 30.0, f"RMT-host median mouth distance {d_host:.1f} px"

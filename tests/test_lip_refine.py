"""Unit tests for the refined mouth tracker (data/lip_refine.py).

Synthetic faces with exactly-known geometry: a skin-toned head on a dark
background, a thin dark inter-lip line, a competing under-lip/chin crease
and a nose shadow — the attractors that defeat a pure darkness search on
real AMI footage. The golden-pair integration test lives in
test_lip_roi.py (reference fixture required)."""

import numpy as np
import pytest

from avsl_tpu.data.lip_refine import (
    CANON_FACE_WIDTH_AT_MOUTH,
    RefinedMouthTracker,
    RefinerConfig,
    face_width_at,
    lip_opening,
    sandwich_best_x,
    sandwich_y_candidates,
    skin_reference,
)

SKIN = 150.0
BG = 60.0


def synth_face_frame(
    h=240, w=320, cx=160.0, cy=150.0, face_w=80.0,
    opening=3.0, noise_rng=None,
):
    """Head ellipse of skin tone; mouth = dark line at (cx, cy); chin
    crease 14 px below; nose shadow 16 px above. (cx, cy) is the mouth."""
    f = np.full((h, w), BG, np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    head_cy = cy - 0.55 * face_w
    head = ((xx - cx) / (0.62 * face_w)) ** 2 + ((yy - head_cy) / (0.85 * face_w)) ** 2 < 1
    f[head] = SKIN
    mouth_w = 0.45 * face_w
    line = (np.abs(yy - cy) <= opening / 2) & (np.abs(xx - cx) <= mouth_w / 2)
    f[line] = 70.0
    crease = (np.abs(yy - (cy + 14)) <= 1) & (np.abs(xx - cx) <= 0.3 * face_w)
    f[crease & head] = 110.0
    shadow = (np.abs(yy - (cy - 16)) <= 1) & (np.abs(xx - cx) <= 0.2 * face_w)
    f[shadow & head] = 115.0
    if noise_rng is not None:
        f = f + noise_rng.normal(0, 2.0, f.shape).astype(np.float32)
    return np.clip(f, 0, 255)


def test_skin_reference_and_face_width():
    rng = np.random.default_rng(0)
    frame = synth_face_frame(noise_rng=rng)
    centers = np.array([[160.0, 150.0]])
    ref = skin_reference([frame], centers, w_guess=80.0)
    assert abs(ref - SKIN) < 10
    w = face_width_at(frame, 160.0, 150.0, ref, w_guess=80.0)
    # head ellipse half-width at mouth height (0.55 fw below center):
    # 0.62*fw*sqrt(1-(0.55/0.85)^2) ~ 0.47*fw per side -> ~75 px total
    assert w is not None and 60 <= w <= 92, w


def test_sandwich_picks_lip_line_over_crease_and_shadow():
    rng = np.random.default_rng(1)
    frame = synth_face_frame(noise_rng=rng)
    # start the scan from a chin-biased guess (the real failure mode)
    cands = sandwich_y_candidates(frame, 160.0, 150.0 + 15, 80.0)
    assert cands, "no candidates found"
    assert abs(cands[0][0] - 150) <= 2, f"picked y={cands[0][0]}, want 150"


def test_sandwich_best_x_centers_on_mouth():
    rng = np.random.default_rng(2)
    frame = synth_face_frame(noise_rng=rng)
    bx, bs = sandwich_best_x(frame, 160.0 + 8, 150.0, 80.0)
    assert bx is not None and bs > 5
    assert abs(bx - 160) <= 3, bx


def test_lip_opening_responds():
    rng = np.random.default_rng(3)
    closed = synth_face_frame(opening=2.0, noise_rng=rng)
    open_ = synth_face_frame(opening=9.0, noise_rng=rng)
    t_closed, c1 = lip_opening(closed, 160.0, 150.0, 80.0)
    t_open, c2 = lip_opening(open_, 160.0, 150.0, 80.0)
    assert c1 > 1 and c2 > 1
    assert t_open > t_closed + 3, (t_closed, t_open)


def test_refined_tracker_follows_translating_face():
    """End-to-end: face translates 40 px; the tracker's landmarks must
    follow the mouth and carry a face-scale within ~20% of truth."""
    rng = np.random.default_rng(4)
    T = 40
    true_cx = np.linspace(140, 180, T)
    frames = np.stack([
        synth_face_frame(cx=true_cx[t], cy=150.0, face_w=80.0,
                         opening=3.0 + 2.5 * np.sin(t / 3.0), noise_rng=rng)
        for t in range(T)
    ]).astype(np.uint8)
    det = RefinedMouthTracker()
    lms = det(frames)
    assert all(l is not None for l in lms)
    centers = np.array([l[48:68].mean(axis=0) for l in lms])
    err_x = np.abs(centers[:, 0] - true_cx)
    err_y = np.abs(centers[:, 1] - 150.0)
    assert err_x.mean() < 6, f"x err {err_x.mean():.1f}"
    assert err_y.mean() < 6, f"y err {err_y.mean():.1f}"
    # scale: implied face width from the emitted layout (outer-eye span is
    # 90/156 of face width in the canonical layout)
    eye_span = np.array([l[45, 0] - l[36, 0] for l in lms])
    face_w = eye_span * 156.0 / 90.0
    # truth: head-ellipse width at mouth row ~75 px maps to canonical 120
    implied = face_w.mean() * CANON_FACE_WIDTH_AT_MOUTH / 156.0
    assert 55 <= implied <= 95, implied
    # articulation: inner-lip gap must vary with the synthetic opening
    inner_gap = np.array([np.ptp(l[60:68, 1]) for l in lms])
    assert inner_gap.max() > inner_gap.min() * 1.3, (
        inner_gap.min(), inner_gap.max())


def test_refined_tracker_falls_back_without_face():
    """Pure-noise clip: must not crash; returns per-frame layouts or the
    anchored-tracker fallback (both are lists of len T)."""
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (12, 120, 160)).astype(np.uint8)
    det = RefinedMouthTracker()
    out = det(frames)
    assert len(out) == 12

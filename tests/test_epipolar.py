"""Two-view geometry tests: essential RANSAC, pose recovery,
triangulation, Lie utilities."""

import numpy as np
import numpy.random as _np_rng_mod
import pytest

from sift_tpu.geometry import lie
from sift_tpu.geometry.epipolar import find_essential_ransac
from sift_tpu.geometry.triangulation import (triangulate,
                                             reprojection_error)


def _two_view_case(rng, n=300, outlier_frac=0.3, noise=5e-4):
    """Synthetic rig: points in front of two cameras, normalized coords."""
    w = np.array([0.1, -0.25, 0.07])
    r = np.asarray(lie.so3_exp(w))
    t = np.array([0.6, -0.1, 0.12])
    t /= np.linalg.norm(t)
    x = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(4, 10, n)], axis=1)
    p0 = x[:, :2] / x[:, 2:3]
    x1 = x @ r.T + t
    p1 = x1[:, :2] / x1[:, 2:3]
    p0 = (p0 + rng.normal(0, noise, p0.shape)).astype(np.float32)
    p1 = (p1 + rng.normal(0, noise, p1.shape)).astype(np.float32)
    n_out = int(n * outlier_frac)
    idx = rng.choice(n, n_out, replace=False)
    p1[idx] = rng.uniform(-0.5, 0.5, (n_out, 2)).astype(np.float32)
    is_in = np.ones(n, bool)
    is_in[idx] = False
    return r, t, x, p0, p1, is_in


def test_so3_roundtrip(rng):
    for _ in range(5):
        w = rng.normal(0, 1, 3)
        r = np.asarray(lie.so3_exp(w))
        assert np.allclose(r @ r.T, np.eye(3), atol=1e-6)
        w2 = np.asarray(lie.so3_log(r))
        np.testing.assert_allclose(w2, w, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_essential_ransac_recovers_pose(rng):
    r_true, t_true, x, p0, p1, is_in = _two_view_case(rng)
    res = find_essential_ransac(p0, p1, threshold=2e-3)
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    assert inl[is_in].mean() > 0.95
    assert inl[~is_in].mean() < 0.05
    # rotation within a degree, translation direction within ~1 deg
    r_err = np.asarray(lie.so3_log(np.asarray(res.R).T @ r_true))
    assert np.linalg.norm(r_err) < np.deg2rad(1.0), r_err
    cos = abs(float(np.dot(np.asarray(res.t), t_true)))
    assert cos > np.cos(np.deg2rad(2.0)), cos


@pytest.mark.slow
def test_five_point_minimal_solver_exact():
    """Noise-free 5-point samples must contain the true essential
    matrix among the candidate set."""
    from sift_tpu.geometry.fivepoint import essential_candidates_5pt
    rng = np.random.default_rng(7)   # own rng: order-independent draws
    for _ in range(4):
        w = rng.normal(0, 0.3, 3)
        r = np.asarray(lie.so3_exp(w))
        t = rng.normal(0, 1, 3)
        t /= np.linalg.norm(t)
        x = np.stack([rng.uniform(-2, 2, 5), rng.uniform(-2, 2, 5),
                      rng.uniform(4, 10, 5)], 1)
        p0 = (x[:, :2] / x[:, 2:3]).astype(np.float32)
        x1 = x @ r.T + t
        p1 = (x1[:, :2] / x1[:, 2:3]).astype(np.float32)
        es, ok = essential_candidates_5pt(p0, p1)
        es, ok = np.asarray(es), np.asarray(ok)
        assert ok.sum() >= 1
        e_true = np.asarray(lie.hat(t)) @ r
        e_true /= np.linalg.norm(e_true)
        err = min(min(np.abs(e - e_true).max(), np.abs(e + e_true).max())
                  for e, o in zip(es, ok) if o)
        # f32 pipeline: ~1e-3 noise floor; RANSAC scoring + the LO
        # refit close the rest
        assert err < 5e-3, err


@pytest.mark.slow
def test_five_point_beats_eight_point_at_low_inlier_ratio():
    """At 50% outliers with a small hypothesis budget, the 5-point
    minimal sample's higher contamination survival (0.5^5 vs 0.5^8)
    must recover at least the 8-point path's inlier set (the round-2
    verdict's robustness criterion)."""
    rng = np.random.default_rng(11)  # own rng: order-independent draws
    wins_5 = wins_8 = 0
    for trial in range(3):
        r_true, t_true, x, p0, p1, is_in = _two_view_case(
            rng, n=240, outlier_frac=0.5)
        n5 = find_essential_ransac(p0, p1, threshold=2e-3,
                                   n_hypotheses=256, seed=trial,
                                   solver="5pt").n_inliers
        n8 = find_essential_ransac(p0, p1, threshold=2e-3,
                                   n_hypotheses=256, seed=trial,
                                   solver="8pt").n_inliers
        wins_5 += int(np.asarray(n5))
        wins_8 += int(np.asarray(n8))
    assert wins_5 >= wins_8, (wins_5, wins_8)
    assert wins_5 >= 3 * 0.9 * int(is_in.sum())  # near-full recovery


def test_triangulation_recovers_points(rng):
    r_true, t_true, x, p0, p1, is_in = _two_view_case(
        rng, outlier_frac=0.0, noise=0.0)
    pts = np.asarray(triangulate(np.eye(3, dtype=np.float32),
                                 np.zeros(3, np.float32),
                                 r_true.astype(np.float32),
                                 t_true.astype(np.float32), p0, p1))
    np.testing.assert_allclose(pts, x, rtol=1e-3, atol=1e-3)
    err = np.asarray(reprojection_error(
        r_true.astype(np.float32), t_true.astype(np.float32), pts, p1))
    assert err.max() < 1e-4


import pytest as _pytest


@_pytest.fixture(scope="module")
def rng():
    """Module-local deterministic rng: the session-wide rng made test
    outcomes depend on which other modules ran first."""
    return _np_rng_mod.default_rng(0)

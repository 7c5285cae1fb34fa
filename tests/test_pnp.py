"""PnP RANSAC tests."""

import numpy as np
import numpy.random as _np_rng_mod

from sift_tpu.geometry import lie
from sift_tpu.geometry.pnp import pnp_ransac


def _case(rng, n=200, outlier_frac=0.3, noise=5e-4):
    w = np.array([0.2, -0.1, 0.3])
    r = np.asarray(lie.so3_exp(w))
    t = np.array([0.4, -0.2, 0.5])
    x = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                  rng.uniform(5, 10, n)], 1)
    xc = x @ r.T + t
    p = xc[:, :2] / xc[:, 2:3]
    p = (p + rng.normal(0, noise, p.shape)).astype(np.float32)
    n_out = int(n * outlier_frac)
    idx = rng.choice(n, n_out, replace=False)
    p[idx] += rng.uniform(0.05, 0.2, (n_out, 2))
    is_in = np.ones(n, bool)
    is_in[idx] = False
    return r, t, x.astype(np.float32), p, is_in


def test_pnp_recovers_pose(rng):
    r_true, t_true, x, p, is_in = _case(rng)
    res = pnp_ransac(x, p, threshold=2e-3)
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    assert inl[is_in].mean() > 0.95
    assert inl[~is_in].mean() < 0.05
    r_err = np.asarray(lie.so3_log(np.asarray(res.R).T @ r_true))
    assert np.linalg.norm(r_err) < np.deg2rad(0.5)
    # z-translation is weakly constrained at depth ~5-10 with this
    # noise (CRLB ~ noise * depth^2 / lateral spread ~ 0.01-0.02)
    assert np.linalg.norm(np.asarray(res.t) - t_true) < 0.03


def test_pnp_respects_validity(rng):
    r_true, t_true, x, p, is_in = _case(rng, outlier_frac=0.0)
    valid = np.ones(len(x), bool)
    valid[150:] = False
    p2 = p.copy()
    p2[150:] = 10.0  # garbage in masked-out region
    res = pnp_ransac(x, p2, valid=np.asarray(valid))
    assert bool(res.ok)
    assert not np.asarray(res.inliers)[150:].any()
    assert np.linalg.norm(np.asarray(res.t) - t_true) < 5e-3


def test_pnp_planar_scene(rng):
    """Coplanar maps (walls, floors) break the 6-point DLT's 12x12
    system; the planar homography-decomposition hypothesis must carry
    the solve (round-3 regression: all-planar PnP returned 0 inliers,
    stalling incremental registration in the corner-scene pipeline)."""
    w = np.array([0.1, -0.2, 0.15])
    r = np.asarray(lie.so3_exp(w))
    t = np.array([0.3, -0.1, 0.4])
    n = 60
    # points exactly on the z=6 world plane
    x = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  np.full(n, 6.0)], 1)
    xc = x @ r.T + t
    p = (xc[:, :2] / xc[:, 2:3]
         + rng.normal(0, 3e-4, (n, 2))).astype(np.float32)
    # 20% outliers
    idx = rng.choice(n, n // 5, replace=False)
    p[idx] += rng.uniform(0.05, 0.2, (len(idx), 2))
    res = pnp_ransac(x.astype(np.float32), p, threshold=2e-3)
    assert bool(res.ok)
    assert int(res.n_inliers) >= n - len(idx) - 3
    assert np.linalg.norm(np.asarray(res.t) - t) < 2e-2
    assert np.degrees(np.linalg.norm(
        np.asarray(lie.so3_log(res.R)) - w)) < 1.5


def test_pnp_tilted_planar_scene(rng):
    """Planar fallback must handle an arbitrary (non-axis-aligned)
    plane: the basis comes from the sample covariance, not from any
    world-axis assumption."""
    w = np.array([-0.05, 0.1, 0.2])
    r = np.asarray(lie.so3_exp(w))
    t = np.array([-0.2, 0.3, 0.2])
    n = 50
    x = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  np.zeros(n)], 1)
    x[:, 2] = 6.0 + 0.7 * x[:, 0] - 0.4 * x[:, 1]
    xc = x @ r.T + t
    p = (xc[:, :2] / xc[:, 2:3]
         + rng.normal(0, 3e-4, (n, 2))).astype(np.float32)
    res = pnp_ransac(x.astype(np.float32), p, threshold=2e-3)
    assert bool(res.ok)
    assert int(res.n_inliers) >= n - 3
    assert np.linalg.norm(np.asarray(res.t) - t) < 2e-2


import pytest as _pytest


@_pytest.fixture(scope="module")
def rng():
    """Module-local deterministic rng: the session-wide rng made test
    outcomes depend on which other modules ran first."""
    return _np_rng_mod.default_rng(0)

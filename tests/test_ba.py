"""Bundle adjustment tests on synthetic multi-view rigs."""

import numpy as np
import numpy.random as _np_rng_mod
import pytest
import jax.numpy as jnp

from sift_tpu.geometry import lie
from sift_tpu.sfm import BAProblem, bundle_adjust, reproj_rmse


def _make_rig(rng, n_cams=6, n_pts=120, noise=1e-3,
              cam_perturb=0.03, pt_perturb=0.05, drop=0.2):
    """Cameras on an arc looking at a point cloud; perturbed initial
    estimates; returns (problem, true_cams, true_pts)."""
    pts = np.stack([rng.uniform(-2, 2, n_pts), rng.uniform(-2, 2, n_pts),
                    rng.uniform(6, 12, n_pts)], axis=1)
    cams = []
    for i in range(n_cams):
        ang = (i - n_cams / 2) * 0.12
        w = np.array([0.0, ang, 0.0])
        r = np.asarray(lie.so3_exp(w))
        # camera centers spread on x; t = -R c
        center = np.array([2.0 * i / n_cams - 1.0, 0.1 * i, 0.0])
        t = -r @ center
        cams.append(np.concatenate([w, t]))
    cams = np.stack(cams)

    cam_idx, pt_idx, uv = [], [], []
    for ci in range(n_cams):
        r = np.asarray(lie.so3_exp(cams[ci, :3]))
        xc = pts @ r.T + cams[ci, 3:]
        proj = xc[:, :2] / xc[:, 2:3]
        for pi in range(n_pts):
            if rng.random() < drop:
                continue
            cam_idx.append(ci)
            pt_idx.append(pi)
            uv.append(proj[pi] + rng.normal(0, noise, 2))
    o = len(cam_idx)
    # pad observation table to a static capacity
    cap = 1 << int(np.ceil(np.log2(o)))
    pad = cap - o
    mask = np.array([True] * o + [False] * pad)
    cam_idx = np.array(cam_idx + [0] * pad, np.int32)
    pt_idx = np.array(pt_idx + [0] * pad, np.int32)
    uv = np.array(uv + [[0.0, 0.0]] * pad, np.float32)

    cams0 = cams.copy()
    cams0[1:] += rng.normal(0, cam_perturb, cams0[1:].shape)
    pts0 = pts + rng.normal(0, pt_perturb, pts.shape)
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True  # gauge: freeze the first camera
    prob = BAProblem(
        cameras=jnp.asarray(cams0, jnp.float32),
        points=jnp.asarray(pts0, jnp.float32),
        cam_idx=jnp.asarray(cam_idx), pt_idx=jnp.asarray(pt_idx),
        uv=jnp.asarray(uv), mask=jnp.asarray(mask),
        fixed_cams=jnp.asarray(fixed))
    return prob, cams, pts


def test_ba_converges(rng):
    prob, cams_true, pts_true = _make_rig(rng)
    rmse0 = float(reproj_rmse(prob))
    out = bundle_adjust(prob, iters=25, cg_iters=40)
    rmse1 = float(reproj_rmse(out))
    assert rmse0 > 5e-3, rmse0            # perturbation visible
    assert rmse1 < 1.5e-3, (rmse0, rmse1)  # back to ~noise level
    # gauge camera untouched
    np.testing.assert_array_equal(np.asarray(out.cameras[0]),
                                  np.asarray(prob.cameras[0]))


def test_ba_noiseless_exact(rng):
    prob, cams_true, pts_true = _make_rig(
        rng, noise=0.0, cam_perturb=0.02, pt_perturb=0.03, drop=0.0)
    out = bundle_adjust(prob, iters=30, cg_iters=50)
    assert float(reproj_rmse(out)) < 1e-5


def test_ba_ignores_masked_observations(rng):
    prob, _, _ = _make_rig(rng, noise=0.0)
    # poison every masked slot with garbage uv — must not change result
    bad_uv = np.asarray(prob.uv).copy()
    bad_uv[~np.asarray(prob.mask)] = 1e3
    prob_bad = prob._replace(uv=jnp.asarray(bad_uv))
    out0 = bundle_adjust(prob, iters=10, cg_iters=30)
    out1 = bundle_adjust(prob_bad, iters=10, cg_iters=30)
    np.testing.assert_allclose(np.asarray(out0.cameras),
                               np.asarray(out1.cameras), atol=1e-6)


def test_ba_robust_to_outliers(rng):
    prob, cams_true, pts_true = _make_rig(rng, noise=5e-4)
    uv = np.asarray(prob.uv).copy()
    m = np.asarray(prob.mask)
    idx = np.where(m)[0]
    bad = rng.choice(idx, size=len(idx) // 10, replace=False)
    uv[bad] += rng.uniform(0.1, 0.3, (len(bad), 2))  # gross outliers
    out = bundle_adjust(prob._replace(uv=jnp.asarray(uv)),
                        iters=30, cg_iters=40, loss="cauchy")
    # inlier-only rmse should still reach ~noise level (Huber)
    good = np.ones(len(uv), bool)
    good[bad] = False
    clean = out._replace(mask=jnp.asarray(m & good))
    assert float(reproj_rmse(clean)) < 2e-3


@pytest.mark.slow
def test_ba_sharded_matches_single(rng):
    import jax
    from sift_tpu.parallel import default_mesh
    from sift_tpu.parallel.ba import bundle_adjust_sharded
    assert len(jax.devices()) >= 8
    prob, _, _ = _make_rig(rng)
    mesh = default_mesh(8)
    out_s = bundle_adjust_sharded(prob, mesh, iters=12, cg_iters=30)
    out_1 = bundle_adjust(prob, iters=12, cg_iters=30)
    # distributed reductions reorder float sums; allow small drift
    np.testing.assert_allclose(np.asarray(out_s.cameras),
                               np.asarray(out_1.cameras),
                               rtol=5e-3, atol=5e-3)
    assert float(reproj_rmse(out_s)) < 1.5e-3


@pytest.mark.slow
def test_ba_point_sharded_matches_single(rng):
    """Map-block sharding: points partitioned across the mesh, only
    the camera system psum'd. Must converge like the dense adjuster."""
    import jax
    from sift_tpu.parallel import default_mesh
    from sift_tpu.parallel.ba import bundle_adjust_point_sharded
    assert len(jax.devices()) >= 8
    prob, _, _ = _make_rig(rng)
    mesh = default_mesh(8)
    out_s = bundle_adjust_point_sharded(prob, mesh, iters=12,
                                        cg_iters=30)
    out_1 = bundle_adjust(prob, iters=12, cg_iters=30)
    np.testing.assert_allclose(np.asarray(out_s.cameras),
                               np.asarray(out_1.cameras),
                               rtol=5e-3, atol=5e-3)
    assert float(reproj_rmse(out_s)) < 1.5e-3
    # gauge camera untouched, point ordering preserved
    np.testing.assert_array_equal(np.asarray(out_s.cameras[0]),
                                  np.asarray(prob.cameras[0]))
    assert out_s.points.shape == prob.points.shape


import pytest as _pytest


@_pytest.fixture(scope="module")
def rng():
    """Module-local deterministic rng: the session-wide rng made test
    outcomes depend on which other modules ran first."""
    return _np_rng_mod.default_rng(0)

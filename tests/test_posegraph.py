"""Pose-graph optimization: odometry drift corrected by loop closure."""

import numpy as np
import numpy.random as _np_rng_mod
import pytest
import jax.numpy as jnp

from sift_tpu.geometry import lie
from sift_tpu.sfm.posegraph import (PoseGraph, optimize_pose_graph,
                                    pose_graph_cost)
from sift_tpu.utils.metrics import ate_rmse, camera_centers


def _rel(a6, b6):
    """Ground-truth relative [w|t] of edge a->b."""
    ra = np.asarray(lie.so3_exp(jnp.asarray(a6[:3], jnp.float32)))
    rb = np.asarray(lie.so3_exp(jnp.asarray(b6[:3], jnp.float32)))
    r = ra.T @ rb
    t = ra.T @ (b6[3:] - a6[3:])
    return np.concatenate([np.asarray(lie.so3_log(jnp.asarray(
        r, jnp.float32))), t])


def test_loop_closure_fixes_drift(rng):
    # ground-truth circular trajectory
    n = 12
    poses_true = np.zeros((n, 6))
    for i in range(n):
        ang = 2 * np.pi * i / n
        poses_true[i, :3] = [0, 0, ang]
        poses_true[i, 3:] = [np.cos(ang), np.sin(ang), 0.0]

    # odometry with drift: noisy sequential relatives
    edges_i, edges_j, rels, w = [], [], [], []
    est = np.zeros((n, 6))
    est[0] = poses_true[0]  # gauge: first pose anchored to truth
    for i in range(n - 1):
        rel = _rel(poses_true[i], poses_true[i + 1])
        noisy = rel + rng.normal(0, 0.01, 6)
        edges_i.append(i); edges_j.append(i + 1)
        rels.append(noisy); w.append(1.0)
        # integrate noisy odometry for the initial estimate
        ra = np.asarray(lie.so3_exp(jnp.asarray(est[i, :3], jnp.float32)))
        rr = np.asarray(lie.so3_exp(jnp.asarray(noisy[:3], jnp.float32)))
        rb = ra @ rr
        est[i + 1, :3] = np.asarray(lie.so3_log(jnp.asarray(rb, jnp.float32)))
        est[i + 1, 3:] = est[i, 3:] + ra @ noisy[3:]
    # loop closure: exact relative from last to first
    edges_i.append(n - 1); edges_j.append(0)
    rels.append(_rel(poses_true[n - 1], poses_true[0])); w.append(4.0)

    fixed = np.zeros(n, bool); fixed[0] = True
    g = PoseGraph(
        poses=jnp.asarray(est, jnp.float32),
        edges_i=jnp.asarray(np.array(edges_i, np.int32)),
        edges_j=jnp.asarray(np.array(edges_j, np.int32)),
        rel=jnp.asarray(np.array(rels), jnp.float32),
        weight=jnp.asarray(np.array(w), jnp.float32),
        mask=jnp.ones(len(w), bool),
        fixed=jnp.asarray(fixed))

    ate0 = ate_rmse(camera_centers(est), camera_centers(poses_true),
                    align=False)
    out = optimize_pose_graph(g, iters=20)
    est_opt = np.asarray(out.poses)
    ate1 = ate_rmse(camera_centers(est_opt), camera_centers(poses_true),
                    align=False)
    assert float(pose_graph_cost(out)) < float(pose_graph_cost(g))
    assert ate1 < ate0 * 0.5, (ate0, ate1)
    assert ate1 < 0.05, ate1


@pytest.mark.slow
def test_long_chain_scales(rng):
    """O(E) normal-equation assembly: a long drifting chain with loop
    closures optimizes in unit-test time (the old whole-problem jacfwd
    built a (6E x 6V) Jacobian — quadratic in trajectory length — and
    fell over here) and reduces drift."""
    import time
    n = 400
    poses_true = np.zeros((n, 6), np.float32)
    poses_true[:, 3] = np.arange(n) * 0.25
    poses_true[:, 1] = np.sin(np.arange(n) * 0.05)
    edges_i, edges_j, rels, w = [], [], [], []
    est = np.zeros((n, 6))
    est[0] = poses_true[0]
    for i in range(n - 1):
        rel = _rel(poses_true[i], poses_true[i + 1])
        noisy = rel + rng.normal(0, 0.005, 6)
        edges_i.append(i); edges_j.append(i + 1)
        rels.append(noisy); w.append(1.0)
        ra = np.asarray(lie.so3_exp(jnp.asarray(est[i, :3], jnp.float32)))
        rr = np.asarray(lie.so3_exp(jnp.asarray(noisy[:3], jnp.float32)))
        est[i + 1, :3] = np.asarray(lie.so3_log(jnp.asarray(
            ra @ rr, jnp.float32)))
        est[i + 1, 3:] = est[i, 3:] + ra @ noisy[3:]
    for i in range(0, n - 50, 50):            # periodic loop closures
        edges_i.append(i); edges_j.append(i + 50)
        rels.append(_rel(poses_true[i], poses_true[i + 50])); w.append(4.0)
    fixed = np.zeros(n, bool); fixed[0] = True
    g = PoseGraph(
        poses=jnp.asarray(est, jnp.float32),
        edges_i=jnp.asarray(np.array(edges_i, np.int32)),
        edges_j=jnp.asarray(np.array(edges_j, np.int32)),
        rel=jnp.asarray(np.array(rels), jnp.float32),
        weight=jnp.asarray(np.array(w), jnp.float32),
        mask=jnp.ones(len(w), bool),
        fixed=jnp.asarray(fixed))
    t0 = time.perf_counter()
    out = optimize_pose_graph(g, iters=8)
    _ = np.asarray(out.poses)
    wall = time.perf_counter() - t0
    ate0 = ate_rmse(camera_centers(est), camera_centers(poses_true),
                    align=False)
    ate1 = ate_rmse(camera_centers(np.asarray(out.poses)),
                    camera_centers(poses_true), align=False)
    assert ate1 < ate0 * 0.5, (ate0, ate1)
    assert wall < 120.0, wall   # compile + 8 dense solves, CPU


def test_masked_edges_ignored(rng):
    n = 4
    poses = np.zeros((n, 6))
    poses[:, 3] = np.arange(n)
    edges_i = np.array([0, 1, 2, 0], np.int32)
    edges_j = np.array([1, 2, 3, 3], np.int32)
    rels = np.stack([_rel(poses[i], poses[j])
                     for i, j in zip(edges_i, edges_j)])
    # poison a masked edge
    rels_bad = rels.copy()
    rels_bad[3] += 100.0
    mask = np.array([True, True, True, False])
    fixed = np.zeros(n, bool); fixed[0] = True
    g = PoseGraph(jnp.asarray(poses, jnp.float32),
                  jnp.asarray(edges_i), jnp.asarray(edges_j),
                  jnp.asarray(rels_bad, jnp.float32),
                  jnp.ones(4, jnp.float32), jnp.asarray(mask),
                  jnp.asarray(fixed))
    out = optimize_pose_graph(g, iters=5)
    np.testing.assert_allclose(np.asarray(out.poses), poses, atol=1e-5)


import pytest as _pytest


@_pytest.fixture(scope="module")
def rng():
    """Module-local deterministic rng: the session-wide rng made test
    outcomes depend on which other modules ran first."""
    return _np_rng_mod.default_rng(0)

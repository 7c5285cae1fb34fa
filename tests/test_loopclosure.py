"""Loop-closure retrieval + verification on a synthetic sequence:
odometry-only matches in, geometrically verified distant-pair
closures out, and a reconstruction that uses them."""

import numpy as np
import pytest
import jax.numpy as jnp

from sift_tpu.geometry import lie
from sift_tpu.sfm.incremental import reconstruct
from sift_tpu.sfm.loopclosure import (closures_as_matches,
                                      find_loop_closures)
from sift_tpu.utils.metrics import ate_rmse, camera_centers


@pytest.fixture(scope="module")
def sequence():
    rng = np.random.default_rng(5)
    n_frames, n_pts = 10, 300
    pts = np.stack([rng.uniform(-2, 2, n_pts),
                    rng.uniform(-1.5, 1.5, n_pts),
                    rng.uniform(5, 11, n_pts)], 1)
    # true descriptors per 3-D point: sqrt-L1-normalized random
    true_desc = rng.random((n_pts, 128)).astype(np.float32) ** 2
    true_desc /= true_desc.sum(axis=1, keepdims=True)
    true_desc = np.sqrt(true_desc)

    cams = np.zeros((n_frames, 6))
    for i in range(n_frames):
        w = np.array([0.02 * i, 0.1 * (i - n_frames / 2), 0.0])
        r = np.asarray(lie.so3_exp(w))
        center = np.array([1.6 * i / n_frames - 0.8,
                           0.05 * np.sin(i), 0.05 * i])
        cams[i, :3] = w
        cams[i, 3:] = -r @ center

    kp_xy, descs, valids, kp_of_pt = [], [], [], []
    for f in range(n_frames):
        r = np.asarray(lie.so3_exp(cams[f, :3]))
        xc = pts @ r.T + cams[f, 3:]
        proj = xc[:, :2] / xc[:, 2:3]
        vis = rng.random(n_pts) > 0.25
        idx = np.where(vis)[0]
        kp = proj[idx] + rng.normal(0, 4e-4, (len(idx), 2))
        kp_xy.append(kp.astype(np.float32))
        d = true_desc[idx] + rng.normal(0, 5e-3, (len(idx), 128))
        d = np.abs(d).astype(np.float32)
        descs.append(d)
        valids.append(np.ones(len(idx), bool))
        kp_of_pt.append({int(p): k for k, p in enumerate(idx)})

    odo = {}
    for i in range(n_frames - 1):
        j = i + 1
        pairs = [(kp_of_pt[i][p], kp_of_pt[j][p])
                 for p in kp_of_pt[i] if p in kp_of_pt[j]]
        odo[(i, j)] = np.array(pairs, np.int64)
    return cams, kp_xy, descs, valids, kp_of_pt, odo


@pytest.mark.slow
def test_loop_closures_found_and_correct(sequence):
    cams, kp_xy, descs, valids, kp_of_pt, odo = sequence
    closures = find_loop_closures(descs, valids, kp_xy, min_gap=5)
    assert closures, "no loop closures detected"
    far = [c for c in closures if c.j - c.i >= 5]
    assert far
    # matched keypoint pairs must correspond to the SAME 3-D point
    for c in far:
        pt_of_kp_i = {k: p for p, k in kp_of_pt[c.i].items()}
        pt_of_kp_j = {k: p for p, k in kp_of_pt[c.j].items()}
        same = [pt_of_kp_i[a] == pt_of_kp_j[b] for a, b in c.matches]
        assert np.mean(same) > 0.95, np.mean(same)
        assert c.n_inliers >= 16


@pytest.mark.slow
def test_reconstruct_with_closures(sequence):
    cams_true, kp_xy, descs, valids, kp_of_pt, odo = sequence
    closures = find_loop_closures(descs, valids, kp_xy, min_gap=5)
    matches = dict(odo)
    matches.update(closures_as_matches(closures))
    rec = reconstruct(kp_xy, matches)
    assert rec.registered.sum() == len(kp_xy)
    est_c = camera_centers(rec.cameras[rec.registered])
    gt_c = camera_centers(cams_true[rec.registered])
    assert ate_rmse(est_c, gt_c) < 0.02
    assert rec.reproj_rmse < 2e-3

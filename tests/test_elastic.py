"""Elastic recovery: a BA worker killed mid-run must be respawned on a
shrunken device set and resume from the last checkpoint (SURVEY.md §5
— detection existed in round 2, this is the recovery unit).

Both failure modes cross a REAL process boundary: an injected fault
(worker os._exit after its first checkpoint) and an external SIGKILL.
"""

import os
import threading
import time

import numpy as np
import pytest

from sift_tpu.sfm.ba import BAProblem
from sift_tpu.sfm import checkpoint as ck
from sift_tpu.parallel.elastic import supervise_ba


def _problem(path, n_cams=8, n_pts=256, n_obs=4096, noise=0.02):
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-2, 2, n_pts), rng.uniform(-2, 2, n_pts),
                    rng.uniform(5, 11, n_pts)], 1).astype(np.float32)
    cams = np.zeros((n_cams, 6), np.float32)
    cams[:, 3] = np.linspace(-0.8, 0.8, n_cams)
    ci = rng.integers(0, n_cams, n_obs).astype(np.int32)
    pi = rng.integers(0, n_pts, n_obs).astype(np.int32)
    xc = pts[pi] + cams[ci][:, 3:]
    uv = (xc[:, :2] / xc[:, 2:3]
          + rng.normal(0, 5e-4, (n_obs, 2))).astype(np.float32)
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True
    cams0 = cams + rng.normal(0, noise, cams.shape).astype(np.float32) \
        * ~fixed[:, None]
    import jax.numpy as jnp
    prob = BAProblem(jnp.asarray(cams0), jnp.asarray(pts),
                     jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv),
                     jnp.ones(n_obs, bool), jnp.asarray(fixed))
    written = ck.save_ba(path, prob, 0)
    return prob, written


def _rmse(prob):
    from sift_tpu.sfm.ba import reproj_rmse
    return float(np.asarray(reproj_rmse(prob)))


@pytest.mark.slow
def test_injected_crash_recovers(tmp_path):
    ckdir = str(tmp_path / "ck")
    prob0, ppath = _problem(str(tmp_path / "prob"))
    final, restarts = supervise_ba(
        ppath, ckdir, total_iters=8, chunk_iters=2, n_devices=4,
        inject_crash_step=2, worker_timeout=540)
    assert restarts == 1
    out, step = ck.load_ba(final)
    assert step == 8
    assert _rmse(out) < _rmse(prob0) * 0.5


@pytest.mark.slow
def test_sigkill_recovers(tmp_path):
    ckdir = str(tmp_path / "ck2")
    prob0, ppath = _problem(str(tmp_path / "prob2"))
    killed = {"n": 0}

    def killer(p):
        if killed["n"] > 0:
            return                      # only the first incarnation
        killed["n"] += 1

        def watch():
            # wait for the first checkpoint, then SIGKILL the worker
            for _ in range(500):
                if ck.latest(ckdir) is not None:
                    time.sleep(0.2)
                    p.kill()
                    return
                time.sleep(0.1)

        threading.Thread(target=watch, daemon=True).start()

    final, restarts = supervise_ba(
        ppath, ckdir, total_iters=8, chunk_iters=2, n_devices=4,
        worker_timeout=540, on_spawn=killer)
    assert restarts >= 1
    out, step = ck.load_ba(final)
    assert step == 8
    assert _rmse(out) < _rmse(prob0) * 0.5

"""Global rotation averaging: spectral chordal solve + IRLS."""

import numpy as np
import pytest

from sift_tpu.geometry import lie
from sift_tpu.sfm.rotation_avg import average_rotations


def _random_rotations(rng, n):
    import jax.numpy as jnp
    return np.stack([np.asarray(lie.so3_exp(jnp.asarray(
        rng.normal(0, 1.0, 3), jnp.float32))) for _ in range(n)])


def _angular_err_deg(a, b):
    """Max geodesic angle between rotation sets (after none needed —
    both anchored)."""
    errs = []
    for ra, rb in zip(a, b):
        c = (np.trace(ra.T @ rb) - 1.0) / 2.0
        errs.append(np.degrees(np.arccos(np.clip(c, -1, 1))))
    return max(errs)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    n = 24
    rots = _random_rotations(rng, n)
    # anchor convention: absolute rotations relative to frame 0
    rots = np.einsum("nij,kj->nik", rots, rots[0])
    ei, ej, rel = [], [], []
    import jax.numpy as jnp
    for i in range(n):
        for j in range(i + 1, min(i + 4, n)):
            noise = np.asarray(lie.so3_exp(jnp.asarray(
                rng.normal(0, 0.01, 3), jnp.float32)))
            ei.append(i)
            ej.append(j)
            rel.append(noise @ rots[j] @ rots[i].T)
    # a few long-range edges so the graph is well-conditioned
    for i in range(0, n - 8, 5):
        ei.append(i)
        ej.append(i + 8)
        rel.append(rots[i + 8] @ rots[i].T)
    return rots, np.array(ei), np.array(ej), np.stack(rel)


def test_rotation_averaging_recovers_truth(problem):
    rots, ei, ej, rel = problem
    est = average_rotations(len(rots), ei, ej, rel, irls_rounds=0)
    assert _angular_err_deg(est, rots) < 2.0


def test_rotation_averaging_robust_to_outliers(problem):
    rng = np.random.default_rng(1)
    rots, ei, ej, rel = problem
    rel = rel.copy()
    bad = rng.choice(len(rel), size=len(rel) // 10, replace=False)
    for b in bad:
        rel[b] = _random_rotations(rng, 1)[0]     # garbage edges
    est0 = average_rotations(len(rots), ei, ej, rel, irls_rounds=0)
    est2 = average_rotations(len(rots), ei, ej, rel, irls_rounds=3)
    e0 = _angular_err_deg(est0, rots)
    e2 = _angular_err_deg(est2, rots)
    assert e2 < 3.0, (e0, e2)
    assert e2 <= e0 + 1e-6

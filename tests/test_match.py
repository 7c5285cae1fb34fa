"""Matcher tests: XLA + Pallas top-2 L1 vs the NumPy oracle
(BFMatcher NORM_L1 knnMatch k=2 + ratio 0.86, src/main.cpp:25-40)."""

import numpy as np
import numpy.random as _np_rng_mod
import pytest

from sift_tpu.oracle import cpu_sift as oracle
from sift_tpu.ops import match as m
from sift_tpu.ops.match_pallas import knn2_l1_pallas


@pytest.fixture(scope="module")
def descs(rng):
    """Synthetic sqrt-L1-normalized descriptor-like vectors."""
    def make(n):
        d = rng.random((n, 128)).astype(np.float32) ** 2
        d /= d.sum(axis=1, keepdims=True)
        return np.sqrt(d)
    return make(300), make(450)


def _oracle_knn2(q, t):
    d = np.abs(q[:, None, :] - t[None, :, :]).sum(-1)
    order = np.argsort(d, axis=1, kind="stable")
    i1 = order[:, 0]
    return i1, d[np.arange(len(q)), i1], d[np.arange(len(q)), order[:, 1]]


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_knn2_matches_oracle(descs, impl):
    q, t = descs
    if impl == "xla":
        r = m.knn2_l1_xla(q, t, tile=64 if len(q) % 64 == 0 else len(q))
    else:
        r = knn2_l1_pallas(q, t)
    i1, d1, d2 = _oracle_knn2(q, t)
    np.testing.assert_array_equal(np.asarray(r.idx), i1)
    np.testing.assert_allclose(np.asarray(r.d1), d1, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(r.d2), d2, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_train_validity_mask(descs, impl):
    q, t = descs
    t_valid = np.ones(len(t), bool)
    t_valid[::3] = False  # knock out a third of the train rows
    r = m.knn2_l1(q, t, t_valid=np.asarray(t_valid), impl=impl)
    i1, d1, _ = _oracle_knn2(q, t[t_valid])
    # map oracle indices back into the unmasked index space
    remap = np.where(t_valid)[0]
    np.testing.assert_array_equal(np.asarray(r.idx), remap[i1])
    np.testing.assert_allclose(np.asarray(r.d1), d1, rtol=2e-5, atol=2e-5)


def test_match_ratio_vs_oracle(descs):
    q, t = descs
    res = m.match_ratio(q, t, ratio=0.86, impl="xla")
    good = np.asarray(res.good)
    tidx = np.asarray(res.train_idx)
    ref = oracle.match_l1_ratio(q, t, ratio=0.86)
    ref_pairs = {(qi, ti) for qi, ti, _ in ref}
    got_pairs = {(int(i), int(tidx[i])) for i in np.where(good)[0]}
    assert got_pairs == ref_pairs


def test_match_ratio_respects_query_mask(descs):
    q, t = descs
    q_valid = np.zeros(len(q), bool)
    q_valid[:10] = True
    res = m.match_ratio(q, t, q_valid=np.asarray(q_valid))
    assert not np.asarray(res.good)[10:].any()


@pytest.mark.slow
def test_end_to_end_match_recall(small_image):
    """Detect+describe+match on a shifted crop pair; compare the good
    match set to the oracle pipeline's (BASELINE.json config-1 style)."""
    from sift_tpu import sift as jsift
    from sift_tpu.config import DEFAULT_CONFIG as CFG

    scene = small_image
    obj = small_image[24:120, 40:168]

    kps, ds = jsift.detect_and_compute(np.asarray(scene), CFG)
    kpo, do = jsift.detect_and_compute(np.asarray(obj), CFG)
    res = m.match_ratio(do, ds, q_valid=kpo.valid, t_valid=kps.valid,
                        impl="xla")

    ks_ref, ds_ref = oracle.sift_ncl(scene, CFG)
    ko_ref, do_ref = oracle.sift_ncl(obj, CFG)
    ref = oracle.match_l1_ratio(do_ref, ds_ref, ratio=0.86)
    assert len(ref) >= 10

    # count oracle matches reproduced by the TPU pipeline (by geometry:
    # both endpoints within 0.5 px of an oracle good match)
    gx = np.asarray(kps.x); gy = np.asarray(kps.y)
    ox = np.asarray(kpo.x); oy = np.asarray(kpo.y)
    good = np.where(np.asarray(res.good))[0]
    got = [(ox[q], oy[q], gx[np.asarray(res.train_idx)[q]],
            gy[np.asarray(res.train_idx)[q]]) for q in good]
    hits = 0
    for qi, ti, _ in ref:
        qr, tr = ko_ref[qi], ks_ref[ti]
        for (a, b, c, d) in got:
            if (abs(a - qr["x"]) < .5 and abs(b - qr["y"]) < .5
                    and abs(c - tr["x"]) < .5 and abs(d - tr["y"]) < .5):
                hits += 1
                break
    recall = hits / len(ref)
    assert recall >= 0.9, f"match recall {recall:.3f} over {len(ref)} ref"


import pytest as _pytest


@_pytest.fixture(scope="module")
def rng():
    """Module-local deterministic rng: the session-wide rng made test
    outcomes depend on which other modules ran first."""
    return _np_rng_mod.default_rng(0)

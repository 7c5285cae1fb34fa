"""RANSAC homography tests vs ground truth and cv2.findHomography."""

import numpy as np
import numpy.random as _np_rng_mod
import pytest

from sift_tpu.geometry import (find_homography_ransac,
                               perspective_transform)


def _make_case(rng, n=200, outlier_frac=0.4, noise=0.5):
    h_true = np.array([[0.9, 0.12, 40.0],
                       [-0.1, 1.05, -22.0],
                       [1e-4, -2e-4, 1.0]], np.float32)
    src = rng.uniform(0, 800, (n, 2)).astype(np.float32)
    ones = np.ones((n, 1), np.float32)
    p = np.concatenate([src, ones], 1) @ h_true.T
    dst = p[:, :2] / p[:, 2:3]
    dst += rng.normal(0, noise, dst.shape).astype(np.float32)
    n_out = int(n * outlier_frac)
    idx = rng.choice(n, n_out, replace=False)
    dst[idx] = rng.uniform(0, 800, (n_out, 2)).astype(np.float32)
    is_inlier = np.ones(n, bool)
    is_inlier[idx] = False
    return h_true, src, dst, is_inlier


def test_ransac_recovers_homography(rng):
    h_true, src, dst, is_in = _make_case(rng)
    res = find_homography_ransac(src, dst, threshold=3.0)
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    # recovers essentially all true inliers, almost no false ones
    assert inl[is_in].mean() > 0.97
    assert inl[~is_in].mean() < 0.05
    # reprojection error of true inliers under recovered H is small
    proj = np.asarray(perspective_transform(src[is_in], res.H))
    err = np.linalg.norm(proj - dst[is_in], axis=1)
    assert np.median(err) < 1.0


def test_ransac_respects_validity_mask(rng):
    h_true, src, dst, is_in = _make_case(rng, n=128, outlier_frac=0.2)
    # poison the masked-out tail with garbage that would dominate
    valid = np.ones(128, bool)
    valid[100:] = False
    dst[100:] = 1e6
    res = find_homography_ransac(src, dst, valid=np.asarray(valid))
    assert bool(res.ok)
    assert not np.asarray(res.inliers)[100:].any()
    proj = np.asarray(perspective_transform(src[:100][is_in[:100]], res.H))
    err = np.linalg.norm(proj - dst[:100][is_in[:100]], axis=1)
    assert np.median(err) < 1.0


def test_ransac_matches_cv2_quality(rng):
    cv2 = pytest.importorskip("cv2")
    h_true, src, dst, is_in = _make_case(rng)
    res = find_homography_ransac(src, dst, threshold=3.0)
    h_cv, mask_cv = cv2.findHomography(src, dst, cv2.RANSAC, 3.0)
    # compare corner transfer between ours and cv2's
    corners = np.array([[0, 0], [800, 0], [800, 800], [0, 800]], np.float32)
    ours = np.asarray(perspective_transform(corners, res.H))
    theirs = cv2.perspectiveTransform(corners[None], h_cv)[0]
    assert np.abs(ours - theirs).max() < 2.0
    assert int(np.asarray(res.n_inliers)) >= int(mask_cv.sum()) - 5


def test_ransac_deterministic(rng):
    _, src, dst, _ = _make_case(rng, n=100)
    r1 = find_homography_ransac(src, dst, seed=7)
    r2 = find_homography_ransac(src, dst, seed=7)
    np.testing.assert_array_equal(np.asarray(r1.H), np.asarray(r2.H))


def test_degenerate_input_flags_not_ok():
    # all points identical -> every minimal sample is singular
    src = np.ones((64, 2), np.float32) * 10
    dst = np.ones((64, 2), np.float32) * 20
    res = find_homography_ransac(src, dst)
    assert not np.asarray(res.inliers).any() or not bool(res.ok)


def test_perspective_transform_identity():
    pts = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    out = np.asarray(perspective_transform(pts, np.eye(3)))
    np.testing.assert_allclose(out, pts, atol=1e-6)


import pytest as _pytest


@_pytest.fixture(scope="module")
def rng():
    """Module-local deterministic rng: the session-wide rng made test
    outcomes depend on which other modules ran first."""
    return _np_rng_mod.default_rng(0)

"""Golden tests: JAX detection pipeline vs the NumPy oracle twin."""

import numpy as np
import pytest

from sift_tpu.config import DEFAULT_CONFIG as CFG
from sift_tpu.oracle import cpu_sift as oracle
from sift_tpu import sift as jsift


@pytest.fixture(scope="module")
def oracle_result(small_image):
    gpyr = oracle.build_gaussian_pyramid(small_image, CFG)
    dog = oracle.build_dog_pyramid(gpyr, CFG)
    kpts = oracle.find_scale_space_extrema(gpyr, dog, CFG)
    desc = oracle.calc_descriptors(gpyr, kpts, CFG)
    return kpts, desc


@pytest.fixture(scope="module")
def jax_result(small_image):
    kp, desc = jsift.detect_and_compute(np.asarray(small_image), CFG)
    return kp, np.asarray(desc)


def _match_oracle(kpts_ref, kp, pos_tol=0.1, size_rtol=0.01, ang_tol=1.0):
    """For each oracle keypoint, find a valid JAX keypoint that agrees."""
    jx = np.asarray(kp.x)
    jy = np.asarray(kp.y)
    jsz = np.asarray(kp.size)
    jang = np.asarray(kp.angle)
    jval = np.asarray(kp.valid)
    hits = []
    for kr in kpts_ref:
        d = np.abs(jx - kr["x"]) + np.abs(jy - kr["y"])
        cand = np.where(jval & (d < pos_tol))[0]
        ok = False
        best = -1
        for i in cand:
            if abs(jsz[i] - kr["size"]) > size_rtol * kr["size"]:
                continue
            da = abs(jang[i] - kr["angle"])
            da = min(da, 360 - da)
            if da > ang_tol:
                continue
            ok = True
            best = int(i)
            break
        hits.append(best if ok else -1)
    return np.array(hits)


def test_keypoint_recall_vs_oracle(oracle_result, jax_result):
    kpts_ref, _ = oracle_result
    kp, _ = jax_result
    assert len(kpts_ref) > 50, "oracle should find many keypoints"
    hits = _match_oracle(kpts_ref, kp)
    recall = float((hits >= 0).mean())
    assert recall >= 0.97, f"recall {recall:.3f} (found {len(kpts_ref)} ref)"


def test_keypoint_precision_vs_oracle(oracle_result, jax_result):
    kpts_ref, _ = oracle_result
    kp, _ = jax_result
    n_valid = int(np.asarray(kp.valid).sum())
    # every valid JAX keypoint should correspond to an oracle keypoint
    rx = np.array([k["x"] for k in kpts_ref])
    ry = np.array([k["y"] for k in kpts_ref])
    jx = np.asarray(kp.x)[np.asarray(kp.valid)]
    jy = np.asarray(kp.y)[np.asarray(kp.valid)]
    ok = 0
    for x, y in zip(jx, jy):
        if np.min(np.abs(rx - x) + np.abs(ry - y)) < 0.1:
            ok += 1
    precision = ok / max(n_valid, 1)
    assert precision >= 0.97, f"precision {precision:.3f} ({n_valid} valid)"


def test_descriptors_match_oracle(oracle_result, jax_result):
    kpts_ref, desc_ref = oracle_result
    kp, desc = jax_result
    hits = _match_oracle(kpts_ref, kp)
    matched = np.where(hits >= 0)[0]
    assert len(matched) > 30
    l1 = []
    for mi in matched:
        a = desc_ref[mi]
        b = desc[hits[mi]]
        l1.append(np.abs(a - b).sum())
    l1 = np.array(l1)
    # descriptors are sqrt-L1-normalized (||.||_1 of squares = 1);
    # typical inter-keypoint L1 distances are O(5-10)
    assert np.median(l1) < 0.05, float(np.median(l1))
    assert np.quantile(l1, 0.9) < 0.2, float(np.quantile(l1, 0.9))


@pytest.mark.slow
def test_tiny_image_does_not_crash():
    """Images whose deep octaves shrink below the NMS/refinement
    window must degrade gracefully (empty batches), not crash."""
    rng = np.random.default_rng(1)
    for hw in ((16, 16), (24, 40), (64, 48)):
        img = (rng.random(hw) * 255).astype(np.float32)
        kp, desc = jsift.detect_and_compute(img, CFG)
        assert desc.shape == (sum(CFG.out_caps), 128)
        assert np.isfinite(np.asarray(desc)).all()


def test_orientation_hist_impls_agree():
    """The factored (6x6 decomposed one-hot) histogram must equal the
    one-hot matmul and a NumPy bincount oracle (round-3 A/B candidate
    for the orientation stage)."""
    import numpy as _np
    import jax.numpy as _jnp
    from sift_tpu.ops.orientation import _hist_bins
    rng = _np.random.default_rng(11)
    contrib = rng.random(1849).astype(_np.float32)
    bins = rng.integers(0, 36, 1849).astype(_np.int32)
    want = _np.bincount(bins, weights=contrib, minlength=36)
    a = _np.asarray(_hist_bins(_jnp.asarray(contrib),
                               _jnp.asarray(bins), 36, "onehot"))
    b = _np.asarray(_hist_bins(_jnp.asarray(contrib),
                               _jnp.asarray(bins), 36, "factored"))
    c = _np.asarray(_hist_bins(_jnp.asarray(contrib),
                               _jnp.asarray(bins), 36, "onehot_t"))
    _np.testing.assert_allclose(a, want, rtol=1e-5, atol=1e-4)
    _np.testing.assert_allclose(b, want, rtol=1e-5, atol=1e-4)
    _np.testing.assert_allclose(c, want, rtol=1e-5, atol=1e-4)


def test_descriptor_layout_transposed_agrees():
    """The transposed (samples-on-lanes) descriptor one-hot layout
    must match the default layout bit-for-bit in f32 mode (same
    contraction, different vreg layout — an on-chip A/B candidate)."""
    import dataclasses
    rng = np.random.default_rng(5)
    img = (rng.random((96, 128)) * 255).astype(np.float32)
    base = dataclasses.replace(CFG, descr_rc_bf16=False)
    kp1, d1 = jsift.detect_and_compute(img, base)
    kp2, d2 = jsift.detect_and_compute(
        img, dataclasses.replace(base, descr_layout="kp"))
    v1 = np.asarray(kp1.valid)
    v2 = np.asarray(kp2.valid)
    assert v1.sum() == v2.sum() and v1.sum() > 0
    np.testing.assert_allclose(np.asarray(d1)[v1], np.asarray(d2)[v2],
                               rtol=0, atol=1e-6)


"""Spatial tiling: one frame row-sharded over the mesh must reproduce
the single-device detect+describe exactly (SURVEY §5 long-context
analog; the reference instead resizes the scene to 960x960,
src/main.cpp:83).

Capacity semantics differ (per-device caps on tiled octaves), so
parity compares the SET of valid keypoints. The fixture stays far
below the caps so no compaction ambiguity exists.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sift_tpu import sift
from sift_tpu.config import SIFTConfig
from sift_tpu.parallel import default_mesh
from sift_tpu.parallel.spatial import detect_and_compute_tiled

CFG = SIFTConfig(detect_caps=(256, 128, 64, 32, 16),
                 out_caps=(128, 64, 32, 16, 8), max_keypoints=248)


def _valid_set(kp, d):
    v = np.asarray(kp.valid)
    xy = np.stack([np.asarray(kp.x)[v], np.asarray(kp.y)[v],
                   np.asarray(kp.angle)[v], np.asarray(kp.size)[v]], 1)
    dd = np.asarray(d)[v]
    order = np.lexsort((xy[:, 2], xy[:, 1], xy[:, 0]))
    return xy[order], dd[order]


@pytest.mark.slow
def test_tiled_matches_single_device(scene_gray_small):
    img = jnp.asarray(scene_gray_small)
    mesh = default_mesh(2)
    kp_t, d_t = detect_and_compute_tiled(img, mesh, CFG,
                                         tiled_octaves=1)
    kp_s, d_s = sift.detect_and_compute(img, CFG)
    xt, dt = _valid_set(kp_t, d_t)
    xs, ds = _valid_set(kp_s, d_s)
    assert len(xs) > 30, "degenerate fixture"
    assert len(xt) == len(xs), (len(xt), len(xs))
    np.testing.assert_allclose(xt, xs, rtol=0, atol=1e-3)
    np.testing.assert_allclose(dt, ds, rtol=0, atol=1e-3)


@pytest.mark.slow
def test_tiled_pallas_band_blur_matches_single_device(
        scene_gray_small, monkeypatch):
    """The TPU-routed band blur (Pallas kernel, interpret-mode here)
    must keep the tiled path's exact parity — this gates VERDICT r3
    item 4 (tiled octaves used to run the XLA conv twin on TPU)."""
    monkeypatch.setenv("SIFT_TPU_TILED_PALLAS", "1")
    img = jnp.asarray(scene_gray_small)
    mesh = default_mesh(2)
    kp_t, d_t = detect_and_compute_tiled(img, mesh, CFG,
                                         tiled_octaves=1)
    kp_s, d_s = sift.detect_and_compute(img, CFG)
    xt, dt = _valid_set(kp_t, d_t)
    xs, ds = _valid_set(kp_s, d_s)
    assert len(xs) > 30, "degenerate fixture"
    assert len(xt) == len(xs), (len(xt), len(xs))
    np.testing.assert_allclose(xt, xs, rtol=0, atol=1e-3)
    # descriptors: the Pallas blur's tap-accumulation order differs
    # from the XLA conv reduction order by ~1e-6 in the blurred
    # images; the descriptor's saturate-to-uchar step (sift.cpp:710)
    # can flip a borderline count by 1 (~0.01 after the sqrt-L1
    # tail). Bound both the per-element error and how many elements
    # may sit on that quantization boundary. On TPU both paths run
    # the SAME kernel, so hardware parity is the tighter HW-lane gate.
    err = np.abs(dt - ds)
    assert err.max() < 2e-2, err.max()
    assert (err > 1e-3).mean() < 1e-3, (err > 1e-3).mean()


@pytest.fixture(scope="module")
def scene_gray_small():
    import cv2
    img = cv2.imread("/root/reference/data/scene.jpg",
                     cv2.IMREAD_GRAYSCALE).astype(np.float32)
    return cv2.resize(img, (320, 256))


@pytest.mark.slow
def test_tiled_two_octaves_matches_single_device(scene_gray_small):
    """tiled_octaves=2 exercises the tiled->tiled decimation handoff
    (band halving + next-octave halo exchange) that tiled_octaves=1
    never runs; must still be exact."""
    img = jnp.asarray(scene_gray_small)
    mesh = default_mesh(2)
    kp_t, d_t = detect_and_compute_tiled(img, mesh, CFG,
                                         tiled_octaves=2, halo=48)
    kp_s, d_s = sift.detect_and_compute(img, CFG)
    xt, dt = _valid_set(kp_t, d_t)
    xs, ds = _valid_set(kp_s, d_s)
    assert len(xs) > 30, "degenerate fixture"
    assert len(xt) == len(xs), (len(xt), len(xs))
    np.testing.assert_allclose(xt, xs, rtol=0, atol=1e-3)
    np.testing.assert_allclose(dt, ds, rtol=0, atol=1e-3)

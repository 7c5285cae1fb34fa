"""Batched (throughput-mode) detect+describe parity vs per-frame.

detect_and_compute_batch must reproduce detect_and_compute exactly,
frame by frame — the batch axis is a pure throughput transform (one
grid/conv axis through pyramid + extrema, vmap over the tail), not an
algorithm change. The reference has no batch concept at all (one
process, one pair, src/main.cpp:10-72).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sift_tpu import sift
from sift_tpu.config import DEFAULT_CONFIG
from sift_tpu.ops import pyramid as pyr
from sift_tpu.ops.conv import gaussian_blur_multi, gaussian_blur_multi_batch


def _frames(n=3, h=96, w=128, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h, w)).astype(np.float32)
    frames = [base]
    for i in range(1, n):
        f = np.roll(base, 11 * i, axis=1) * 0.9 + rng.uniform(
            0, 25, (h, w)).astype(np.float32)
        frames.append(np.clip(f, 0, 255).astype(np.float32))
    return np.stack(frames)


def test_blur_batch_matches_single():
    imgs = _frames(2, 64, 96)
    sig = (1.2, 2.0, 3.1)
    batched = np.asarray(gaussian_blur_multi_batch(jnp.asarray(imgs), sig))
    for b in range(imgs.shape[0]):
        single = np.asarray(gaussian_blur_multi(jnp.asarray(imgs[b]), sig))
        np.testing.assert_allclose(batched[b], single, rtol=0, atol=1e-4)


@pytest.mark.slow
def test_pyramid_batch_matches_single():
    imgs = _frames(2)
    octs_b = pyr.build_gaussian_pyramid_batch(jnp.asarray(imgs))
    for b in range(imgs.shape[0]):
        octs = pyr.build_gaussian_pyramid(jnp.asarray(imgs[b]))
        for o in range(len(octs)):
            np.testing.assert_allclose(np.asarray(octs_b[o][b]),
                                       np.asarray(octs[o]),
                                       rtol=0, atol=2e-4)


@pytest.mark.slow
def test_detect_and_compute_batch_parity():
    imgs = _frames(3)
    kp_b, d_b = sift.detect_and_compute_batch(jnp.asarray(imgs))
    for b in range(imgs.shape[0]):
        kp, d = sift.detect_and_compute(jnp.asarray(imgs[b]))
        kb = jax.tree.map(lambda a: np.asarray(a)[b], kp_b)
        assert int(kp.count()) > 0, "degenerate fixture"
        np.testing.assert_array_equal(np.asarray(kb.valid),
                                      np.asarray(kp.valid))
        v = np.asarray(kp.valid)
        for field in ("x", "y", "size", "angle", "response",
                      "octave", "layer", "r", "c"):
            np.testing.assert_allclose(
                np.asarray(getattr(kb, field))[v],
                np.asarray(getattr(kp, field))[v],
                rtol=0, atol=1e-4, err_msg=field)
        np.testing.assert_allclose(np.asarray(d_b)[b][v],
                                   np.asarray(d)[v],
                                   rtol=0, atol=1e-3)


@pytest.mark.slow
def test_batch_of_one_matches_single():
    imgs = _frames(1)
    kp_b, d_b = sift.detect_and_compute_batch(jnp.asarray(imgs))
    kp, d = sift.detect_and_compute(jnp.asarray(imgs[0]))
    np.testing.assert_array_equal(np.asarray(kp_b.valid)[0],
                                  np.asarray(kp.valid))
    np.testing.assert_allclose(np.asarray(d_b)[0], np.asarray(d),
                               rtol=0, atol=1e-3)

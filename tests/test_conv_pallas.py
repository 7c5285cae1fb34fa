"""Pallas blur kernel parity vs the XLA convolution path (interpret
mode on CPU; the TPU path is exercised by bench/CLI)."""

import numpy as np
import numpy.random as _np_rng_mod
import pytest
import jax.numpy as jnp

from sift_tpu.config import DEFAULT_CONFIG as CFG
from sift_tpu.ops.conv import gaussian_blur_multi
from sift_tpu.ops.conv_pallas import gaussian_blur_multi_pallas


def test_pallas_blur_matches_conv(rng):
    img = (rng.random((96, 120)) * 255).astype(np.float32)
    sig = CFG.scale_sigmas()[1:]
    a = np.asarray(gaussian_blur_multi(jnp.asarray(img), sig))
    b = np.asarray(gaussian_blur_multi_pallas(jnp.asarray(img), sig))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-3)


def test_pallas_blur_single_sigma(rng):
    img = (rng.random((64, 64)) * 255).astype(np.float32)
    a = np.asarray(gaussian_blur_multi(jnp.asarray(img),
                                       (CFG.init_blur_sigma,)))
    b = np.asarray(gaussian_blur_multi_pallas(jnp.asarray(img),
                                              (CFG.init_blur_sigma,)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-3)


import pytest as _pytest


@_pytest.fixture(scope="module")
def rng():
    """Module-local deterministic rng: the session-wide rng made test
    outcomes depend on which other modules ran first."""
    return _np_rng_mod.default_rng(0)


@pytest.mark.slow
def test_pallas_blur_batch_matches_conv(rng):
    from sift_tpu.ops.conv_pallas import gaussian_blur_multi_batch_pallas
    imgs = (rng.random((3, 72, 104)) * 255).astype(np.float32)
    sig = CFG.scale_sigmas()[1:]
    got = np.asarray(gaussian_blur_multi_batch_pallas(jnp.asarray(imgs),
                                                      sig))
    for b in range(3):
        want = np.asarray(gaussian_blur_multi(jnp.asarray(imgs[b]), sig))
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-3)

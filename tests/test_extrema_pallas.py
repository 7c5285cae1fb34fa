"""Pallas extrema-score kernel parity vs the XLA mask (interpret)."""

import numpy as np
import numpy.random as _np_rng_mod
import pytest
import jax.numpy as jnp

from sift_tpu.config import DEFAULT_CONFIG as CFG
from sift_tpu.ops import pyramid as pyr
from sift_tpu.ops import extrema as ext
from sift_tpu.ops.extrema_pallas import extrema_scores_pallas


def test_pallas_scores_match_mask(small_image):
    octs = pyr.build_gaussian_pyramid(jnp.asarray(small_image), CFG)
    dogs = pyr.build_dog_pyramid(octs)
    nl = CFG.n_octave_layers
    for o in (0, 1, 2):
        mask = np.asarray(ext.extrema_mask(dogs[o], CFG))
        want = np.where(mask, np.abs(np.asarray(dogs[o][1:1 + nl])), -1.0)
        got = np.asarray(extrema_scores_pallas(dogs[o], CFG))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_two_stage_topk_exact(rng):
    score = np.full(300_000, -1.0, np.float32)
    hot = rng.choice(300_000, 900, replace=False)
    score[hot] = rng.uniform(8, 200, 900).astype(np.float32)
    v, i = ext._top_k_two_stage(jnp.asarray(score), 1024)
    got = set(np.asarray(i)[np.asarray(v) > 0].tolist())
    assert got == set(hot.tolist())


import pytest as _pytest


@_pytest.fixture(scope="module")
def rng():
    """Module-local deterministic rng: the session-wide rng made test
    outcomes depend on which other modules ran first."""
    return _np_rng_mod.default_rng(0)


@pytest.mark.slow
def test_pallas_scores_batch_match_mask(small_image, rng):
    from sift_tpu.ops.extrema_pallas import extrema_scores_batch_pallas
    nl = CFG.n_octave_layers
    imgs = np.stack([small_image,
                     np.roll(small_image, 9, axis=1)]).astype(np.float32)
    octs = pyr.build_gaussian_pyramid_batch(jnp.asarray(imgs), CFG)
    dogs = pyr.build_dog_pyramid_batch(octs)
    for o in (0, 1):
        got = np.asarray(extrema_scores_batch_pallas(dogs[o], CFG))
        for b in range(2):
            mask = np.asarray(ext.extrema_mask(dogs[o][b], CFG))
            want = np.where(mask,
                            np.abs(np.asarray(dogs[o][b][1:1 + nl])), -1.0)
            np.testing.assert_allclose(got[b], want, rtol=0, atol=1e-6)


def test_two_stage_topk_batch_exact(rng):
    score = np.full((2, 300_000), -1.0, np.float32)
    hots = []
    for b in range(2):
        hot = rng.choice(300_000, 700 + 200 * b, replace=False)
        score[b, hot] = rng.uniform(8, 200, len(hot)).astype(np.float32)
        hots.append(set(hot.tolist()))
    v, i = ext._top_k_two_stage_batch(jnp.asarray(score), 1024)
    for b in range(2):
        got = set(np.asarray(i[b])[np.asarray(v[b]) > 0].tolist())
        assert got == hots[b]

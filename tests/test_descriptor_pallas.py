"""Fused Pallas descriptor kernel parity vs the XLA path (interpret
mode on CPU)."""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from sift_tpu.config import DEFAULT_CONFIG

# kernel parity is checked in the bit-exact f32 mode (the bf16 rc fast
# path is validated end to end by the recall gate instead)
CFG = dataclasses.replace(DEFAULT_CONFIG, descr_rc_bf16=False)
from sift_tpu import sift
from sift_tpu.ops import pyramid as pyr
from sift_tpu.ops import descriptor as desc_xla
from sift_tpu.ops.descriptor_pallas import descriptors_octave_pallas


@pytest.mark.slow
def test_pallas_descriptor_matches_xla(small_image):
    octs = pyr.build_gaussian_pyramid(jnp.asarray(small_image), CFG)
    dogs = pyr.build_dog_pyramid(octs)
    for o in (0, 1):
        kp = sift.detect_octave(octs[o], dogs[o], o,
                                CFG.detect_caps[o], CFG)
        a = np.asarray(desc_xla.descriptors_octave(octs[o], kp, CFG))
        b = np.asarray(descriptors_octave_pallas(octs[o], kp, CFG))
        valid = np.asarray(kp.valid)
        assert valid.sum() > 10
        np.testing.assert_allclose(a[valid], b[valid],
                                   rtol=1e-4, atol=2e-4)
        # invalid rows are zero
        assert np.abs(b[~valid]).max() == 0.0

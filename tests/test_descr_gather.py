"""Parity of descr_gather_impl=pallas vs dynamic_slice: the
descriptor stage (reference calcSIFTDescriptor, src/sift.cpp:579-753)
must produce bit-identical descriptors under either patch gather.
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from sift_tpu.config import DEFAULT_CONFIG


@pytest.mark.slow
def test_descriptor_gather_impl_parity(book_gray):
    from sift_tpu import sift

    outs = {}
    for impl in ("dynamic_slice", "pallas"):
        cfg = dataclasses.replace(DEFAULT_CONFIG,
                                  descr_gather_impl=impl,
                                  descr_rc_bf16=False)
        kp, desc = sift.detect_and_compute(jnp.asarray(book_gray), cfg)
        outs[impl] = (np.asarray(kp.valid), np.asarray(desc))

    np.testing.assert_array_equal(outs["pallas"][0],
                                  outs["dynamic_slice"][0])
    np.testing.assert_array_equal(outs["pallas"][1],
                                  outs["dynamic_slice"][1])

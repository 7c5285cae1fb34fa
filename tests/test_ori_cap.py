"""Empirical validation of the max_ori_peaks=4 truncation cap.

The reference emits one keypoint per qualifying orientation peak,
unbounded (src/sift.cpp:525-541); we cap at cfg.max_ori_peaks ranked
by peak height. This test recomputes orientations with k=8 slots on a
real corpus image and asserts no keypoint has more than 4 qualifying
peaks — i.e. the default cap truncates nothing in practice (the 0.8
peak-ratio + strict-local-max rule makes >4 peaks vanishingly rare).
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from sift_tpu.config import DEFAULT_CONFIG
from sift_tpu.ops import pyramid as pyr
from sift_tpu.ops import extrema as ext
from sift_tpu.ops import refine as ref
from sift_tpu.ops import orientation as ori


@pytest.mark.slow
def test_four_ori_peaks_suffice(book_gray):
    cfg8 = dataclasses.replace(DEFAULT_CONFIG, max_ori_peaks=8)
    octs = pyr.build_gaussian_pyramid(jnp.asarray(book_gray), cfg8)
    dogs = pyr.build_dog_pyramid(octs)
    total = 0
    for o in (0, 1):
        lay, r, c, v = ext.top_candidates(dogs[o],
                                          cfg8.detect_caps[o], cfg8)
        rf = ref.refine_candidates(dogs[o], lay, r, c, v, cfg8)
        scl = cfg8.sigma * jnp.exp2(
            (rf.layer.astype(jnp.float32) + rf.xi)
            / cfg8.n_octave_layers)
        angles, ok = ori.orientation_peaks(
            octs[o], rf.layer, rf.r, rf.c, scl, rf.valid, cfg8)
        ok = np.asarray(ok)
        n_peaks = ok.sum(axis=1)
        total += int((n_peaks > 0).sum())
        assert n_peaks.max() <= DEFAULT_CONFIG.max_ori_peaks, (
            o, n_peaks.max())
    assert total > 50      # the check covered real keypoints

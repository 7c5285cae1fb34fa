"""Parity of the Pallas batch patch-gather (ops/ori_gather_pallas)
against the vmapped dynamic_slice it replaces.

The orientation stage (reference calcOrientationHist,
src/sift.cpp:389-458) gathers one fixed-size patch per keypoint; the
two gather implementations must return identical values so the
config flag (ori_gather_impl) is purely a performance choice.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sift_tpu.config import DEFAULT_CONFIG
from sift_tpu.ops.ori_gather_pallas import gather_patches


def _ref_gather(padded, layer, r, c, patch):
    return jax.vmap(lambda l0, r0, c0: jax.lax.dynamic_slice(
        padded, (l0, r0, c0), (1, patch, patch))[0])(layer, r, c)


@pytest.mark.parametrize("patch,n", [(37, 64), (37, 13), (79, 24)])
def test_gather_matches_dynamic_slice(patch, n):
    rng = np.random.default_rng(patch * 1000 + n)
    nlay, h, w = 3, 240, 320
    hp, wp = h - 1 + patch, w - 1 + patch
    padded = jnp.asarray(rng.standard_normal((nlay, hp, wp)),
                         jnp.float32)
    layer = jnp.asarray(rng.integers(0, nlay, n), jnp.int32)
    r = jnp.asarray(rng.integers(0, h, n), jnp.int32)
    c = jnp.asarray(rng.integers(0, w, n), jnp.int32)

    got = gather_patches(padded, layer, r, c, patch)
    want = _ref_gather(padded, layer, r, c, patch)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gather_edge_starts():
    """Window starts at the extreme corners of the valid range —
    exercises the kernel's DMA row padding and the 128-lane column
    alignment (off = c mod 128 at its largest)."""
    patch = 37
    nlay, h, w = 2, 100, 300
    hp, wp = h - 1 + patch, w - 1 + patch
    rng = np.random.default_rng(7)
    padded = jnp.asarray(rng.standard_normal((nlay, hp, wp)),
                         jnp.float32)
    corners = [(0, 0), (0, w - 1), (h - 1, 0), (h - 1, w - 1),
               (5, 127), (5, 128), (5, 129)]
    layer = jnp.asarray([i % nlay for i in range(len(corners))],
                        jnp.int32)
    r = jnp.asarray([rc[0] for rc in corners], jnp.int32)
    c = jnp.asarray([rc[1] for rc in corners], jnp.int32)

    got = gather_patches(padded, layer, r, c, patch)
    want = _ref_gather(padded, layer, r, c, patch)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_orientation_peaks_gather_impl_parity(book_gray):
    """End-to-end: orientation_peaks under ori_gather_impl=pallas is
    bit-identical to the dynamic_slice path on a real corpus image."""
    from sift_tpu.ops import pyramid as pyr
    from sift_tpu.ops import extrema as ext
    from sift_tpu.ops import refine as ref
    from sift_tpu.ops import orientation as ori

    cfg = DEFAULT_CONFIG
    octs = pyr.build_gaussian_pyramid(jnp.asarray(book_gray), cfg)
    dogs = pyr.build_dog_pyramid(octs)
    lay, r, c, v = ext.top_candidates(dogs[0], cfg.detect_caps[0], cfg)
    rf = ref.refine_candidates(dogs[0], lay, r, c, v, cfg)
    scl = cfg.sigma * jnp.exp2(
        (rf.layer.astype(jnp.float32) + rf.xi) / cfg.n_octave_layers)

    outs = {}
    for impl in ("dynamic_slice", "pallas"):
        cfg_i = dataclasses.replace(cfg, ori_gather_impl=impl)
        angles, ok = ori.orientation_peaks(
            octs[0], rf.layer, rf.r, rf.c, scl, rf.valid, cfg_i)
        outs[impl] = (np.asarray(angles), np.asarray(ok))

    np.testing.assert_array_equal(outs["pallas"][1],
                                  outs["dynamic_slice"][1])
    np.testing.assert_array_equal(outs["pallas"][0],
                                  outs["dynamic_slice"][0])

"""Cap-saturation hardening (degenerate/dense inputs).

The reference emits every surviving extremum and orientation peak
unboundedly (src/sift.cpp:538,525-541); our static caps truncate by
rank. These tests pin the two safety nets: the two-stage top-k's
exact fallback when a block saturates, and octave_saturation flagging
full output batches.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sift_tpu import sift
from sift_tpu.config import SIFTConfig, DEFAULT_CONFIG
from sift_tpu.ops import extrema


def test_topk_exact_under_block_saturation():
    """A plateau-free dense extrema field puts >128 candidates into a
    4096 block; the lax.cond fallback must keep top-k exact."""
    nl = DEFAULT_CONFIG.n_octave_layers
    h, w = 96, 128
    dog = np.zeros((nl + 2, h, w), np.float32)
    rng = np.random.default_rng(0)
    # every 3rd pixel is a strict local max: density 4096/9 = 455 > 128
    rr, cc = np.meshgrid(np.arange(6, h - 6, 3), np.arange(6, w - 6, 3),
                         indexing="ij")
    vals = 20.0 + rng.random(rr.shape).astype(np.float32) * 10.0
    dog[1, rr, cc] = vals
    cap = 256
    lay, r, c, valid = (np.asarray(x) for x in
                        extrema.top_candidates(jnp.asarray(dog), cap))
    # ground truth: the cap largest planted values
    order = np.argsort(vals.reshape(-1))[::-1][:cap]
    want = set(zip(rr.reshape(-1)[order].tolist(),
                   cc.reshape(-1)[order].tolist()))
    got = set(zip(r[valid].tolist(), c[valid].tolist()))
    assert valid.sum() == cap
    assert got == want, f"{len(want - got)} top candidates dropped"


@pytest.mark.slow
def test_octave_saturation_flags_full_batches():
    cfg = SIFTConfig(detect_caps=(64, 32, 16, 8, 8),
                     out_caps=(16, 8, 8, 8, 8), max_keypoints=128)
    rng = np.random.default_rng(3)
    # dense blob grid: gaussian blobs are strong DoG extrema that
    # survive the contrast/edge filters (plain noise does not)
    import cv2
    img = np.zeros((96, 128), np.float32)
    rr, cc = np.meshgrid(np.arange(8, 88, 10), np.arange(8, 120, 10),
                         indexing="ij")
    img[rr, cc] = 200.0 + rng.random(rr.shape).astype(np.float32) * 55.0
    # sigma ~2.2 blobs peak in DoG layer 1 (the scanned layer); the
    # grid yields ~88 octave-0 NMS survivors >> the 16-slot out cap
    img = cv2.GaussianBlur(img, (0, 0), 2.2) * 30.0
    kp, _ = sift.detect(img, cfg)
    sat = np.asarray(sift.octave_saturation(kp, cfg))
    v = np.asarray(kp.valid)
    counts = [int(v[s:s + n].sum()) for s, n in
              zip(np.cumsum((0,) + cfg.out_caps[:-1]), cfg.out_caps)]
    # the blob grid floods octave 0's 16-slot output cap
    assert sat[0], (sat, counts)
    # a flat image saturates nothing
    kp2, _ = sift.detect(np.zeros((96, 128), np.float32), cfg)
    sat2 = np.asarray(sift.octave_saturation(kp2, cfg))
    assert not sat2.any(), sat2


def test_candidate_saturation_flags_pre_refine_truncation():
    """Candidate-cap overflow happens BEFORE refinement, so the
    output batch can look comfortably under-full while the weakest
    NMS survivors were silently dropped — exactly how rotate1080 lost
    65 reference keypoints (round 4). candidate_saturation counts the
    dense mask and must fire; octave_saturation alone must NOT be
    relied on for this."""
    import cv2
    cfg = SIFTConfig(detect_caps=(32, 16, 8, 8, 8),
                     out_caps=(64, 16, 8, 8, 8), max_keypoints=128)
    rng = np.random.default_rng(3)
    img = np.zeros((96, 128), np.float32)
    rr, cc = np.meshgrid(np.arange(8, 88, 10), np.arange(8, 120, 10),
                         indexing="ij")
    img[rr, cc] = 200.0 + rng.random(rr.shape).astype(np.float32) * 55.0
    img = cv2.GaussianBlur(img, (0, 0), 2.2) * 30.0  # ~88 survivors
    from sift_tpu.ops import pyramid as pyr
    octs = pyr.build_gaussian_pyramid(jnp.asarray(img), cfg)
    csat = np.asarray(sift.candidate_saturation(octs, cfg))
    assert csat[0], csat
    octs2 = pyr.build_gaussian_pyramid(
        jnp.zeros((96, 128), jnp.float32), cfg)
    csat2 = np.asarray(sift.candidate_saturation(octs2, cfg))
    assert not csat2.any(), csat2

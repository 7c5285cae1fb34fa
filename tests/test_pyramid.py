"""Golden tests: JAX pyramid vs the NumPy oracle twin of the reference."""

import numpy as np

from sift_tpu.config import DEFAULT_CONFIG as CFG
from sift_tpu.oracle import cpu_sift as oracle
from sift_tpu.ops import conv as jconv
from sift_tpu.ops import pyramid as jpyr


def test_kernel_matches_reference_2d_factorization():
    for sigma in (1.6, 2.2, 4.5):
        k1 = jconv.gaussian_kernel_1d(sigma)
        k2 = oracle.gaussian_kernel_2d(sigma)
        np.testing.assert_allclose(np.outer(k1, k1), k2, rtol=2e-6, atol=1e-12)


def test_blur_matches_oracle(small_image):
    for sigma in (1.6124515, 2.771281):
        ours = np.asarray(jconv.gaussian_blur(small_image, sigma))
        ref = oracle.gaussian_blur(small_image, sigma)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-3)


def test_blur_boundary_quirk():
    """Reads at the last row/col must behave as zeros (sift.cpp:116)."""
    img = np.full((12, 12), 100.0, np.float32)
    ours = np.asarray(jconv.gaussian_blur(img, 1.6))
    ref = oracle.gaussian_blur(img, 1.6)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-3)
    # interior of a constant image is NOT exactly 100 * sum(kernel) at
    # the edges: the zeroed last row/col must depress nearby outputs.
    assert ours[-1, 5] < ours[5, 5]


def test_pyramid_matches_oracle(small_image):
    octs = jpyr.build_gaussian_pyramid(small_image, CFG)
    ref = oracle.build_gaussian_pyramid(small_image, CFG)
    S = CFG.n_scales
    for o in range(CFG.n_octaves):
        for i in range(S):
            ours = np.asarray(octs[o][i])
            theirs = ref[o * S + i]
            assert ours.shape == theirs.shape, (o, i)
            np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=5e-3,
                                       err_msg=f"octave {o} scale {i}")


def test_dog_matches_oracle(small_image):
    octs = jpyr.build_gaussian_pyramid(small_image, CFG)
    dog = jpyr.build_dog_pyramid(octs)
    gref = oracle.build_gaussian_pyramid(small_image, CFG)
    dref = oracle.build_dog_pyramid(gref, CFG)
    D = CFG.n_dog
    for o in range(CFG.n_octaves):
        for i in range(D):
            np.testing.assert_allclose(np.asarray(dog[o][i]),
                                       dref[o * D + i],
                                       rtol=3e-4, atol=1e-2)

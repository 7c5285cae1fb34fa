"""On-hardware Pallas kernel parity lane (opt-in).

CI pins tests to CPU with interpret-mode Pallas (tests/conftest.py),
so a Mosaic miscompile would previously only surface through the
benchmark. This lane runs each live Pallas kernel NON-interpreted on
the real chip against its XLA twin:

    SIFT_TPU_HW_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q

Shapes deliberately match the 960x960 demo pipeline so compiles hit
the persistent cache from bench/CLI runs (fresh compiles through the
axon tunnel are slow and serialize the shared terminal).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

_ON_HW = os.environ.get("SIFT_TPU_HW_TESTS") == "1"
if _ON_HW:
    import jax
    _ON_HW = jax.default_backend() == "tpu"

needs_tpu = pytest.mark.skipif(
    not _ON_HW, reason="set SIFT_TPU_HW_TESTS=1 with a TPU attached")


@pytest.fixture(scope="module")
def scene960():
    cv2 = pytest.importorskip("cv2")
    img = cv2.resize(cv2.imread("/root/reference/data/scene.jpg"),
                     (960, 960))
    return cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)


@needs_tpu
def test_blur_kernel_parity(scene960):
    import jax.numpy as jnp
    from sift_tpu.config import DEFAULT_CONFIG as CFG
    from sift_tpu.ops.conv import gaussian_blur_multi
    from sift_tpu.ops.conv_pallas import gaussian_blur_multi_pallas
    sig = CFG.scale_sigmas()[1:]
    img = jnp.asarray(scene960)
    a = np.asarray(gaussian_blur_multi(img, sig))
    b = np.asarray(gaussian_blur_multi_pallas(img, sig))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=2e-3)


@needs_tpu
def test_extrema_kernel_parity(scene960):
    import jax.numpy as jnp
    from sift_tpu.config import DEFAULT_CONFIG as CFG
    from sift_tpu.ops import pyramid as pyr
    from sift_tpu.ops import extrema
    from sift_tpu.ops.extrema_pallas import extrema_scores_pallas
    octs = pyr.build_gaussian_pyramid(jnp.asarray(scene960), CFG)
    dogs = pyr.build_dog_pyramid(octs)
    for o in (0, 1):
        mask = np.asarray(extrema.extrema_mask(dogs[o], CFG))
        nl = CFG.n_octave_layers
        want = np.where(mask, np.abs(np.asarray(dogs[o])[1:1 + nl]),
                        -1.0)
        got = np.asarray(extrema_scores_pallas(dogs[o], CFG))
        np.testing.assert_allclose(got, want, atol=1e-4)


@needs_tpu
def test_match_kernel_parity():
    import jax.numpy as jnp
    from sift_tpu.ops.match import knn2_l1_xla
    from sift_tpu.ops.match_pallas import knn2_l1_pallas
    rng = np.random.default_rng(0)

    def mkdesc(n):
        d = rng.random((n, 128)).astype(np.float32) ** 2
        d /= d.sum(axis=1, keepdims=True)
        return np.sqrt(d)

    q = jnp.asarray(mkdesc(2048))
    t = jnp.asarray(mkdesc(2048))
    a = knn2_l1_xla(q, t)
    b = knn2_l1_pallas(q, t)
    np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
    np.testing.assert_allclose(np.asarray(a.d1), np.asarray(b.d1),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.d2), np.asarray(b.d2),
                               rtol=1e-5, atol=1e-4)


@needs_tpu
def test_e2e_pipeline_on_hardware(scene960):
    """Full detect+describe on the chip: keypoint counts must land on
    the compiled reference's (BASELINE.md recall table)."""
    from sift_tpu import sift
    kp, desc = sift.detect_and_compute(scene960)
    n = int(np.asarray(kp.count()))
    assert abs(n - 486) <= 5, n
    assert np.isfinite(np.asarray(desc)).all()


@needs_tpu
def test_batched_blur_kernel_parity(scene960):
    """Round-3 batched (grid-flattened) blur kernel vs the XLA twin,
    non-interpreted, on real shapes."""
    import jax.numpy as jnp
    from sift_tpu.config import DEFAULT_CONFIG as CFG
    from sift_tpu.ops.conv import gaussian_blur_multi_batch
    from sift_tpu.ops.conv_pallas import gaussian_blur_multi_batch_pallas
    sig = CFG.scale_sigmas()[1:]
    imgs = jnp.asarray(np.stack([scene960,
                                 np.roll(scene960, 61, axis=1)]))
    a = np.asarray(gaussian_blur_multi_batch(imgs, sig))
    b = np.asarray(gaussian_blur_multi_batch_pallas(imgs, sig))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=2e-3)


@needs_tpu
def test_batched_extrema_kernel_parity(scene960):
    import jax.numpy as jnp
    from sift_tpu.config import DEFAULT_CONFIG as CFG
    from sift_tpu.ops import pyramid as pyr
    from sift_tpu.ops import extrema
    from sift_tpu.ops.extrema_pallas import extrema_scores_batch_pallas
    imgs = jnp.asarray(np.stack([scene960,
                                 np.roll(scene960, 61, axis=1)]))
    octs = pyr.build_gaussian_pyramid_batch(imgs, CFG)
    dogs = pyr.build_dog_pyramid_batch(octs)
    nl = CFG.n_octave_layers
    for o in (0, 1):
        got = np.asarray(extrema_scores_batch_pallas(dogs[o], CFG))
        for b in range(2):
            mask = np.asarray(extrema.extrema_mask(dogs[o][b], CFG))
            want = np.where(mask,
                            np.abs(np.asarray(dogs[o][b])[1:1 + nl]),
                            -1.0)
            np.testing.assert_allclose(got[b], want, atol=1e-4)


@needs_tpu
def test_batched_e2e_on_hardware(scene960):
    """detect_and_compute_batch on the chip must match the per-frame
    path exactly (the throughput headline's correctness certificate).

    Keypoint validity must be bit-identical; descriptors get atol=2e-3
    because the bf16 MXU trilinear contraction rounds differently under
    batched vs single-frame tiling (measured on hardware 2026-08-18:
    max dev 0.00116 on 1/62208 elements — far below the 0.2-scale
    descriptor values and the L1 match-decision noise floor)."""
    import jax
    import jax.numpy as jnp
    from sift_tpu import sift
    imgs = jnp.asarray(np.stack([scene960,
                                 np.roll(scene960, 61, axis=1)]))
    kb, db = sift.detect_and_compute_batch(imgs)
    for b in range(2):
        kp, d = sift.detect_and_compute(imgs[b])
        v = np.asarray(kp.valid)
        assert (np.asarray(kb.valid)[b] == v).all()
        np.testing.assert_allclose(np.asarray(db)[b][v],
                                   np.asarray(d)[v], atol=2e-3)


@needs_tpu
def test_ori_gather_kernel_parity():
    """Batched patch-gather DMA kernel (ops/ori_gather_pallas) vs
    vmapped dynamic_slice, non-interpreted, at both live patch sizes
    (orientation 37, descriptor 81)."""
    import jax
    import jax.numpy as jnp
    from sift_tpu.ops.ori_gather_pallas import gather_patches

    rng = np.random.default_rng(42)
    for patch in (37, 81):
        nlay, h, w = 3, 540, 960
        hp, wp = h - 1 + patch, w - 1 + patch
        padded = jnp.asarray(rng.standard_normal((nlay, hp, wp)),
                             jnp.float32)
        n = 256
        layer = jnp.asarray(rng.integers(0, nlay, n), jnp.int32)
        r = jnp.asarray(rng.integers(0, h, n), jnp.int32)
        c = jnp.asarray(rng.integers(0, w, n), jnp.int32)
        got = np.asarray(gather_patches(padded, layer, r, c, patch,
                                        interpret=False))
        want = np.asarray(jax.vmap(
            lambda l0, r0, c0: jax.lax.dynamic_slice(
                padded, (l0, r0, c0), (1, patch, patch))[0]
        )(layer, r, c))
        np.testing.assert_array_equal(got, want)

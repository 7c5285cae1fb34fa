"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests use a virtual 8-device mesh per SURVEY.md §4;
Pallas kernels run with interpret=True on CPU.
"""

import os

# SIFT_TPU_HW_TESTS=1 opts into the on-hardware kernel-parity lane
# (tests/test_tpu_hardware.py) on the real chip; everything else runs
# on the virtual 8-device CPU.
_HW = os.environ.get("SIFT_TPU_HW_TESTS") == "1"

if not _HW:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ.setdefault("SIFT_TPU_INTERPRET_PALLAS", "1")
else:
    os.environ["SIFT_TPU_INTERPRET_PALLAS"] = "0"

import jax  # noqa: E402

if not _HW:
    # The container's sitecustomize force-registers the axon TPU
    # plugin and sets jax_platforms="axon,cpu" at interpreter start,
    # overriding the env var. Backends initialize lazily, so
    # overriding the config here (before any computation) pins tests
    # to the virtual-8-device CPU.
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite compiles ~100 distinct XLA
# programs; caching them across runs cuts wall time several-fold.
_cache = os.path.expanduser(
    "~/.cache/sift_tpu_xla" if _HW else "~/.cache/sift_tpu_xla_tests")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def small_image():
    """Deterministic synthetic test image with blob/corner structure."""
    rng = np.random.default_rng(42)
    h, w = 160, 200
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = 110.0 + 35.0 * np.sin(xx / 13.0) * np.cos(yy / 17.0)
    # scatter gaussian blobs of varying scale/polarity
    for k in range(60):
        cy, cx = rng.uniform(10, h - 10), rng.uniform(10, w - 10)
        s = rng.uniform(1.2, 7.0)
        a = rng.uniform(50, 120) * (1 if k % 2 == 0 else -1)
        img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    # blocky texture to add corners/edges at several scales
    from scipy import ndimage
    blocks = rng.uniform(-60, 60, (h // 8, w // 8))
    img += ndimage.zoom(blocks, 8, order=0)[:h, :w]
    img += rng.normal(0, 3.0, (h, w))
    return np.clip(img, 0, 255).astype(np.float32)


@pytest.fixture(scope="session")
def book_gray():
    """Reference data/book.jpg ingested exactly like the reference
    (BGR imread + RGB2GRAY-on-BGR), downscaled for test speed."""
    cv2 = pytest.importorskip("cv2")
    img = cv2.imread("/root/reference/data/book.jpg")
    assert img is not None
    img = cv2.resize(img, (160, 224))
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    return gray.astype(np.float32)

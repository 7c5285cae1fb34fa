"""Throwaway micro-bench: detect at 1080p vs the gather kernel's DMA
group size _G (patch DMAs in flight per grid step).

One process per arm (jit caches don't key on the module constant):
    for g in 8 16 32; do python tools/gather_g_sweep.py $g; done
"""
import sys

sys.path.insert(0, ".")
import numpy as np

from bench import _chain_ms, _enable_compile_cache  # noqa: E402

g_val = int(sys.argv[1]) if len(sys.argv) > 1 else 8

import sift_tpu.ops.ori_gather_pallas as ogp  # noqa: E402

ogp._G = g_val

_enable_compile_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import cv2  # noqa: E402

from sift_tpu.config import DEFAULT_CONFIG as CFG  # noqa: E402
from sift_tpu import sift  # noqa: E402

big = cv2.imread("/root/reference/data/scene.jpg")
f0 = jnp.asarray(cv2.cvtColor(cv2.resize(big, (1920, 1080)),
                              cv2.COLOR_RGB2GRAY).astype(np.float32))


def det(acc):
    kp, octs = sift.detect(f0 + acc * 1e-9, CFG)
    return kp.x[0] * 1e-9 + acc


def full(acc):
    kp, d = sift.detect_and_compute(f0 + acc * 1e-9, CFG)
    return jnp.sum(d[:4]) + acc


print(f"_G={g_val} detect_ms={_chain_ms(det):.3f} "
      f"detect_describe_ms={_chain_ms(full):.3f}", flush=True)

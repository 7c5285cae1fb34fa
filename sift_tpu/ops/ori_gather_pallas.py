"""Pallas keypoint patch-gather kernel (orientation C8c hot path).

The reference walks a radius window around each keypoint serially
(calcOrientationHist, src/sift.cpp:389-458). The XLA twin gathers one
fixed 39x39 patch per keypoint via vmapped dynamic_slice — which
lowers to one serialized ~3 us gather per keypoint on TPU (measured:
4.5 ms for the 1536 out_caps keypoints at 1080p, the largest single
detect sub-stage). This kernel replaces ONLY the gather: G keypoints
per grid step issue G async patch DMAs from the padded octave stack in
HBM (arbitrary row offset; column start aligned down to the 128-lane
tile), then cut the exact patch window with an in-VMEM lane slice.
Downstream histogram math stays in XLA and is bit-identical to the
dynamic_slice path (tests/test_ori_gather.py).

Patch geometry matches ops/orientation.py: the source stack is padded
by rp+1 so a slice starting at (r0, c0) centers pixel (r0, c0) at
patch[rp+1, rp+1].
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_G = 8            # keypoints (patch DMAs in flight) per grid step
_LANES = 128
_WIN = 256        # lane window: 128-aligned start + patch width <= 256


def _interpret() -> bool:
    return (os.environ.get("SIFT_TPU_INTERPRET_PALLAS", "0") == "1"
            or jax.default_backend() != "tpu")


def _make_kernel(rows_out: int, cols_out: int, rows_dma: int):
    def kernel(lay_sp, rs_sp, cb_sp, off_sp, hbm, out_ref, scratch,
               sems):
        i0 = pl.program_id(0) * _G
        copies = []
        for g in range(_G):
            k = i0 + g
            dma = pltpu.make_async_copy(
                hbm.at[lay_sp[k], pl.ds(rs_sp[k], rows_dma),
                       pl.ds(cb_sp[k], _WIN)],
                scratch.at[g], sems.at[g])
            dma.start()
            copies.append(dma)
        for g in range(_G):
            copies[g].wait()
            off = off_sp[i0 + g]
            out_ref[g] = jax.lax.dynamic_slice(
                scratch[g], (0, off), (rows_out, cols_out))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("patch", "interpret"))
def gather_patches(padded: jnp.ndarray, layer: jnp.ndarray,
                   r: jnp.ndarray, c: jnp.ndarray, patch: int,
                   interpret: bool | None = None) -> jnp.ndarray:
    """Gather (N, patch, patch) windows from a (L, Hp, Wp) stack.

    padded: octave stack already padded so that a window STARTING at
        (r, c) is fully in range for r in [0, H-1], c in [0, W-1]
        (i.e. Hp >= H - 1 + patch, Wp >= W - 1 + patch).
    layer/r/c: (N,) int32 (layer selects the stack plane directly).
    Returns float32 (N, rows_out, cols_out) with rows_out = cols_out =
    patch — identical values to
    vmap(lambda l, r0, c0: dynamic_slice(padded, (l, r0, c0),
                                         (1, patch, patch))[0]).
    """
    if interpret is None:
        interpret = _interpret()
    nlay, hp, wp = padded.shape
    n = layer.shape[0]
    rows_dma = -(-patch // 8) * 8
    cols_out = -(-patch // _LANES) * _LANES
    if cols_out != _LANES:
        raise ValueError(f"patch {patch} exceeds one lane tile")

    # DMA source must fit rows r..r+rows_dma and lanes cb..cb+_WIN;
    # callers guarantee only r <= hp - patch, so pad the difference
    extra_rows = max(0, rows_dma - patch)
    max_cb = ((wp - 1) // _LANES) * _LANES
    extra_cols = max(0, max_cb + _WIN - wp)
    src = jnp.pad(padded, ((0, 0), (0, extra_rows), (0, extra_cols)))
    hp2, wp2 = src.shape[1], src.shape[2]

    lay = jnp.clip(layer, 0, nlay - 1)
    rs = jnp.clip(r, 0, hp2 - rows_dma)
    c0 = jnp.clip(c, 0, wp2 - patch)
    cb = (c0 // _LANES) * _LANES
    off = c0 - cb

    npad = (-n) % _G
    if npad:
        zpad = jnp.zeros((npad,), jnp.int32)
        lay = jnp.concatenate([lay, zpad])
        rs = jnp.concatenate([rs, zpad])
        cb = jnp.concatenate([cb, zpad])
        off = jnp.concatenate([off, zpad])
    ng = (n + npad) // _G

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ng,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((_G, rows_dma, cols_out),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_G, rows_dma, _WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((_G,)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(rows_dma, cols_out, rows_dma),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ng * _G, rows_dma, cols_out),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=(n + npad) * rows_dma * (_WIN + cols_out) * 4,
            transcendentals=0),
        interpret=interpret,
    )(lay, rs, cb, off, src)
    return out[:n, :patch, :patch]

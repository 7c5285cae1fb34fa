"""Pallas keypoint patch-gather kernel (orientation/descriptor C8c/C10
hot path).

The reference walks a radius window around each keypoint serially
(calcOrientationHist, src/sift.cpp:389-458; calcSIFTDescriptor,
src/sift.cpp:579-616). The XLA twin gathers one fixed patch per
keypoint via vmapped dynamic_slice — which lowers to one serialized
~us gather per keypoint on TPU (measured: the largest single detect
sub-stage, BENCH_INTERNALS ori_patch_gather 10.8 ms at 1080p). This
kernel replaces ONLY the gather; downstream histogram math stays in
XLA and is bit-identical to the dynamic_slice path
(tests/test_ori_gather.py, tests/test_descr_gather.py, hardware lane
tests/test_tpu_hardware.py::test_ori_gather_kernel_parity).

Mosaic constraint that shaped the design: f32 memrefs are (8,128)
tiled in BOTH HBM and VMEM, and a DMA source slice must start on a
tile boundary ("failed to prove index divisible by tiling" otherwise)
— an arbitrary (r, c) window cannot be DMA'd directly, and there is
no dynamic sublane/lane slice on values either. So per keypoint:

  1. DMA the enclosing tile-aligned window (rows_dma x 256 from the
     8-aligned row / 128-aligned col below the start) HBM -> VMEM,
     G windows in flight per grid step;
  2. two pltpu.roll's (tpu.dynamic_rotate — dynamic shifts ARE legal)
     rotate the intra-tile remainder (dr, dc) to the origin;
  3. a static slice cuts the patch window.

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

# keypoints (patch DMAs in flight) per grid step; on-chip sweep
# 2026-08-19 (tools/gather_g_sweep.py): G=8 detect 10.03 ms /
# detect+describe 13.23, G=32 9.94 / 12.91 at 1080p — fewer grid
# steps amortize the per-step DMA-issue bubble better
_G = 32
_LANES = 128
_WIN = 256        # lane window: 128-aligned start + dc + patch <= 256


def _interpret() -> bool:
    return (os.environ.get("SIFT_TPU_INTERPRET_PALLAS", "0") == "1"
            or jax.default_backend() != "tpu")


def _make_kernel(rows_dma: int, rows_out: int, ng: int):
    """Double-buffered gather kernel: step i's 2-roll+slice compute
    overlaps step i+1's G patch DMAs (scratch/sems carry a leading
    buffer-parity axis), so DMA latency is hidden behind the VPU work
    instead of serializing with it."""
    def _start(lay_sp, rt_sp, ct_sp, hbm, scratch, sems, step, buf):
        for g in range(_G):
            k = step * _G + g
            # rt/ct are TILE indices: the *8 / *128 inside the kernel
            # is what lets Mosaic prove the slice start divisible by
            # the (8,128) tiling (a pre-multiplied scalar arrives as
            # an arbitrary i32 and the compile fails)
            pltpu.make_async_copy(
                hbm.at[lay_sp[k], pl.ds(rt_sp[k] * 8, rows_dma),
                       pl.ds(ct_sp[k] * _LANES, _WIN)],
                scratch.at[buf, g], sems.at[buf, g]).start()

    def kernel(lay_sp, rt_sp, dr_sp, ct_sp, dc_sp, hbm, out_ref,
               scratch, sems):
        i = pl.program_id(0)
        buf = jax.lax.rem(i, 2)

        @pl.when(i == 0)
        def _():
            _start(lay_sp, rt_sp, ct_sp, hbm, scratch, sems, i, buf)

        @pl.when(i + 1 < ng)
        def _():
            _start(lay_sp, rt_sp, ct_sp, hbm, scratch, sems,
                   i + 1, 1 - buf)

        for g in range(_G):
            k = i * _G + g
            # wait on this buffer's DMA (started at step i-1, or just
            # above when i == 0); the descriptor mirrors the start
            pltpu.make_async_copy(
                hbm.at[lay_sp[k], pl.ds(rt_sp[k] * 8, rows_dma),
                       pl.ds(ct_sp[k] * _LANES, _WIN)],
                scratch.at[buf, g], sems.at[buf, g]).wait()
            x = scratch[buf, g]
            # rotate the remainder offsets to the origin; shifts are
            # dynamic (tpu.dynamic_rotate), negative = toward 0
            x = pltpu.roll(x, rows_dma - dr_sp[k], 0)
            x = pltpu.roll(x, _WIN - dc_sp[k], 1)
            out_ref[g] = x[:rows_out, :_LANES]

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
    Returns float32 (N, patch, patch) with values identical to
    vmap(lambda l, r0, c0: dynamic_slice(padded, (l, r0, c0),
                                         (1, patch, patch))[0]).
    """
    if interpret is None:
        interpret = _interpret()
    nlay, hp, wp = padded.shape
    n = layer.shape[0]
    rows_out = -(-patch // 8) * 8
    rows_dma = rows_out + 8       # 8-aligned start + dr in [0,8) + patch
    if patch > _LANES:
        raise ValueError(f"patch {patch} exceeds one lane tile")

    # clamp starts exactly like dynamic_slice does (against the
    # CALLER's hp/wp), then split into tile-aligned base + remainder
    lay = jnp.clip(layer, 0, nlay - 1)
    rs = jnp.clip(r, 0, hp - patch)
    cs = jnp.clip(c, 0, wp - patch)
    rt = rs // 8
    dr = rs - rt * 8
    ct = cs // _LANES
    dc = cs - ct * _LANES

    # pad the source so every aligned DMA window is in range:
    # rb <= hp - patch  ->  rb + rows_dma <= hp + (rows_dma - patch)
    # cb <= wp - patch  ->  cb + _WIN     <= wp + (_WIN - patch)
    src = jnp.pad(padded, ((0, 0), (0, rows_dma - patch),
                           (0, _WIN - patch)))

    npad = (-n) % _G
    if npad:
        zpad = jnp.zeros((npad,), jnp.int32)
        lay = jnp.concatenate([lay, zpad])
        rt = jnp.concatenate([rt, zpad])
        dr = jnp.concatenate([dr, zpad])
        ct = jnp.concatenate([ct, zpad])
        dc = jnp.concatenate([dc, zpad])
    ng = (n + npad) // _G

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(ng,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((_G, rows_out, _LANES),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _G, rows_dma, _WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _G)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(rows_dma, rows_out, ng),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ng * _G, rows_out, _LANES),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=(n + npad) * rows_dma * (_WIN + _LANES) * 4,
            transcendentals=0),
        interpret=interpret,
    )(lay, rt, dr, ct, dc, src)
    return out[:n, :patch, :patch]

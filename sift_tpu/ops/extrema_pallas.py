"""Fused Pallas DoG extrema-score kernel (reference C8a NMS).

Computes, for each interior pixel of DoG layers 1..nL, the masked
|response| score (−1 where not a 26-neighbor extremum above the
threshold) in one pass: the XLA formulation materializes 26 shifted
copies of the stack (~8 ms at 1080p); here each (row-block) instance
holds a haloed slab in VMEM and the neighbor max/min are unrolled
shift-compares — row shifts on sublanes, only ±1-lane column shifts
(large lane-shift unrolls are what exploded Mosaic compile time in
the blur kernel; ±1 is cheap).

Output feeds the two-stage top-k in ops/extrema.top_candidates.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sift_tpu.config import SIFTConfig, DEFAULT_CONFIG

_BH = 256


def _interpret() -> bool:
    return (os.environ.get("SIFT_TPU_INTERPRET_PALLAS", "0") == "1"
            or jax.default_backend() != "tpu")


def _make_kernel(cfg: SIFTConfig, d: int, h: int, w: int,
                 bh: int, slab_rows: int, wp: int, batched: bool):
    nl = cfg.n_octave_layers
    b = cfg.img_border
    thr = float(cfg.nms_threshold)

    def kernel(dog_hbm, out_ref, slab_ref, sem):
        # batched input is (B*D, Hp, Wp) with grid (B, nrb); the body
        # is identical per frame, so compile time is invariant in B
        bi = pl.program_id(0) if batched else 0
        rb = pl.program_id(1) if batched else pl.program_id(0)
        dma = pltpu.make_async_copy(
            dog_hbm.at[pl.ds(bi * d, d), pl.ds(rb * bh, slab_rows), :],
            slab_ref, sem)
        dma.start()
        dma.wait()

        # global row index of local row 0 (slab starts one halo row
        # above the block; the caller pre-pads the stack by 1 row)
        row0 = rb * bh

        for li in range(1, 1 + nl):
            val = slab_ref[li, 1:1 + bh, :]
            nmax = None
            nmin = None
            for dl in (-1, 0, 1):
                for dr in (0, 1, 2):
                    plane = slab_ref[li + dl, dr:dr + bh, :]
                    for dc in (-1, 0, 1):
                        if dl == 0 and dr == 1 and dc == 0:
                            continue
                        if dc == 0:
                            s = plane
                        else:
                            # ±1 lane shift via pltpu.roll (needs a
                            # non-negative shift; wrap-around columns
                            # are masked off by the border test)
                            s = pltpu.roll(plane, (-dc) % wp, 1)
                        nmax = s if nmax is None else jnp.maximum(nmax, s)
                        nmin = s if nmin is None else jnp.minimum(nmin, s)
            is_ext = ((val > 0) & (val >= nmax)) | \
                ((val < 0) & (val <= nmin))
            mask = (jnp.abs(val) > thr) & is_ext
            rows = jax.lax.broadcasted_iota(jnp.int32, (bh, wp), 0) + row0
            cols = jax.lax.broadcasted_iota(jnp.int32, (bh, wp), 1)
            border = ((rows >= b) & (rows < h - b)
                      & (cols >= b) & (cols < w - b))
            out_ref[li - 1] = jnp.where(mask & border,
                                        jnp.abs(val), -1.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def _scores(dog: jnp.ndarray, cfg: SIFTConfig = DEFAULT_CONFIG,
            interpret: bool = False) -> jnp.ndarray:
    d, h, w = dog.shape
    nl = cfg.n_octave_layers
    bh = min(_BH, max(8, -(-h // 8) * 8))
    nrb = pl.cdiv(h, bh)
    hp = nrb * bh
    slab_rows = -(-(bh + 2) // 8) * 8
    wp = -(-w // 128) * 128
    # pad: 1 halo row above, halo + block + alignment below, lanes
    pin = jnp.pad(dog, ((0, 0), (1, (hp - h) + (slab_rows - bh - 1)),
                        (0, wp - w)))
    kernel = _make_kernel(cfg, d, h, w, bh, slab_rows, wp, False)
    out = pl.pallas_call(
        kernel,
        grid=(nrb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((nl, bh, wp), lambda j: (0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nl, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((d, slab_rows, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 26 * nl * hp * wp,
            bytes_accessed=(d + nl) * hp * wp * 4, transcendentals=0),
        interpret=interpret,
    )(pin)
    return out[:, :h, :w]


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def _scores_batch(dog: jnp.ndarray, cfg: SIFTConfig = DEFAULT_CONFIG,
                  interpret: bool = False) -> jnp.ndarray:
    nb, d, h, w = dog.shape
    nl = cfg.n_octave_layers
    bh = min(_BH, max(8, -(-h // 8) * 8))
    nrb = pl.cdiv(h, bh)
    hp = nrb * bh
    slab_rows = -(-(bh + 2) // 8) * 8
    wp = -(-w // 128) * 128
    pin = jnp.pad(dog, ((0, 0), (0, 0),
                        (1, (hp - h) + (slab_rows - bh - 1)),
                        (0, wp - w))).reshape(nb * d, -1, wp)
    kernel = _make_kernel(cfg, d, h, w, bh, slab_rows, wp, True)
    out = pl.pallas_call(
        kernel,
        grid=(nb, nrb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((nl, bh, wp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * nl, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((d, slab_rows, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 26 * nb * nl * hp * wp,
            bytes_accessed=nb * (d + nl) * hp * wp * 4,
            transcendentals=0),
        interpret=interpret,
    )(pin)
    return out.reshape(nb, nl, hp, wp)[:, :, :h, :w]


def extrema_scores_pallas(dog: jnp.ndarray,
                          cfg: SIFTConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """(D, H, W) DoG stack -> (nL, H, W) masked |response| scores
    (-1 where not a candidate)."""
    return _scores(dog, cfg, _interpret())


def extrema_scores_batch_pallas(dog: jnp.ndarray,
                                cfg: SIFTConfig = DEFAULT_CONFIG
                                ) -> jnp.ndarray:
    """Batched frames: (B, D, H, W) -> (B, nL, H, W) scores."""
    return _scores_batch(dog, cfg, _interpret())

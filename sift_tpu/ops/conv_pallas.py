"""Fused Pallas separable Gaussian blur for scale-space construction.

Replaces the XLA convolution path of ops/conv.py on TPU: XLA lowers
batch-1 small-channel convs poorly (~2.5 Gflops measured). The blur
runs as two 1-D passes of a Pallas kernel whose taps are unrolled
shift-multiply-adds along the SUBLANE (row) axis only — lane-axis
shifts force per-vreg relayout networks that made Mosaic compile time
blow up quadratically with image area. The horizontal pass reuses the
same kernel on the transposed image (cheap XLA transposes between).

The kernel is gridded over (scale, row-block) with the input slab
(BH + 2w rows, incl. halo) DMA'd manually from HBM per instance:
Mosaic compile time scales with the PER-INSTANCE array sizes, so
blocking keeps compilation O(block) instead of O(image) (a whole-image
unrolled variant took >30 min to compile at 1080p), and VMEM use stays
bounded for arbitrarily large frames.

All scales of an octave are produced from the shared base image
(legal because the reference blurs each layer directly from the
octave base, src/sift.cpp:241-258).

Semantics identical to ops/conv.gaussian_blur_multi: truncated
unnormalized kernels, zero padding, and the reference's getSubMatrix
quirk (last row/col read as zero, src/sift.cpp:116).
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sift_tpu.ops.conv import _stack_kernels, _zero_last_row_col

_BH = 256   # output rows per grid instance


def _interpret() -> bool:
    return (os.environ.get("SIFT_TPU_INTERPRET_PALLAS", "0") == "1"
            or jax.default_backend() != "tpu")


def _make_vpass(kmat: np.ndarray, w: int, bh: int, wd: int, s_in: int):
    """Vertical-pass kernel body for one (batch*scale, row-block)
    instance.

    Grid axis 0 runs over batch*S flattened (batch-of-frames support
    for the throughput path; the single-image path is batch == 1).
    Per instance, si = id0 % S selects the taps; s_in == 1 broadcasts
    each frame's one base image to all S of its scale outputs (first
    pass), s_in == S blurs each (frame, scale) plane with its own taps
    (second pass, applied to the transposed first-pass output). The
    kernel body unrolls only over S, so Mosaic compile time is
    invariant in the batch size.
    """
    s, k = kmat.shape
    taps = [[float(kmat[si, di]) for di in range(k)] for si in range(s)]
    slab_rows = -(-(bh + 2 * w) // 8) * 8   # DMA slices need 8-aligned rows

    def kernel(pin_hbm, out_ref, slab_ref, sem):
        bs = pl.program_id(0)
        rb = pl.program_id(1)
        si = jax.lax.rem(bs, s)
        b = jax.lax.div(bs, s)
        src = b * s_in + (0 if s_in == 1 else si)
        dma = pltpu.make_async_copy(
            pin_hbm.at[src, pl.ds(rb * bh, slab_rows), :],
            slab_ref, sem)
        dma.start()
        dma.wait()
        for sidx in range(s):
            @pl.when(si == sidx)
            def _():
                first = True
                for di in range(k):
                    t = taps[sidx][di]
                    if t == 0.0:
                        continue
                    sl = slab_ref[di:di + bh, :] * t
                    out_ref[0] = sl if first else out_ref[0] + sl
                    first = False

    return kernel


def _vpass(x: jnp.ndarray, kmat: np.ndarray, w: int,
           interpret: bool, n_batch: int = 1) -> jnp.ndarray:
    """(n_batch * s_in, H, W) -> (n_batch * S, H, W) vertical blur,
    where s_in is 1 (first pass, base broadcast) or S (second pass)."""
    s = kmat.shape[0]
    s_in, h, wd = x.shape
    s_in //= n_batch
    bh = min(_BH, max(8, -(-h // 8) * 8))
    nrb = pl.cdiv(h, bh)
    hp = nrb * bh
    slab_rows = -(-(bh + 2 * w) // 8) * 8
    wp = -(-wd // 128) * 128    # DMA lane slices must be 128-aligned
    # rows: w halo above; below: halo + block padding + DMA row
    # alignment so the last block's slab stays in bounds
    pad_below = (hp - h) + (slab_rows - bh)
    pin = jnp.pad(x, ((0, 0), (w, pad_below), (0, wp - wd)))
    kernel = _make_vpass(kmat, w, bh, wp, s_in)
    out = pl.pallas_call(
        kernel,
        grid=(n_batch * s, nrb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, bh, wp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_batch * s, hp, wp),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_batch * s * hp * wp * kmat.shape[1],
            bytes_accessed=n_batch * (s_in + s) * hp * wp * 4,
            transcendentals=0),
        interpret=interpret,
    )(pin)
    return out[:, :h, :wd]


@functools.partial(jax.jit,
                   static_argnames=("sigmas", "interpret", "apply_quirk"))
def _blur_multi(img: jnp.ndarray, sigmas, interpret: bool,
                apply_quirk: bool = True) -> jnp.ndarray:
    kmat, w = _stack_kernels(list(sigmas))
    x = img.astype(jnp.float32)
    if apply_quirk:
        x = _zero_last_row_col(x)
    v = _vpass(x[None], kmat, w, interpret)          # (S, H, W)
    vt = jnp.transpose(v, (0, 2, 1))                 # (S, W, H)
    ht = _vpass(vt, kmat, w, interpret)              # (S, W, H)
    return jnp.transpose(ht, (0, 2, 1))              # (S, H, W)


def gaussian_blur_multi_pallas(img: jnp.ndarray,
                               sigmas: Sequence[float],
                               apply_quirk: bool = True) -> jnp.ndarray:
    """Blur one image with several sigmas at once: (H, W) -> (S, H, W).

    apply_quirk=False skips the in-function getSubMatrix last-row/col
    zeroing for callers that apply the quirk in GLOBAL coordinates
    themselves (the spatially-tiled path, parallel/spatial.py)."""
    return _blur_multi(img, tuple(float(s) for s in sigmas),
                       _interpret(), apply_quirk)


@functools.partial(jax.jit, static_argnames=("sigmas", "interpret"))
def _blur_multi_b(imgs: jnp.ndarray, sigmas, interpret: bool
                  ) -> jnp.ndarray:
    nb = imgs.shape[0]
    kmat, w = _stack_kernels(list(sigmas))
    s = kmat.shape[0]
    x = imgs.astype(jnp.float32)
    x = x.at[:, -1, :].set(0.0).at[:, :, -1].set(0.0)
    v = _vpass(x, kmat, w, interpret, n_batch=nb)      # (B*S, H, W)
    vt = jnp.transpose(v, (0, 2, 1))                   # (B*S, W, H)
    ht = _vpass(vt, kmat, w, interpret, n_batch=nb)    # (B*S, W, H)
    out = jnp.transpose(ht, (0, 2, 1))                 # (B*S, H, W)
    return out.reshape(nb, s, *imgs.shape[1:])


def gaussian_blur_multi_batch_pallas(imgs: jnp.ndarray,
                                     sigmas: Sequence[float]
                                     ) -> jnp.ndarray:
    """Batched frames: (B, H, W) -> (B, S, H, W); one pallas_call per
    pass with the batch flattened into the grid (throughput path)."""
    return _blur_multi_b(imgs, tuple(float(s) for s in sigmas),
                         _interpret())

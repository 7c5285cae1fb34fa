"""Fused Pallas separable Gaussian blur for scale-space construction.

Replaces the XLA convolution path of ops/conv.py on TPU: XLA lowers
batch-1 small-channel convs poorly (~2.5 Gflops measured). The blur
runs as two 1-D passes of a Pallas kernel whose taps are unrolled
shift-multiply-adds along the SUBLANE (row) axis only — lane-axis
shifts force per-vreg relayout networks that made Mosaic compile time
blow up quadratically with image area. The horizontal pass reuses the
same kernel on the transposed image (cheap XLA transposes between).

All scales of an octave are produced by one pass pair from the shared
base image (legal because the reference blurs each layer directly from
the octave base, src/sift.cpp:241-258).

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


def _interpret() -> bool:
    return (os.environ.get("SIFT_TPU_INTERPRET_PALLAS", "0") == "1"
            or jax.default_backend() != "tpu")


def _make_vpass(kmat: np.ndarray, h: int, wd: int, s_in: int):
    """Vertical-pass kernel: (s_in, h+2w, wd) -> (S, h, wd).

    s_in == 1 broadcasts one base image to all S scale outputs (first
    pass); s_in == S blurs each scale plane with its own taps (second
    pass, applied to the transposed first-pass output).
    """
    s, k = kmat.shape
    taps = [[float(kmat[si, di]) for di in range(k)] for si in range(s)]

    def kernel(pin_ref, out_ref):
        pid = pl.program_id(0)
        for si in range(s):
            @pl.when(pid == si)
            def _():
                src = 0 if s_in == 1 else si
                first = True
                for di in range(k):
                    t = taps[si][di]
                    if t == 0.0:
                        continue
                    sl = pin_ref[src, di:di + h, :] * t
                    out_ref[0] = sl if first else out_ref[0] + sl
                    first = False

    return kernel


def _vpass(x: jnp.ndarray, kmat: np.ndarray, w: int,
           interpret: bool) -> jnp.ndarray:
    """(s_in, H, W) -> (S, H, W): per-scale vertical blur."""
    s = kmat.shape[0]
    s_in, h, wd = x.shape
    pin = jnp.pad(x, ((0, 0), (w, w), (0, 0)))
    kernel = _make_vpass(kmat, h, wd, s_in)
    return pl.pallas_call(
        kernel,
        grid=(s,),
        out_shape=jax.ShapeDtypeStruct((s, h, wd), jnp.float32),
        in_specs=[pl.BlockSpec((s_in, h + 2 * w, wd), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, wd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * h * wd * kmat.shape[1],
            bytes_accessed=(s_in + s) * h * wd * 4, transcendentals=0),
        interpret=interpret,
    )(x if w == 0 else pin)


@functools.partial(jax.jit, static_argnames=("sigmas", "interpret"))
def _blur_multi(img: jnp.ndarray, sigmas, interpret: bool) -> jnp.ndarray:
    kmat, w = _stack_kernels(list(sigmas))
    x = _zero_last_row_col(img.astype(jnp.float32))
    v = _vpass(x[None], kmat, w, interpret)          # (S, H, W)
    vt = jnp.transpose(v, (0, 2, 1))                 # (S, W, H)
    ht = _vpass(vt, kmat, w, interpret)              # (S, W, H)
    return jnp.transpose(ht, (0, 2, 1))              # (S, H, W)


def gaussian_blur_multi_pallas(img: jnp.ndarray,
                               sigmas: Sequence[float]) -> jnp.ndarray:
    """Blur one image with several sigmas at once: (H, W) -> (S, H, W)."""
    return _blur_multi(img, tuple(float(s) for s in sigmas),
                       _interpret())

"""Fused Pallas descriptor kernel (reference C10, TPU speed-of-light).

The XLA path (ops/descriptor.py) materializes the per-sample trilinear
one-hot matrix rc (P, 36) in HBM for every keypoint chunk — gigabytes
of HBM traffic per frame, which made description the most expensive
stage. This kernel runs one grid instance per keypoint:

  1. DMA the keypoint's (2rd+3)^2 patch from the HBM-resident padded
     octave stack into VMEM (indices scalar-prefetched),
  2. gradient + fastAtan2 + rotated trilinear weights on the VPU,
  3. a single (P, 6)^T x (P, 60) histogram contraction on the MXU with
     every intermediate VMEM-resident,
  4. the reference's exact normalization chain (L2-clip, x512, uchar
     saturate, sqrt-L1 tail — src/sift.cpp:689-721),

writing one (4, 32) = 128-float tile per instance.

Mosaic layout note (the round-1 blocker): lane-dimension-changing
reshapes like (83, 83) -> (P, 1) are unsupported ("unsupported shape
cast"). The fix is to put the HISTOGRAM CHANNEL on the lane dimension
from the start — the row one-hot rw is built as (hh, ww, 6) and the
col x orientation one-hot cbo as (hh, ww, 60) via lane iota compares,
then flattened by MERGING LEADING DIMS ONLY ((hh, ww, k) ->
(hh*ww, k), which Mosaic supports) and contracted over samples on the
MXU. The (b, o) fold + spatial-interior selection becomes one
constant (60, 32) matmul instead of lane-strided slicing.

STATUS (round 2, measured on v5e): compiles AND matches the XLA path
on hardware at small radii, but is NOT the live path, for measured
reasons rather than speculation:
  * compile time scales ~quadratically with patch area (the
    (hh, ww, 60) one-hots unroll to ~hh x ceil(ww/8) vregs PER OP:
    142 s at rd=11, ~1 h at the production rd=41 — long enough to
    wedge the shared axon compile service);
  * runtime is instruction-issue-bound: 7.2 us/keypoint at rd=11
    (P=529!), because the channel-on-lane one-hots issue ~913 vector
    ops per elementwise op at rd=41 and the per-keypoint grid cannot
    amortize DMA latency.
The live XLA formulation (ops/descriptor.py, bf16 one-hot) does the
same math at ~6 us/keypoint at rd=41 with none of the compile risk,
so it remains the production path; this kernel stays as an
interpret-tested correctness twin and a record of the design space.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sift_tpu.config import SIFTConfig, DEFAULT_CONFIG
from sift_tpu.types import Keypoints
from sift_tpu.ops.mathutil import fast_atan2_deg

_FLT_EPS = float(np.float32(1.1920929e-07))


def _interpret() -> bool:
    return (os.environ.get("SIFT_TPU_INTERPRET_PALLAS", "0") == "1"
            or jax.default_backend() != "tpu")


def _round_half_even(x):
    # cvRound twin without int cast (stays in float for the kernel)
    f = jnp.floor(x)
    d = x - f
    odd = jnp.mod(f, 2.0)
    up = (d > 0.5) | ((d == 0.5) & (odd == 1.0))
    return f + jnp.where(up, 1.0, 0.0)


def _fold_matrix(d: int, n: int) -> np.ndarray:
    """(d+2)*(n+2) -> d*n constant: circular-orientation fold
    (src/sift.cpp:676-684) + interior-column selection, applied as one
    matmul because Mosaic can't lane-stride-slice."""
    f = np.zeros(((d + 2) * (n + 2), d * n), np.float32)
    for b in range(d + 2):
        for o in range(n + 2):
            bp = b - 1
            if not (0 <= bp < d):
                continue
            op = o % n              # slots n, n+1 fold onto 0, 1
            f[b * (n + 2) + o, bp * n + op] = 1.0
    return f


def _dma_window(ph: int):
    """Aligned DMA window holding a (ph, ph) patch at any offset."""
    rows = ((ph + 7 + 7) // 8) * 8          # +7 sublane misalignment
    cols = ((ph + 127 + 127) // 128) * 128  # +127 lane misalignment
    return rows, cols


def _make_kernel(cfg: SIFTConfig, h: int, w: int, rd: int):
    d = cfg.descr_width
    n = cfg.descr_hist_bins
    ph = 2 * rd + 3
    hh = ww = 2 * rd + 1
    _ROWS, _COLS = _dma_window(ph)
    diag = float(int(math.sqrt(float(w) * w + float(h) * h)))
    exp_scale = -1.0 / (d * d * 0.5)
    bins_per_rad = n / 360.0
    fold = _fold_matrix(d, n)                    # (60, 32) for d=4,n=8

    def kernel(lay_ref, r_ref, c_ref, scl_ref, ori_ref, valid_ref,
               stack_ref, fold_ref, out_ref, patch_ref, sem):
        i = pl.program_id(0)
        l0 = lay_ref[i]
        r0 = r_ref[i]
        c0 = c_ref[i]
        scl = scl_ref[i]
        ori = ori_ref[i]
        valid = valid_ref[i]

        # 1. patch DMA. Mosaic requires DMA slices 8-aligned on
        # sublanes and 128-aligned on lanes, so copy an aligned
        # (ROWS, COLS) window containing the patch, then extract the
        # (ph, ph) patch at its dynamic in-window offset with two
        # small selector matmuls (dynamic lane slicing is unsupported;
        # a (ph, ROWS) x (ROWS, COLS) x (COLS, ph) product is ~8 MFLOP
        # and always compiles).
        r0a = (r0 // 8) * 8
        c0a = (c0 // 128) * 128
        dma = pltpu.make_async_copy(
            stack_ref.at[l0, pl.ds(r0a, _ROWS), pl.ds(c0a, _COLS)],
            patch_ref, sem)
        dma.start()
        dr = (r0 - r0a).astype(jnp.float32)
        dc = (c0 - c0a).astype(jnp.float32)
        u_sel = jax.lax.broadcasted_iota(jnp.int32, (ph, _ROWS), 0)
        s_sel = jax.lax.broadcasted_iota(jnp.int32, (ph, _ROWS), 1)
        p_row = (s_sel.astype(jnp.float32)
                 == u_sel.astype(jnp.float32) + dr).astype(jnp.float32)
        v_sel = jax.lax.broadcasted_iota(jnp.int32, (_COLS, ph), 0)
        t_sel = jax.lax.broadcasted_iota(jnp.int32, (_COLS, ph), 1)
        p_col = (v_sel.astype(jnp.float32)
                 == t_sel.astype(jnp.float32) + dc).astype(jnp.float32)
        dma.wait()
        patch = jax.lax.dot_general(
            jax.lax.dot_general(
                p_row, patch_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32),
            p_col,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (ph, ph)

        # 2. gradients + rotated bin coordinates (src/sift.cpp:587-634)
        dx = patch[1:-1, 2:] - patch[1:-1, :-2]            # (hh, ww)
        dy = patch[:-2, 1:-1] - patch[2:, 1:-1]

        hist_width = cfg.descr_scl_fctr * scl
        radius = _round_half_even(
            hist_width * math.sqrt(2.0) * (d + 1) * 0.5)
        radius = jnp.minimum(radius, diag)
        cos_t = jnp.cos(ori * (math.pi / 180.0)) / hist_width
        sin_t = jnp.sin(ori * (math.pi / 180.0)) / hist_width

        # tpu.iota only supports integers; cast after
        ii = jax.lax.broadcasted_iota(
            jnp.int32, (hh, 1), 0).astype(jnp.float32) - float(rd)
        jj = jax.lax.broadcasted_iota(
            jnp.int32, (1, ww), 1).astype(jnp.float32) - float(rd)
        c_rot = jj * cos_t - ii * sin_t
        r_rot = jj * sin_t + ii * cos_t
        rbin = r_rot + (d / 2 - 0.5)
        cbin = c_rot + (d / 2 - 0.5)
        rr = r0.astype(jnp.float32) + ii
        cc = c0.astype(jnp.float32) + jj
        m = ((rbin > -1) & (rbin < d) & (cbin > -1) & (cbin < d)
             & (rr > 0) & (rr < h - 1) & (cc > 0) & (cc < w - 1)
             & (jnp.abs(ii) <= radius) & (jnp.abs(jj) <= radius))

        wgt = jnp.exp((c_rot * c_rot + r_rot * r_rot) * exp_scale)
        mag_g = jnp.sqrt(dx * dx + dy * dy)
        theta = fast_atan2_deg(dy, dx)
        obin = (theta - ori) * bins_per_rad
        mag = jnp.where(m, mag_g * wgt, 0.0)

        r0i = jnp.floor(rbin)
        c0i = jnp.floor(cbin)
        o0i = jnp.floor(obin)
        fr = (rbin - r0i)[:, :, None]
        fc = (cbin - c0i)[:, :, None]
        fo = (obin - o0i)[:, :, None]
        o0i = jnp.where(o0i < 0, o0i + n, o0i)
        o0i = jnp.where(o0i >= n, o0i - n, o0i)
        r0i = r0i[:, :, None]
        c0i = c0i[:, :, None]
        o0i = o0i[:, :, None]

        # 3. channel-on-lane one-hots (see module docstring)
        a6 = jax.lax.broadcasted_iota(
            jnp.int32, (hh, ww, d + 2), 2).astype(jnp.float32)
        rw = ((a6 == r0i + 1.0) * (1.0 - fr)
              + (a6 == r0i + 2.0) * fr)                    # (hh, ww, 6)
        l60 = jax.lax.broadcasted_iota(
            jnp.int32, (hh, ww, (d + 2) * (n + 2)), 2)
        b6 = (l60 // (n + 2)).astype(jnp.float32)
        o10 = (l60 % (n + 2)).astype(jnp.float32)
        cw = ((b6 == c0i + 1.0) * (1.0 - fc)
              + (b6 == c0i + 2.0) * fc)
        ow = ((o10 == o0i) * (1.0 - fo)
              + (o10 == o0i + 1.0) * fo)
        cbo = cw * ow * mag[:, :, None]                    # (hh, ww, 60)

        rw2 = rw.reshape(hh * ww, d + 2)          # leading-dim merge
        cbo2 = cbo.reshape(hh * ww, (d + 2) * (n + 2))
        hist = jax.lax.dot_general(
            rw2, cbo2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (6, 60)

        # fold (b, o) channels + select interior rows/cols -> (4, 32)
        folded = jax.lax.dot_general(
            hist, fold_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (6, 32)
        dst = folded[1:1 + d, :]                           # (4, 32)

        # 4. normalization chain (src/sift.cpp:689-721)
        nrm2 = jnp.sum(dst * dst)
        thr = jnp.sqrt(nrm2) * cfg.descr_mag_thr
        dst = jnp.minimum(dst, thr)
        nrm2 = jnp.sum(dst * dst)
        nrm2 = cfg.int_descr_fctr / jnp.maximum(jnp.sqrt(nrm2),
                                                _FLT_EPS)
        q = jnp.clip(_round_half_even(dst * nrm2), 0.0, 255.0)
        q = q * nrm2
        nrm1 = 1.0 / jnp.maximum(jnp.sum(q), _FLT_EPS)
        out_ref[0, :d, :] = jnp.sqrt(q * nrm1) * valid

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "hw"))
def _descriptors_padded(padded: jnp.ndarray, lay: jnp.ndarray,
                        r: jnp.ndarray, c: jnp.ndarray,
                        scl: jnp.ndarray, ori: jnp.ndarray,
                        validf: jnp.ndarray, hw,
                        cfg: SIFTConfig = DEFAULT_CONFIG,
                        interpret: bool = False) -> jnp.ndarray:
    h, w = hw
    d = cfg.descr_width
    n = cfg.descr_hist_bins
    rd = cfg.descr_patch_radius
    n_kp = lay.shape[0]
    ph = 2 * rd + 3
    kernel = _make_kernel(cfg, h, w, rd)
    fold = jnp.asarray(_fold_matrix(d, n))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_kp,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # stack stays in HBM
            pl.BlockSpec(((d + 2) * (n + 2), d * n),
                         lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # fold matrix
        ],
        out_specs=pl.BlockSpec((1, 8, d * n),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(_dma_window(ph), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_kp, 8, d * n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lay, r, c, scl, ori, validf, padded, fold)
    # (N, 8, 32) -> (N, 4, 32) -> (N, 128); XLA reshapes freely
    return out[:, :d, :].reshape(n_kp, d * d * n)


def descriptors_octave_pallas(gauss: jnp.ndarray, kp: Keypoints,
                              cfg: SIFTConfig = DEFAULT_CONFIG
                              ) -> jnp.ndarray:
    """Descriptors for one octave's keypoint batch: (N,) -> (N, 128).

    Drop-in twin of ops.descriptor.descriptors_octave.
    """
    rd = cfg.descr_patch_radius
    s, h, w = gauss.shape
    pad = rd + 1
    # right/bottom headroom so the aligned DMA window never reads out
    # of bounds: window start <= patch start, window end <= patch
    # start + (ROWS|COLS)
    rows, cols = _dma_window(2 * rd + 3)
    hp = ((h + 2 * pad + rows + 7) // 8) * 8
    wp = ((w + 2 * pad + cols + 127) // 128) * 128
    padded = jnp.pad(gauss, ((0, 0), (pad, hp - h - pad),
                             (pad, wp - w - pad)))

    octave = kp.octave[0]
    inv_scale = jnp.exp2(-octave.astype(jnp.float32))
    scl = kp.size * inv_scale * 0.5                 # src/sift.cpp:745-751
    ori = 360.0 - kp.angle                          # src/sift.cpp:748-750
    ori = jnp.where(jnp.abs(ori - 360.0) < _FLT_EPS, 0.0, ori)
    return _descriptors_padded(padded, kp.layer, kp.r, kp.c, scl, ori,
                               kp.valid.astype(jnp.float32),
                               (h, w), cfg, _interpret())

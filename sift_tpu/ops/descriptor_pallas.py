"""Fused Pallas descriptor kernel (reference C10, TPU speed-of-light).

The XLA path (ops/descriptor.py) materializes the per-sample trilinear
one-hot matrix rc (P, 36) in HBM for every keypoint chunk — ~4 GB of
HBM traffic per 960x960 frame, which made description the most
expensive stage. This kernel runs one grid instance per keypoint:

  1. DMA the keypoint's (2rd+3)^2 patch from the HBM-resident padded
     octave stack into VMEM (indices scalar-prefetched),
  2. gradient + fastAtan2 + rotated trilinear weights on the VPU,
  3. the (36, P) x (P, 10) histogram contraction on the MXU with every
     intermediate VMEM-resident,
  4. the reference's exact normalization chain (L2-clip, x512, uchar
     saturate, sqrt-L1 tail — src/sift.cpp:689-721),

writing one 128-float row per instance. Math is copied 1:1 from
ops/descriptor.py (the golden-tested twin); only the memory layout is
new.

STATUS: validated bit-for-bit against the XLA path in interpret mode
(tests/test_descriptor_pallas.py) but NOT yet the live TPU path —
Mosaic rejects the (2rd+1, 2rd+1) -> (P,) sample flatten ("unsupported
shape cast"; lane-dimension-changing reshapes are unsupported), so
compilation on hardware fails. The live pipeline keeps the XLA path.
A flat-sample-layout variant (XLA computes per-sample bins/magnitudes
padded to (N, 56*128), kernel transposes and contracts on the MXU) is
the planned fix.
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


def _make_kernel(cfg: SIFTConfig, h: int, w: int, rd: int):
    d = cfg.descr_width
    n = cfg.descr_hist_bins
    ph = 2 * rd + 3
    pw = 2 * rd + 3
    diag = float(int(math.sqrt(float(w) * w + float(h) * h)))
    exp_scale = -1.0 / (d * d * 0.5)
    bins_per_rad = n / 360.0

    def kernel(lay_ref, r_ref, c_ref, scl_ref, ori_ref, valid_ref,
               stack_ref, out_ref, patch_ref, sem):
        i = pl.program_id(0)
        l0 = lay_ref[i]
        r0 = r_ref[i]
        c0 = c_ref[i]
        scl = scl_ref[i]
        ori = ori_ref[i]
        valid = valid_ref[i]

        # 1. patch DMA: HBM stack -> VMEM scratch
        dma = pltpu.make_async_copy(
            stack_ref.at[l0, pl.ds(r0, ph), pl.ds(c0, pw)],
            patch_ref, sem)
        dma.start()
        dma.wait()
        patch = patch_ref[:]

        # 2. gradients + rotated bin coordinates (src/sift.cpp:587-634)
        dx = patch[1:-1, 2:] - patch[1:-1, :-2]        # (2rd+1, 2rd+1)
        dy = patch[:-2, 1:-1] - patch[2:, 1:-1]

        hist_width = cfg.descr_scl_fctr * scl
        radius = _round_half_even(
            hist_width * math.sqrt(2.0) * (d + 1) * 0.5)
        radius = jnp.minimum(radius, diag)
        cos_t = jnp.cos(ori * (math.pi / 180.0)) / hist_width
        sin_t = jnp.sin(ori * (math.pi / 180.0)) / hist_width

        # tpu.iota only supports integers; cast after
        ii = jax.lax.broadcasted_iota(
            jnp.int32, (ph - 2, 1), 0).astype(jnp.float32) - float(rd)
        jj = jax.lax.broadcasted_iota(
            jnp.int32, (1, pw - 2), 1).astype(jnp.float32) - float(rd)
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

        p = (ph - 2) * (pw - 2)
        rbin_f = rbin.reshape(p, 1)
        cbin_f = cbin.reshape(p, 1)
        obin_f = obin.reshape(p, 1)
        mag_f = mag.reshape(p, 1)

        r0i = jnp.floor(rbin_f)
        c0i = jnp.floor(cbin_f)
        o0i = jnp.floor(obin_f)
        fr = rbin_f - r0i
        fc = cbin_f - c0i
        fo = obin_f - o0i
        o0i = jnp.where(o0i < 0, o0i + n, o0i)
        o0i = jnp.where(o0i >= n, o0i - n, o0i)

        # 3. trilinear soft one-hots -> MXU contraction
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (p, d + 2), 1).astype(jnp.float32)
        rw = ((rows == (r0i + 1.0)) * (1.0 - fr)
              + (rows == (r0i + 2.0)) * fr)              # (P, 6)
        cw = ((rows == (c0i + 1.0)) * (1.0 - fc)
              + (rows == (c0i + 2.0)) * fc)              # (P, 6)
        obins = jax.lax.broadcasted_iota(
            jnp.int32, (p, n + 2), 1).astype(jnp.float32)
        ow = ((obins == o0i) * (1.0 - fo)
              + (obins == (o0i + 1.0)) * fo) * mag_f     # (P, 10)

        # rc (P, 36) lives only in VMEM
        rc = (rw.reshape(p, d + 2, 1)
              * cw.reshape(p, 1, d + 2)).reshape(p, (d + 2) * (d + 2))
        hist = jax.lax.dot_general(
            rc, ow, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (36, 10)
        hist = hist.reshape(d + 2, d + 2, n + 2)

        # circular orientation fold (src/sift.cpp:676-684)
        h0 = hist[:, :, 0] + hist[:, :, n]
        h1 = hist[:, :, 1] + hist[:, :, n + 1]
        hist = jnp.concatenate(
            [h0[:, :, None], h1[:, :, None], hist[:, :, 2:n]], axis=2)
        dst = hist[1:1 + d, 1:1 + d, :].reshape(1, d * d * n)

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
        # (1, 8, 128) block: row 0 carries the descriptor, rows 1..7
        # are sublane padding (TPU block tiling rule)
        out_ref[0, 0, :] = (jnp.sqrt(q * nrm1) * valid).reshape(-1)

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "hw"))
def _descriptors_padded(padded: jnp.ndarray, lay: jnp.ndarray,
                        r: jnp.ndarray, c: jnp.ndarray,
                        scl: jnp.ndarray, ori: jnp.ndarray,
                        validf: jnp.ndarray, hw,
                        cfg: SIFTConfig = DEFAULT_CONFIG,
                        interpret: bool = False) -> jnp.ndarray:
    h, w = hw
    rd = cfg.descr_patch_radius
    n_kp = lay.shape[0]
    ph = 2 * rd + 3
    kernel = _make_kernel(cfg, h, w, rd)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_kp,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # stack stays in HBM
        ],
        out_specs=pl.BlockSpec((1, 8, cfg.descr_size),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ph, ph), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_kp, 8, cfg.descr_size),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lay, r, c, scl, ori, validf, padded)[:, 0]


def descriptors_octave_pallas(gauss: jnp.ndarray, kp: Keypoints,
                              cfg: SIFTConfig = DEFAULT_CONFIG
                              ) -> jnp.ndarray:
    """Descriptors for one octave's keypoint batch: (N,) -> (N, 128).

    Drop-in twin of ops.descriptor.descriptors_octave.
    """
    rd = cfg.descr_patch_radius
    s, h, w = gauss.shape
    pad = rd + 1
    padded = jnp.pad(gauss, ((0, 0), (pad, pad), (pad, pad)))

    octave = kp.octave[0]
    inv_scale = jnp.exp2(-octave.astype(jnp.float32))
    scl = kp.size * inv_scale * 0.5                 # src/sift.cpp:745-751
    ori = 360.0 - kp.angle                          # src/sift.cpp:748-750
    ori = jnp.where(jnp.abs(ori - 360.0) < _FLT_EPS, 0.0, ori)
    return _descriptors_padded(padded, kp.layer, kp.r, kp.c, scl, ori,
                               kp.valid.astype(jnp.float32),
                               (h, w), cfg, _interpret())

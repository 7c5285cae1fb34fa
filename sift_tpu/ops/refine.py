"""Batched subpixel refinement + contrast/edge filtering (reference C8b).

Functional twin of adjustLocalExtrema (src/sift.cpp:287-388): up to 5
Newton steps on the 3x3x3 DoG cube, quadratic-fit contrast test, and
Hessian edge-response test. The reference refines one keypoint at a
time with an LU solve; we vmap a closed-form Cramer 3x3 solve over a
fixed-capacity candidate batch with masked state — no data-dependent
control flow, everything unrolled for XLA.

Matching OpenCV's Matx::solve(DECOMP_LU) behavior on singular Hessians
(solution := 0, which the reference then treats as converged), we map
|det| ~ 0 to a zero update.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sift_tpu.config import SIFTConfig, DEFAULT_CONFIG
from sift_tpu.ops.mathutil import cv_round

_IMG_SCALE = 1.0 / 255.0       # src/sift.cpp:291
_DERIV_SCALE = _IMG_SCALE * 0.5
_SECOND_DERIV_SCALE = _IMG_SCALE
_CROSS_DERIV_SCALE = _IMG_SCALE * 0.25
_DIVERGE_LIMIT = float(2 ** 31) / 3.0   # src/sift.cpp:335-338


class Refined(NamedTuple):
    """Per-candidate refinement result (octave-space)."""
    layer: jnp.ndarray
    r: jnp.ndarray
    c: jnp.ndarray
    xi: jnp.ndarray
    xr: jnp.ndarray
    xc: jnp.ndarray
    contr: jnp.ndarray
    valid: jnp.ndarray


def _solve3x3(h00, h01, h02, h11, h12, h22, b0, b1, b2):
    """Cramer solve of the symmetric 3x3 system H x = b.

    Returns (x0, x1, x2, ok). On |det| ~ 0 returns zeros with ok=True,
    mirroring OpenCV's singular-LU behavior the reference inherits.
    """
    c00 = h11 * h22 - h12 * h12
    c01 = h02 * h12 - h01 * h22
    c02 = h01 * h12 - h02 * h11
    det = h00 * c00 + h01 * c01 + h02 * c02
    c11 = h00 * h22 - h02 * h02
    c12 = h01 * h02 - h00 * h12
    c22 = h00 * h11 - h01 * h01
    safe = jnp.abs(det) > 1e-30
    inv_det = jnp.where(safe, 1.0 / jnp.where(safe, det, 1.0), 0.0)
    x0 = (c00 * b0 + c01 * b1 + c02 * b2) * inv_det
    x1 = (c01 * b0 + c11 * b1 + c12 * b2) * inv_det
    x2 = (c02 * b0 + c12 * b1 + c22 * b2) * inv_det
    return x0, x1, x2


def _cube_derivs(cube):
    """First/second derivatives from a 3x3x3 DoG cube (center [1,1,1]).

    Layout: cube[0]=prev layer, cube[1]=current, cube[2]=next; spatial
    center at (1,1). Scaling per src/sift.cpp:291-295.
    """
    img = cube[1]
    prev, nxt = cube[0], cube[2]
    d0 = (img[1, 2] - img[1, 0]) * _DERIV_SCALE            # dD/dx
    d1 = (img[2, 1] - img[0, 1]) * _DERIV_SCALE            # dD/dy
    d2 = (nxt[1, 1] - prev[1, 1]) * _DERIV_SCALE           # dD/ds
    v2 = img[1, 1] * 2.0
    dxx = (img[1, 2] + img[1, 0] - v2) * _SECOND_DERIV_SCALE
    dyy = (img[2, 1] + img[0, 1] - v2) * _SECOND_DERIV_SCALE
    dss = (nxt[1, 1] + prev[1, 1] - v2) * _SECOND_DERIV_SCALE
    dxy = (img[2, 2] - img[2, 0] - img[0, 2] + img[0, 0]) * _CROSS_DERIV_SCALE
    dxs = (nxt[1, 2] - nxt[1, 0] - prev[1, 2] + prev[1, 0]) * _CROSS_DERIV_SCALE
    dys = (nxt[2, 1] - nxt[0, 1] - prev[2, 1] + prev[0, 1]) * _CROSS_DERIV_SCALE
    return (d0, d1, d2), (dxx, dxy, dxs, dyy, dys, dss), img[1, 1]


def refine_candidates(dog: jnp.ndarray,
                      layer: jnp.ndarray, r: jnp.ndarray, c: jnp.ndarray,
                      valid: jnp.ndarray,
                      cfg: SIFTConfig = DEFAULT_CONFIG) -> Refined:
    """Refine a batch of candidates on one octave's (D, H, W) DoG stack."""
    h, w = dog.shape[1], dog.shape[2]
    nl = cfg.n_octave_layers
    border = cfg.img_border

    def one(layer0, r0, c0, valid0):
        def gather_cube(l, rr, cc):
            return jax.lax.dynamic_slice(dog, (l - 1, rr - 1, cc - 1),
                                         (3, 3, 3))

        lay, rr, cc = layer0, r0, c0
        xi = jnp.float32(0.0)
        xr = jnp.float32(0.0)
        xc = jnp.float32(0.0)
        converged = jnp.bool_(False)
        alive = valid0

        # unrolled SIFT_MAX_INTERP_STEPS Newton steps (src/sift.cpp:300-348)
        for _ in range(cfg.max_interp_steps):
            active = alive & ~converged
            cube = gather_cube(lay, rr, cc)
            (d0, d1, d2), (dxx, dxy, dxs, dyy, dys, dss), _ = _cube_derivs(cube)
            x0, x1, x2 = _solve3x3(dxx, dxy, dxs, dyy, dys, dss, d0, d1, d2)
            nxi, nxr, nxc = -x2, -x1, -x0
            finite = (jnp.isfinite(nxi) & jnp.isfinite(nxr)
                      & jnp.isfinite(nxc))
            conv_now = ((jnp.abs(nxi) < 0.5) & (jnp.abs(nxr) < 0.5)
                        & (jnp.abs(nxc) < 0.5) & finite)
            diverged = ~finite | (jnp.abs(nxi) > _DIVERGE_LIMIT) | \
                (jnp.abs(nxr) > _DIVERGE_LIMIT) | (jnp.abs(nxc) > _DIVERGE_LIMIT)
            # update stored offsets whenever this step ran
            xi = jnp.where(active, nxi, xi)
            xr = jnp.where(active, nxr, xr)
            xc = jnp.where(active, nxc, xc)
            move = active & ~conv_now & ~diverged
            nlay = lay + jnp.where(move, cv_round(nxi), 0)
            nr = rr + jnp.where(move, cv_round(nxr), 0)
            nc = cc + jnp.where(move, cv_round(nxc), 0)
            oob = ((nlay < 1) | (nlay > nl)
                   | (nc < border) | (nc >= w - border)
                   | (nr < border) | (nr >= h - border))
            alive = alive & ~(active & (diverged | (move & oob)))
            converged = converged | (active & conv_now)
            safe = ~oob
            lay = jnp.where(move & safe, nlay, lay)
            rr = jnp.where(move & safe, nr, rr)
            cc = jnp.where(move & safe, nc, cc)

        alive = alive & converged  # non-convergence rejects (sift.cpp:351)

        # final contrast + edge tests at the converged location
        cube = gather_cube(lay, rr, cc)
        (d0, d1, d2), (dxx, dxy, dxs, dyy, dys, dss), center = \
            _cube_derivs(cube)
        t = d0 * xc + d1 * xr + d2 * xi
        contr = center * _IMG_SCALE + t * 0.5
        alive = alive & (jnp.abs(contr) * nl >= cfg.contrast_threshold)
        tr = dxx + dyy
        det = dxx * dyy - dxy * dxy
        e = cfg.edge_threshold
        alive = alive & (det > 0) & (tr * tr * e < (e + 1) * (e + 1) * det)
        return Refined(lay, rr, cc, xi, xr, xc, contr, alive)

    return jax.vmap(one)(layer, r, c, valid)

"""DoG scale-space extrema scan (replaces reference C8a).

Functional twin of the 26-neighbor NMS in
findScaleSpaceExtremaComputer (src/sift.cpp:487-511): a pixel is a
candidate iff |val| > 8 (the literal threshold passed at
src/sift.cpp:564) and it is >= (resp. <=) every neighbor of its
3x3x3 DoG cube, with a 5 px border margin (src/sift.cpp:487-491).

TPU-first restructuring: the reference walks pixels serially and
pushes into TLS vectors; we evaluate the NMS as a dense masked
array program over the whole octave (fused elementwise on the VPU)
and surface the top-K candidates by |response| via top_k — fixed
capacity, validity-masked.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import jax

from sift_tpu.config import SIFTConfig, DEFAULT_CONFIG


def extrema_mask(dog: jnp.ndarray, cfg: SIFTConfig = DEFAULT_CONFIG
                 ) -> jnp.ndarray:
    """(D, H, W) DoG stack -> (nL, H, W) candidate mask for layers 1..nL."""
    nl = cfg.n_octave_layers
    d, h, w = dog.shape
    val = dog[1:1 + nl]
    p = jnp.pad(dog, ((0, 0), (1, 1), (1, 1)))
    nmax = jnp.full_like(val, -jnp.inf)
    nmin = jnp.full_like(val, jnp.inf)
    for dl in (-1, 0, 1):
        for dr in (0, 1, 2):
            for dc in (0, 1, 2):
                if dl == 0 and dr == 1 and dc == 1:
                    continue  # center
                s = jax.lax.dynamic_slice(
                    p, (1 + dl, dr, dc), (nl, h, w))
                nmax = jnp.maximum(nmax, s)
                nmin = jnp.minimum(nmin, s)
    mask = (jnp.abs(val) > cfg.nms_threshold) & (
        ((val > 0) & (val >= nmax)) | ((val < 0) & (val <= nmin)))
    b = cfg.img_border
    rr = jnp.arange(h)
    cc = jnp.arange(w)
    border = ((rr >= b) & (rr < h - b))[:, None] & (
        (cc >= b) & (cc < w - b))[None, :]
    return mask & border[None]


def _top_k_two_stage(score: jnp.ndarray, cap: int,
                     blk: int = 4096, kb: int = 128):
    """Exact top-k via (per-4096-block top-128) -> global top-cap.

    A single 4M-element top_k costs ~8 ms at 1080p (full sort); the
    two-stage form is ~3x faster and exact as long as no 4096-element
    block holds >128 candidates — NMS spacing makes that physically
    implausible for real frames (measured real-frame max is 28 per
    1920-px row), but degenerate inputs (plateaus admitted by the
    reference's >=/<= extremum test, src/sift.cpp:493-511) can
    saturate a block. A block is saturated iff its kb-th best value is
    a real candidate (> 0); in that case lax.cond falls back to the
    exact full top_k so no keypoint is ever silently dropped.
    """
    n = score.shape[0]
    if n <= 2 * blk or n <= cap:
        k = min(cap, n)
        return jax.lax.top_k(score, k)
    pad = (-n) % blk
    s = jnp.pad(score, (0, pad), constant_values=-1.0)
    rows = s.reshape(-1, blk)
    kb = min(kb, cap)
    v1, i1 = jax.lax.top_k(rows, kb)
    saturated = jnp.any(v1[:, -1] > 0.0)
    base = jnp.arange(rows.shape[0], dtype=jnp.int32)[:, None] * blk
    flat_idx = (i1 + base).reshape(-1)
    k2 = min(cap, flat_idx.shape[0])

    def fast(_):
        v2, i2 = jax.lax.top_k(v1.reshape(-1), k2)
        return v2, flat_idx[i2]

    def exact(_):
        v2, i2 = jax.lax.top_k(s, k2)
        return v2, i2.astype(jnp.int32)

    out_v, out_i = jax.lax.cond(saturated, exact, fast, operand=None)
    if k2 < cap:    # small octave: fewer stage-1 slots than the cap
        out_v = jnp.pad(out_v, (0, cap - k2), constant_values=-1.0)
        out_i = jnp.pad(out_i, (0, cap - k2))
    return out_v, out_i


def _top_k_two_stage_batch(score: jnp.ndarray, cap: int,
                           blk: int = 4096, kb: int = 128):
    """Batched (B, N) variant of _top_k_two_stage.

    The saturation fallback is decided ONCE over the whole batch (any
    frame's block saturated -> exact path for all): under vmap a
    lax.cond lowers to select and runs BOTH branches every time, which
    would always pay the full-sort cost the two-stage form exists to
    avoid — so the cond stays at batch level here.
    """
    nb, n = score.shape
    if n <= 2 * blk or n <= cap:
        return jax.lax.top_k(score, min(cap, n))
    pad = (-n) % blk
    s = jnp.pad(score, ((0, 0), (0, pad)), constant_values=-1.0)
    rows = s.reshape(nb, -1, blk)
    kb = min(kb, cap)
    v1, i1 = jax.lax.top_k(rows, kb)                 # (B, nblk, kb)
    saturated = jnp.any(v1[:, :, -1] > 0.0)
    base = jnp.arange(rows.shape[1], dtype=jnp.int32)[None, :, None] * blk
    flat_idx = (i1 + base).reshape(nb, -1)
    k2 = min(cap, flat_idx.shape[1])

    def fast(_):
        v2, i2 = jax.lax.top_k(v1.reshape(nb, -1), k2)
        return v2, jnp.take_along_axis(flat_idx, i2, axis=1)

    def exact(_):
        v2, i2 = jax.lax.top_k(s, k2)
        return v2, i2.astype(jnp.int32)

    out_v, out_i = jax.lax.cond(saturated, exact, fast, operand=None)
    if k2 < cap:
        out_v = jnp.pad(out_v, ((0, 0), (0, cap - k2)),
                        constant_values=-1.0)
        out_i = jnp.pad(out_i, ((0, 0), (0, cap - k2)))
    return out_v, out_i


def top_candidates_batch(dog: jnp.ndarray, cap: int,
                         cfg: SIFTConfig = DEFAULT_CONFIG
                         ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                    jnp.ndarray, jnp.ndarray]:
    """Batched frames: (B, D, H, W) -> (layer, r, c, valid), each
    (B, cap). Same semantics per frame as top_candidates."""
    nl = cfg.n_octave_layers
    nb, _, h, w = dog.shape
    if jax.default_backend() == "tpu":
        from sift_tpu.ops.extrema_pallas import extrema_scores_batch_pallas
        score = extrema_scores_batch_pallas(dog, cfg).reshape(nb, -1)
    else:
        mask = jax.vmap(lambda d: extrema_mask(d, cfg))(dog)
        score = jnp.where(mask, jnp.abs(dog[:, 1:1 + nl]),
                          -1.0).reshape(nb, -1)
    k = min(cap, score.shape[1])
    vals, idx = _top_k_two_stage_batch(score, k)
    if k < cap:
        vals = jnp.pad(vals, ((0, 0), (0, cap - k)),
                       constant_values=-1.0)
        idx = jnp.pad(idx, ((0, 0), (0, cap - k)))
    layer = idx // (h * w) + 1
    rem = idx % (h * w)
    return (layer.astype(jnp.int32), (rem // w).astype(jnp.int32),
            (rem % w).astype(jnp.int32), vals > 0.0)


def top_candidates(dog: jnp.ndarray, cap: int,
                   cfg: SIFTConfig = DEFAULT_CONFIG
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                              jnp.ndarray]:
    """Surface up to `cap` NMS candidates ranked by |DoG response|.

    Returns (layer, r, c, valid), each (cap,). layer is the absolute
    DoG layer index (1..nL).
    """
    nl = cfg.n_octave_layers
    h, w = dog.shape[1], dog.shape[2]
    if jax.default_backend() == "tpu":
        from sift_tpu.ops.extrema_pallas import extrema_scores_pallas
        score = extrema_scores_pallas(dog, cfg).reshape(-1)
    else:
        mask = extrema_mask(dog, cfg)
        score = jnp.where(mask, jnp.abs(dog[1:1 + nl]), -1.0).reshape(-1)
    k = min(cap, score.shape[0])
    vals, idx = _top_k_two_stage(score, k)
    if k < cap:  # tiny octave: pad back up to the static cap
        vals = jnp.pad(vals, (0, cap - k), constant_values=-1.0)
        idx = jnp.pad(idx, (0, cap - k))
    layer = idx // (h * w) + 1
    rem = idx % (h * w)
    r = rem // w
    c = rem % w
    valid = vals > 0.0
    return (layer.astype(jnp.int32), r.astype(jnp.int32),
            c.astype(jnp.int32), valid)

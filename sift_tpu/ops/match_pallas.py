"""Fused Pallas TPU kernel for top-2 L1 brute-force matching.

Replaces the reference's BFMatcher NORM_L1 knnMatch (src/main.cpp:25-27)
with a single kernel that streams (query-tile, train-tile) pairs
through VMEM, computes the L1 distance tile on the VPU, and folds a
running (best, second-best, best-index) per query row — the N×M
distance matrix never touches HBM.

Layout: descriptors enter TRANSPOSED, (D, N) and (D, M), so the
broadcast |q - t| temp is (D, TQ, TT) and the reduction runs over the
*leading* axis — a pure sequence of lane-parallel VPU adds. Reducing
over the lane (last) axis instead measured ~9x slower on TPU.

Grid layout: (query tiles, train tiles), train innermost. The output
blocks depend only on the query tile index, so Pallas keeps them
resident in VMEM across the train-tile sweep (revisiting pattern), and
we initialize them when the sweep starts.

Tie-breaking is stable (lowest train index wins equal distances),
matching BFMatcher. Invalid train rows must be pre-masked to the
sentinel by the caller (ops.match.mask_train).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sift_tpu.ops.match import Knn2, mask_train, _SENTINEL

_TQ = 128   # query rows per tile
_TT = 128   # train rows per tile

_INF = 3.0e38  # plain float: jnp scalars would be captured as consts


def _interpret() -> bool:
    return (os.environ.get("SIFT_TPU_INTERPRET_PALLAS", "0") == "1"
            or jax.default_backend() != "tpu")


def _kernel(qt_ref, tt_ref, d1_ref, d2_ref, i1_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        # (1, 8, TQ) blocks: row 0 carries data, rows 1..7 are sublane
        # padding (TPU requires the block's second-to-last dim % 8 == 0)
        d1_ref[:] = jnp.full((1, 8, _TQ), _INF, jnp.float32)
        d2_ref[:] = jnp.full((1, 8, _TQ), _INF, jnp.float32)
        i1_ref[:] = jnp.zeros((1, 8, _TQ), jnp.int32)

    d = qt_ref.shape[0]
    qa = qt_ref[:].reshape(d, _TQ, 1)
    tb = tt_ref[:].reshape(d, 1, _TT)
    dist = jnp.sum(jnp.abs(qa - tb), axis=0)        # (TQ, TT)

    # tile-local top-2 (smallest), stable on ties. argmin is computed
    # as a min over a masked iota: jnp.argmin lowers pathologically in
    # Mosaic (when it compiles at all), min-reductions are fast.
    cols = jax.lax.broadcasted_iota(jnp.int32, (_TQ, _TT), 1)
    m1 = jnp.min(dist, axis=1)
    a1 = jnp.min(jnp.where(dist == m1[:, None], cols, 2 ** 30), axis=1)
    m2 = jnp.min(jnp.where(cols == a1[:, None], _INF, dist), axis=1)

    d1o = d1_ref[0, 0, :]
    d2o = d2_ref[0, 0, :]
    i1o = i1_ref[0, 0, :]
    take = m1 < d1o                   # strict: earlier train tile wins ties
    d1_ref[0, 0, :] = jnp.where(take, m1, d1o)
    i1_ref[0, 0, :] = jnp.where(take, a1 + j * _TT, i1o)
    d2_ref[0, 0, :] = jnp.where(take, jnp.minimum(d1o, m2),
                                jnp.minimum(d2o, m1))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _knn2_padded(qt: jnp.ndarray, tt: jnp.ndarray,
                 interpret: bool = False) -> Knn2:
    d, n = qt.shape
    m = tt.shape[1]
    nq, nt = n // _TQ, m // _TT
    d1, d2, i1 = pl.pallas_call(
        _kernel,
        grid=(nq, nt),
        in_specs=[
            pl.BlockSpec((d, _TQ), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, _TT), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, _TQ), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _TQ), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _TQ), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, 8, _TQ), jnp.float32),
            jax.ShapeDtypeStruct((nq, 8, _TQ), jnp.float32),
            jax.ShapeDtypeStruct((nq, 8, _TQ), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * n * m * d, bytes_accessed=(n + m) * d * 4,
            transcendentals=0),
        interpret=interpret,
    )(qt, tt)
    return Knn2(i1[:, 0].reshape(n), d1[:, 0].reshape(n),
                d2[:, 0].reshape(n))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _knn2_prep(query: jnp.ndarray, train: jnp.ndarray,
               t_valid: Optional[jnp.ndarray],
               interpret: bool = False) -> Knn2:
    """Jitted mask + pad + transpose + kernel. Eager dispatch of even a
    transpose costs ~1000x the kernel itself through the remote TPU
    tunnel, so every prep op stays under this jit."""
    n, d = query.shape
    m = train.shape[0]
    t = mask_train(train.astype(jnp.float32), t_valid)
    np_ = (-n) % _TQ
    mp_ = (-m) % _TT
    if np_:
        query = jnp.pad(query, ((0, np_), (0, 0)))
    if mp_:
        t = jnp.pad(t, ((0, mp_), (0, 0)), constant_values=_SENTINEL)
    r = _knn2_padded(query.astype(jnp.float32).T, t.T, interpret=interpret)
    return Knn2(r.idx[:n], r.d1[:n], r.d2[:n])


def knn2_l1_pallas(query: jnp.ndarray, train: jnp.ndarray,
                   t_valid: Optional[jnp.ndarray] = None) -> Knn2:
    """Top-2 L1 matcher via the fused Pallas kernel: (N,D)x(M,D)->Knn2.

    Pads N up to a multiple of 128 (extra rows discarded) and M up to a
    multiple of 128 with sentinel rows (never selected).
    """
    return _knn2_prep(query, train, t_valid, interpret=_interpret())

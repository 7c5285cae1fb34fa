"""Distributed Schur-complement bundle adjustment over a device mesh.

The observation table is sharded over the mesh "data" axis; cameras
and points stay replicated. Because the single-chip adjuster (sfm/ba)
is matrix-free — every cross-observation reduction is a segment-sum —
distribution is exactly: do local segment-sums over the observation
shard, then psum the (C,6,6)/(P,3,3)/(C,6)/(P,3) block tensors over
ICI. Every device then computes the identical LM/CG update, keeping
the replicated state in lockstep with zero further communication.

Per LM iteration the bytes on the wire are O(C*36 + P*9) floats times
(2 + cg_iters) — independent of the observation count, which is where
the data lives. That is the Schur-reduction property the north star
asks to carry over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sift_tpu.sfm.ba import BAProblem, bundle_adjust_loop


def bundle_adjust_sharded(prob: BAProblem, mesh: Mesh,
                          iters: int = 20, cg_iters: int = 30,
                          huber_delta: float = 3e-3,
                          loss: str = "huber",
                          lam0: float = 1e-3) -> BAProblem:
    """Observation-sharded BA. The observation count O must be a
    multiple of the mesh "data" axis size (pad with mask=False)."""
    axis = mesh.axis_names[0]

    def local(prob_local: BAProblem) -> BAProblem:
        psum = functools.partial(jax.lax.psum, axis_name=axis)
        return bundle_adjust_loop(prob_local, iters, cg_iters,
                                  huber_delta, loss, lam0, psum=psum)

    obs_spec = P(axis)
    rep = P()
    in_specs = BAProblem(cameras=rep, points=rep, cam_idx=obs_spec,
                         pt_idx=obs_spec, uv=obs_spec, mask=obs_spec,
                         fixed_cams=rep)
    out_specs = BAProblem(cameras=rep, points=rep, cam_idx=obs_spec,
                          pt_idx=obs_spec, uv=obs_spec, mask=obs_spec,
                          fixed_cams=rep)
    fn = shard_map(local, mesh=mesh, in_specs=(in_specs,),
                   out_specs=out_specs, check_vma=False)
    return jax.jit(fn)(prob)

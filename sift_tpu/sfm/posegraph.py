"""Pose-graph optimization over SE(3) (north-star capability).

Gauss-Newton on relative-pose constraints: given edges (i, j) with
measured relative transforms T_ij, minimize
  sum_e || log( T_ij^-1 · T_i^-1 · T_j ) ||^2_W
over absolute poses T_i (first pose fixed as gauge). TPU-first: a
static masked edge table, residuals/Jacobians via vmapped jacfwd on
the 6-dof parameterization, dense (6V x 6V) damped normal equations —
pose graphs are small next to BA, dense solves are MXU food.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sift_tpu.geometry.lie import so3_exp, so3_log


class PoseGraph(NamedTuple):
    """poses: (V, 6) [w|t] world->frame transforms.
    edges_i/j: (E,) int32; rel: (E, 6) measured T_i->T_j as [w|t];
    weight: (E,) edge information weight; mask: (E,) bool;
    fixed: (V,) bool gauge mask."""
    poses: jnp.ndarray
    edges_i: jnp.ndarray
    edges_j: jnp.ndarray
    rel: jnp.ndarray
    weight: jnp.ndarray
    mask: jnp.ndarray
    fixed: jnp.ndarray


def _compose_inv_ab(a6, b6):
    """log-ish residual of T_a^-1 T_b vs identity, as (R, t) pieces."""
    ra = so3_exp(a6[:3])
    rb = so3_exp(b6[:3])
    r = ra.T @ rb
    t = ra.T @ (b6[3:] - a6[3:])
    return r, t


def _edge_residual(pose_i, pose_j, rel6):
    """6-vector residual of one edge."""
    # predicted relative: T_i^-1 T_j
    r_pred, t_pred = _compose_inv_ab(pose_i, pose_j)
    r_meas = so3_exp(rel6[:3])
    dr = r_meas.T @ r_pred
    dt = r_meas.T @ (t_pred - rel6[3:])
    return jnp.concatenate([so3_log(dr), dt])


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(g: PoseGraph, iters: int = 15,
                        lam0: float = 1e-4) -> PoseGraph:
    """Damped Gauss-Newton with accept/reject on the total cost."""
    v = g.poses.shape[0]
    wm = (g.weight * g.mask.astype(jnp.float32))

    def residuals(poses_flat):
        poses = poses_flat.reshape(v, 6)
        res = jax.vmap(_edge_residual)(
            poses[g.edges_i], poses[g.edges_j], g.rel)      # (E, 6)
        return (res * jnp.sqrt(wm)[:, None]).reshape(-1)

    free = (~g.fixed)[:, None].astype(jnp.float32) * jnp.ones((1, 6))
    free_flat = free.reshape(-1)

    def cost(p):
        r = residuals(p)
        return jnp.sum(r * r)

    def body(_, carry):
        poses_flat, lam = carry
        r = residuals(poses_flat)
        jmat = jax.jacfwd(residuals)(poses_flat)            # (6E, 6V)
        jmat = jmat * free_flat[None, :]
        jtj = jmat.T @ jmat
        jtr = jmat.T @ r
        damped = jtj + lam * jnp.diag(jnp.maximum(jnp.diag(jtj), 1e-8))
        delta = jnp.linalg.solve(damped, jtr) * free_flat
        cand = poses_flat - delta
        accept = (cost(cand) < cost(poses_flat)) & \
            jnp.all(jnp.isfinite(cand))
        new = jnp.where(accept, cand, poses_flat)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.minimum(lam * 4.0, 1e3))
        return new, lam

    poses_flat, _ = jax.lax.fori_loop(
        0, iters, body, (g.poses.reshape(-1).astype(jnp.float32),
                         jnp.float32(lam0)))
    return g._replace(poses=poses_flat.reshape(v, 6))


def pose_graph_cost(g: PoseGraph) -> jnp.ndarray:
    res = jax.vmap(_edge_residual)(
        g.poses[g.edges_i], g.poses[g.edges_j], g.rel)
    w = (g.weight * g.mask.astype(jnp.float32))[:, None]
    return jnp.sum(res * res * w)

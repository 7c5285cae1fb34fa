"""Incremental structure-from-motion (BASELINE.json config 4).

Host-orchestrated, device-computed: registration order and map growth
are inherently sequential decisions, so a thin NumPy driver owns the
bookkeeping (tracks, which views are registered, which tracks have
points) while every numeric kernel — essential RANSAC, PnP RANSAC,
triangulation, Schur/CG bundle adjustment — runs jitted on device
with static shapes (fixed-capacity masked tables).

Pipeline: feature tracks from pairwise matches (union-find) ->
two-view initialization (essential + triangulate) -> repeated view
registration (PnP on the 2D-3D overlap) + new-track triangulation ->
periodic + final bundle adjustment.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from sift_tpu.geometry import lie
from sift_tpu.geometry.epipolar import find_essential_ransac
from sift_tpu.geometry.pnp import pnp_ransac
from sift_tpu.geometry.triangulation import triangulate
from sift_tpu.sfm.ba import BAProblem, bundle_adjust, reproj_rmse
from sift_tpu.utils.caps import pow2_cap as _pow2


class _UnionFind:
    def __init__(self):
        self.parent: Dict = {}

    def find(self, a):
        p = self.parent.setdefault(a, a)
        while p != self.parent.setdefault(p, p):
            self.parent[a] = self.parent[p]
            a, p = p, self.parent[p]
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[ra] = rb


def build_tracks(n_frames: int,
                 matches: Dict[Tuple[int, int], np.ndarray]
                 ) -> List[Dict[int, int]]:
    """Union-find feature tracks.

    matches[(i, j)] is an (M, 2) int array of (kpt_i, kpt_j) pairs.
    Returns a list of tracks, each {frame: kpt_index}; tracks with
    conflicting observations (two kpts of one frame) are dropped.
    """
    uf = _UnionFind()
    for (i, j), m in matches.items():
        for a, b in np.asarray(m):
            uf.union((i, int(a)), (j, int(b)))
    groups: Dict = {}
    for node in list(uf.parent):
        groups.setdefault(uf.find(node), []).append(node)
    tracks = []
    for nodes in groups.values():
        if len(nodes) < 2:
            continue
        track: Dict[int, int] = {}
        ok = True
        for f, k in nodes:
            if f in track and track[f] != k:
                ok = False      # merged-track conflict: discard
                break
            track[f] = k
        if ok and len(track) >= 2:
            tracks.append(track)
    return tracks


@dataclasses.dataclass
class Reconstruction:
    """Result of incremental SfM (NumPy, host-side)."""
    cameras: np.ndarray          # (F, 6) [w|t], world->cam
    registered: np.ndarray       # (F,) bool
    points: np.ndarray           # (T, 3) one slot per track
    has_point: np.ndarray        # (T,) bool
    tracks: List[Dict[int, int]]
    reproj_rmse: float


def _ba_tables(tracks, kp_xy, cameras, registered, points, has_point,
               obs_cap: Optional[int] = None,
               anchor_frame: Optional[int] = None,
               free_frames: Optional[np.ndarray] = None):
    """Flatten the current map into a static BAProblem.

    Only observations of registered cameras with finite parameters are
    included (a camera whose registration failed must not contribute
    NaN residuals). ``anchor_frame`` is additionally marked fixed to
    pin the 6-dof gauge; without it no registered camera is fixed and
    only LM damping regularizes the singular Schur system.

    ``free_frames`` (bool (F,)) restricts the problem to a LOCAL
    window: only cameras in the window move, and only tracks observed
    by a window camera enter the table (other cameras observing those
    tracks stay as fixed anchors) — incremental cost stays bounded
    by the window, not the map.

    Capacities (observation count, live-point count) are padded to
    powers of two so bundle_adjust compiles once per ladder step, not
    once per call. Observation-less padded points receive bp=0 and
    dp=0 in the LM step (sfm/ba.py) and are returned untouched.
    """
    finite_cam = np.isfinite(cameras).all(axis=1)
    usable = registered & finite_cam
    live_all = np.where(has_point)[0]
    if free_frames is not None:
        in_window = np.array(
            [any(free_frames[f] for f in tracks[t] if usable[f])
             for t in live_all])
        live = live_all[in_window] if in_window.size else live_all[:0]
    else:
        live = live_all
    cam_idx, pt_idx, uv = [], [], []
    remap = {int(t): i for i, t in enumerate(live)}
    for ti in live:
        for f, k in tracks[ti].items():
            if usable[f]:
                cam_idx.append(f)
                pt_idx.append(remap[ti])
                uv.append(kp_xy[f][k])
    o = len(cam_idx)
    cap = obs_cap or _pow2(o, lo=64)
    pad = cap - o
    mask = np.array([True] * o + [False] * pad)
    fixed = ~usable
    if free_frames is not None:
        fixed = fixed | ~free_frames
    if anchor_frame is not None:
        fixed = fixed.copy()
        fixed[anchor_frame] = True
    # non-finite (failed) cameras are fixed + observation-free, but
    # zero their params so fixed-slot arithmetic stays NaN-free
    safe_cameras = np.where(finite_cam[:, None], cameras, 0.0)
    pt_cap = _pow2(len(live), lo=32)
    pts = np.zeros((pt_cap, 3), points.dtype)
    pts[:len(live)] = points[live]
    from sift_tpu.utils.logger import COUNTERS
    COUNTERS.inc(f"ba_shape/{cap}x{pt_cap}")
    prob = BAProblem(
        cameras=jnp.asarray(safe_cameras, jnp.float32),
        points=jnp.asarray(pts, jnp.float32),
        cam_idx=jnp.asarray(np.array(cam_idx + [0] * pad, np.int32)),
        pt_idx=jnp.asarray(np.array(pt_idx + [0] * pad, np.int32)),
        uv=jnp.asarray(np.array(uv + [[0.0, 0.0]] * pad, np.float32)),
        mask=jnp.asarray(mask),
        fixed_cams=jnp.asarray(fixed))
    return prob, live


def _pose_rt(cam6):
    r = np.asarray(lie.so3_exp(jnp.asarray(cam6[:3], jnp.float32)))
    return r, np.asarray(cam6[3:], np.float64)


def reconstruct(kp_xy: Sequence[np.ndarray],
                matches: Dict[Tuple[int, int], np.ndarray],
                init_pair: Optional[Tuple[int, int]] = None,
                ransac_threshold: float = 2e-3,
                ba_every: int = 3,
                ba_iters: int = 12,
                min_pnp_points: int = 12,
                cap_pad: int = 256,
                ba_window: Optional[int] = 8,
                retriangulate_every: int = 2,
                prune_factor: float = 4.0) -> Reconstruction:
    """Run incremental SfM.

    kp_xy: per-frame (N_f, 2) NORMALIZED keypoint coordinates.
    matches: {(i, j): (M, 2) keypoint index pairs}, i < j.
    ba_window: periodic BA optimizes only the last `ba_window`
        registered frames (plus their tracks) — bounded incremental
        cost; None = global. The final BA is always global.
    retriangulate_every: refresh live points from their widest-
        baseline pair every N-th periodic BA (0 disables).
    prune_factor: after each BA, drop observations with reprojection
        error > prune_factor * ransac_threshold (COLMAP-style track
        filtering; 0 disables).
    """
    n_frames = len(kp_xy)
    tracks = build_tracks(n_frames, matches)
    n_tracks = len(tracks)
    cameras = np.zeros((n_frames, 6), np.float64)
    registered = np.zeros(n_frames, bool)
    failed = np.zeros(n_frames, bool)   # PnP-rejected views: never BA'd
    points = np.zeros((n_tracks, 3), np.float64)
    has_point = np.zeros(n_tracks, bool)

    # pad two-view correspondences to a static capacity
    def pad2(a, cap):
        out = np.zeros((cap, a.shape[1]), np.float32)
        out[:len(a)] = a
        m = np.zeros(cap, bool)
        m[:len(a)] = True
        return out, m

    # triangulate tracks between two registered frames; returns the
    # number of accepted (cheirality-positive, finite) points.
    # Batches are padded to powers of two so `triangulate` compiles
    # once per ladder step, not once per batch size.
    def tri_tracks(track_ids, fa, fb) -> int:
        ra, ta = _pose_rt(cameras[fa])
        rb, tb = _pose_rt(cameras[fb])
        pa = np.stack([kp_xy[fa][tracks[t][fa]] for t in track_ids])
        pb = np.stack([kp_xy[fb][tracks[t][fb]] for t in track_ids])
        n = len(track_ids)
        cap = _pow2(n, lo=16)
        pa_p = np.zeros((cap, 2), np.float32)
        pb_p = np.zeros((cap, 2), np.float32)
        pa_p[:n], pb_p[:n] = pa, pb
        x = np.asarray(triangulate(
            jnp.asarray(ra, jnp.float32), jnp.asarray(ta, jnp.float32),
            jnp.asarray(rb, jnp.float32), jnp.asarray(tb, jnp.float32),
            jnp.asarray(pa_p), jnp.asarray(pb_p)))[:n]
        za = (x @ ra.T + ta)[:, 2]
        zb = (x @ rb.T + tb)[:, 2]
        good = (za > 1e-3) & (zb > 1e-3) & np.isfinite(x).all(axis=1)
        n_new = 0
        for t, xi, g in zip(track_ids, x, good):
            if g:
                points[t] = xi
                has_point[t] = True
                n_new += 1
        return n_new

    def widest_pair(fs):
        """Registered frame pair with the widest baseline (best
        triangulation conditioning)."""
        centers = {f: -_pose_rt(cameras[f])[0].T @ cameras[f, 3:]
                   for f in fs}
        best, bd = (fs[0], fs[-1]), -1.0
        for i, fa in enumerate(fs):
            for fb in fs[i + 1:]:
                d = float(np.linalg.norm(centers[fa] - centers[fb]))
                if d > bd:
                    best, bd = (fa, fb), d
        return best

    def retriangulate():
        """Refresh live points from their widest-baseline view pair:
        early two-view triangulations improve as later registrations
        widen each track's baseline."""
        by_pair: Dict[Tuple[int, int], List[int]] = {}
        for t in np.where(has_point)[0]:
            fs = [f for f in tracks[t]
                  if registered[f] and np.isfinite(cameras[f]).all()]
            if len(fs) >= 2:
                by_pair.setdefault(widest_pair(fs), []).append(int(t))
        for (fa, fb), tl in by_pair.items():
            tri_tracks(tl, fa, fb)

    def prune_observations(max_err: float) -> int:
        """COLMAP-style track filtering: drop observations whose
        reprojection error exceeds max_err (wrong-correspondence
        matches poison BA long before robust losses saturate); tracks
        left with <2 registered views lose their point. Returns the
        number of observations removed."""
        n_dropped = 0
        for t in np.where(has_point)[0]:
            bad = []
            for f, k in tracks[t].items():
                if not (registered[f] and np.isfinite(cameras[f]).all()):
                    continue
                r, tt = _pose_rt(cameras[f])
                xc = r @ points[t] + tt
                if xc[2] <= 1e-6:
                    bad.append(f)
                    continue
                err = np.linalg.norm(xc[:2] / xc[2] - kp_xy[f][k])
                if err > max_err:
                    bad.append(f)
            for f in bad:
                del tracks[t][f]
                n_dropped += 1
            n_reg = sum(1 for f in tracks[t] if registered[f])
            if len(tracks[t]) < 2 or n_reg < 2:
                has_point[t] = False
        return n_dropped

    # --- initialization: try pairs by match count until one yields a
    # well-conditioned baseline (near-pure-rotation pairs triangulate
    # nothing and are rejected by cheirality) ---
    candidates = ([init_pair] if init_pair is not None else
                  sorted(matches, key=lambda k: -len(matches[k])))
    init_done = False
    for (i0, j0) in candidates:
        m0 = np.asarray(matches[(i0, j0)])
        if len(m0) < 16:
            continue
        cap = _pow2(len(m0), lo=16) * 2
        p0, mask0 = pad2(kp_xy[i0][m0[:, 0]], cap)
        p1, _ = pad2(kp_xy[j0][m0[:, 1]], cap)
        res = find_essential_ransac(jnp.asarray(p0), jnp.asarray(p1),
                                    valid=jnp.asarray(mask0),
                                    threshold=ransac_threshold)
        if not bool(np.asarray(res.ok)):
            continue
        cameras[j0, :3] = np.asarray(lie.so3_log(res.R))
        cameras[j0, 3:] = np.asarray(res.t)
        registered[i0] = registered[j0] = True
        init_tracks = [t for t in range(n_tracks)
                       if i0 in tracks[t] and j0 in tracks[t]]
        n_ok = tri_tracks(init_tracks, i0, j0) if init_tracks else 0
        if n_ok >= min_pnp_points:
            init_done = True
            break
        # degenerate baseline: roll back and try the next pair
        registered[i0] = registered[j0] = False
        cameras[j0] = 0.0
        points[:] = 0.0
        has_point[:] = False
    if not init_done:
        raise RuntimeError(
            "two-view initialization failed: no pair with a usable "
            "baseline (all candidate pairs near-degenerate, e.g. pure "
            "rotation, or too few matches)")

    # --- incremental registration ---
    n_since_ba = 0
    n_bas = 0
    reg_order: List[int] = [i0, j0]
    while True:
        # candidate view with largest 2D-3D overlap
        best_f, best_overlap = -1, 0
        overlaps: Dict[int, List[int]] = {}
        for t in np.where(has_point)[0]:
            for f in tracks[t]:
                if not registered[f] and not failed[f]:
                    overlaps.setdefault(f, []).append(int(t))
        for f, ts in overlaps.items():
            if len(ts) > best_overlap:
                best_f, best_overlap = f, len(ts)
        if best_f < 0 or best_overlap < min_pnp_points:
            break

        ts = overlaps[best_f]
        x3 = points[ts]
        p2 = np.stack([kp_xy[best_f][tracks[t][best_f]] for t in ts])
        cap = _pow2(len(ts), lo=16) * 2
        x3p, maskp = pad2(x3, cap)
        p2p, _ = pad2(p2, cap)
        pres = pnp_ransac(jnp.asarray(x3p), jnp.asarray(p2p),
                          valid=jnp.asarray(maskp),
                          threshold=ransac_threshold)
        if not bool(np.asarray(pres.ok)) or \
                int(np.asarray(pres.n_inliers)) < min_pnp_points // 2:
            # cannot register this view; blacklist it (NOT registered,
            # so its observations never enter BA) to avoid re-trying
            failed[best_f] = True
            continue
        registered[best_f] = True
        reg_order.append(best_f)
        cameras[best_f, :3] = np.asarray(lie.so3_log(pres.R))
        cameras[best_f, 3:] = np.asarray(pres.t)

        # triangulate new tracks now visible from >= 2 registered views
        new_tracks = []
        for t in range(n_tracks):
            if has_point[t]:
                continue
            fs = [f for f in tracks[t]
                  if registered[f] and np.isfinite(cameras[f]).all()]
            if len(fs) >= 2:
                new_tracks.append((t, fs[0], fs[-1]))
        by_pair: Dict[Tuple[int, int], List[int]] = {}
        for t, fa, fb in new_tracks:
            by_pair.setdefault((fa, fb), []).append(t)
        for (fa, fb), tl in by_pair.items():
            tri_tracks(tl, fa, fb)

        n_since_ba += 1
        if n_since_ba >= ba_every and has_point.any():
            n_since_ba = 0
            n_bas += 1
            if retriangulate_every and n_bas % retriangulate_every == 0:
                retriangulate()
            free = None
            if ba_window is not None:
                free = np.zeros(n_frames, bool)
                free[reg_order[-ba_window:]] = True
            prob, live = _ba_tables(tracks, kp_xy, cameras, registered,
                                    points, has_point, anchor_frame=i0,
                                    free_frames=free)
            out = bundle_adjust(prob, iters=ba_iters, loss="cauchy",
                                huber_delta=ransac_threshold)
            cameras[registered] = np.asarray(out.cameras)[registered]
            points[live] = np.asarray(out.points)[:len(live)]
            if prune_factor:
                prune_observations(prune_factor * ransac_threshold)

    # --- final BA (always global) ---
    if not has_point.any():
        raise RuntimeError("reconstruction has no 3-D points")
    if retriangulate_every:
        retriangulate()
    prob, live = _ba_tables(tracks, kp_xy, cameras, registered,
                            points, has_point, anchor_frame=i0)
    out = bundle_adjust(prob, iters=ba_iters * 2, loss="cauchy",
                        huber_delta=ransac_threshold)
    cameras[registered] = np.asarray(out.cameras)[registered]
    points[live] = np.asarray(out.points)[:len(live)]
    if prune_factor and prune_observations(
            prune_factor * ransac_threshold) and has_point.any():
        # contaminated observations left the table: one more clean BA
        prob, live = _ba_tables(tracks, kp_xy, cameras, registered,
                                points, has_point, anchor_frame=i0)
        out = bundle_adjust(prob, iters=ba_iters, loss="cauchy",
                            huber_delta=ransac_threshold)
        cameras[registered] = np.asarray(out.cameras)[registered]
        points[live] = np.asarray(out.points)[:len(live)]
    rmse = float(np.asarray(reproj_rmse(out)))

    cameras[failed] = np.nan        # mark unregisterable views clearly
    return Reconstruction(cameras=cameras, registered=registered,
                          points=points, has_point=has_point,
                          tracks=tracks, reproj_rmse=rmse)

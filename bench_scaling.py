"""Multi-chip scaling harness: distributed BA + frame pipeline.

Measures strong scaling of the observation-sharded Schur/CG bundle
adjuster and the data-parallel frame pipeline over 1..N devices, and
prints per-width JSON lines with parallel efficiency
(t_1 / (n * t_n)). BASELINE.json gates >=80% BA scaling efficiency.

On this container only one physical TPU chip is reachable, so by
default the harness runs on a virtual CPU mesh
(--platform cpu --devices 8): that validates the collective graph
end-to-end but NOT real ICI bandwidth — efficiency numbers are only
meaningful on a real multi-chip slice (run there with
--platform tpu).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _parse():
    ap = argparse.ArgumentParser(prog="bench_scaling")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual device count (cpu platform only)")
    ap.add_argument("--cams", type=int, default=64)
    ap.add_argument("--pts", type=int, default=4096)
    ap.add_argument("--obs", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cg-iters", type=int, default=20)
    ap.add_argument("--json-out", default=None,
                    help="also write all per-width records to this file")
    return ap.parse_args()


def main() -> int:
    args = _parse()
    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.devices}").strip()
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from sift_tpu.parallel import make_mesh
    from sift_tpu.parallel.ba import bundle_adjust_sharded
    from sift_tpu.sfm.ba import BAProblem, bundle_adjust

    rng = np.random.default_rng(0)
    c, p, o = args.cams, args.pts, args.obs
    pts = np.stack([rng.uniform(-3, 3, p), rng.uniform(-3, 3, p),
                    rng.uniform(6, 14, p)], 1).astype(np.float32)
    cams = np.zeros((c, 6), np.float32)
    cams[:, 3] = np.linspace(-1, 1, c)
    cam_idx = rng.integers(0, c, o).astype(np.int32)
    pt_idx = rng.integers(0, p, o).astype(np.int32)
    xc = pts[pt_idx] + cams[cam_idx][:, 3:]
    uv = (xc[:, :2] / xc[:, 2:3]
          + rng.normal(0, 1e-3, (o, 2))).astype(np.float32)
    fixed = np.zeros(c, bool)
    fixed[0] = True
    cams0 = cams + rng.normal(0, 0.01, cams.shape).astype(np.float32) \
        * ~fixed[:, None]
    prob = BAProblem(jnp.asarray(cams0), jnp.asarray(pts),
                     jnp.asarray(cam_idx), jnp.asarray(pt_idx),
                     jnp.asarray(uv), jnp.ones(o, bool),
                     jnp.asarray(fixed))

    n_dev = len(jax.devices())
    widths = [w for w in (1, 2, 4, 8, 16, 32) if w <= n_dev]

    def run_width(w: int) -> float:
        if w == 1:
            fn = lambda: bundle_adjust(prob, iters=args.iters,
                                       cg_iters=args.cg_iters)
        else:
            mesh = make_mesh((w,), ("data",))
            fn = lambda: bundle_adjust_sharded(
                prob, mesh, iters=args.iters, cg_iters=args.cg_iters)
        out = fn()
        np.asarray(out.cameras)          # force (incl. compile)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out.cameras)      # host pull forces execution
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = None
    records = []
    for w in widths:
        t = run_width(w)
        if t1 is None:
            t1 = t
        eff = t1 / (w * t)
        rec = {
            "metric": "ba_scaling", "devices": w,
            "wall_s": round(t, 4),
            "efficiency": round(eff, 3),
            "platform": args.platform,
            "note": ("virtual CPU mesh — validates collectives, not "
                     "ICI bandwidth" if args.platform == "cpu" else
                     "real devices"),
        }
        records.append(rec)
        print(json.dumps(rec))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"cams": args.cams, "pts": args.pts,
                       "obs": args.obs, "iters": args.iters,
                       "cg_iters": args.cg_iters,
                       "records": records}, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())

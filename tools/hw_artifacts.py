"""One command for the per-round on-hardware artifacts (VERDICT #5).

Runs, on the real chip:
  0. bounded backend-init preflight (exit 2 + marker if wedged)
  1. SIFT_TPU_HW_TESTS=1 pytest tests/test_tpu_hardware.py  -> HW_TESTS.json
  2. python bench.py --stages                               -> BENCH_STAGES.json
     python bench.py --internals                            -> BENCH_INTERNALS.json
  3. python bench.py --batch N                              -> BENCH_BATCH.json
  4. python -m sift_tpu.eval --gate --out EVAL.json
  5. python bench.py                                        (headline, stdout)

Usage: python tools/hw_artifacts.py [--skip-eval] [--batch 8]
Each step is its own subprocess so one failure doesn't mask the rest;
HW_TESTS.json records pass/fail counts + wall time either way.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, env=None, timeout=1800):
    t0 = time.time()
    e = dict(os.environ)
    e.update(env or {})
    p = subprocess.run(cmd, cwd=REPO, env=e, text=True,
                       capture_output=True, timeout=timeout)
    return p, time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument("--skip-headline", action="store_true")
    args = ap.parse_args()
    failures = []

    # 0. bounded backend-init preflight (the axon tunnel can wedge so
    # that jax.devices() never returns; don't let step 1 eat its whole
    # 1800s timeout discovering that)
    sys.path.insert(0, REPO)
    import bench
    try:
        p, dt = run([sys.executable, "-c", bench._PREFLIGHT_SRC],
                    timeout=bench.PREFLIGHT_TIMEOUT_S)
        ok = p.returncode == 0
        detail = (p.stdout or p.stderr or "").strip()[-300:]
    except subprocess.TimeoutExpired:
        ok, dt = False, float(bench.PREFLIGHT_TIMEOUT_S)
        detail = "backend init timeout (axon tunnel wedge)"
    if not ok:
        rec = {"error": "backend_unavailable", "detail": detail,
               "wall_s": round(dt, 1)}
        with open(os.path.join(REPO, "HW_TESTS.json"), "w") as fh:
            json.dump(rec, fh, indent=2)
        print("backend unavailable — no hardware artifacts refreshed:",
              detail, file=sys.stderr)
        return 2
    print(f"preflight ok ({dt:.0f}s): {detail}")

    # 1. on-hardware kernel parity lane
    p, dt = run([sys.executable, "-m", "pytest",
                 "tests/test_tpu_hardware.py", "-q"],
                env={"SIFT_TPU_HW_TESTS": "1"})
    tail = (p.stdout or "").strip().splitlines()[-1:]
    m = re.search(r"(\d+) passed", p.stdout or "")
    f = re.search(r"(\d+) failed", p.stdout or "")
    rec = {"passed": int(m.group(1)) if m else 0,
           "failed": int(f.group(1)) if f else 0,
           "returncode": p.returncode,
           "wall_s": round(dt, 1),
           "summary": tail[0] if tail else ""}
    with open(os.path.join(REPO, "HW_TESTS.json"), "w") as fh:
        json.dump(rec, fh, indent=2)
    print("HW_TESTS.json:", json.dumps(rec))
    if p.returncode != 0:
        failures.append("hw_tests")
        print(p.stdout[-2000:], file=sys.stderr)

    # 2-3. stage/internals/batched benches (each writes its own
    # artifact). --no-preflight: step 0 already proved the backend;
    # each child re-probing would burn 30-180s of a recovery window
    for extra in (["--stages"], ["--internals"],
                  ["--batch", str(args.batch)]):
        p, dt = run([sys.executable, "bench.py", "--no-preflight"] + extra)
        print(f"bench {extra}: rc={p.returncode} {dt:.0f}s")
        if p.returncode != 0:
            failures.append(f"bench{extra[0]}")
            print(p.stdout[-1000:], p.stderr[-1000:], file=sys.stderr)
        else:
            print((p.stdout or "").strip().splitlines()[-1])

    # 4. eval gates (incl. config-5 mapping section)
    if not args.skip_eval:
        p, dt = run([sys.executable, "-m", "sift_tpu.eval", "--gate",
                     "--out", "EVAL.json"], timeout=3600)
        print(f"eval --gate: rc={p.returncode} {dt:.0f}s")
        if p.returncode != 0:
            failures.append("eval")
            print(p.stdout[-2000:], p.stderr[-500:], file=sys.stderr)

    # 5. headline
    if not args.skip_headline:
        p, dt = run([sys.executable, "bench.py", "--no-preflight"])
        print(f"headline: rc={p.returncode} {dt:.0f}s")
        if p.returncode == 0:
            print((p.stdout or "").strip().splitlines()[-1])
        else:
            failures.append("headline")

    if failures:
        print("FAILED:", failures, file=sys.stderr)
        return 1
    print("all hardware artifacts refreshed")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""One command for the per-round on-hardware artifacts (VERDICT #5).

Runs, on the real chip:
  0. bounded backend-init preflight (exit 2 + marker if wedged)
  1. SIFT_TPU_HW_TESTS=1 pytest tests/test_tpu_hardware.py  -> HW_TESTS.json
  2. python bench.py --stages                               -> BENCH_STAGES.json
     python bench.py --internals                            -> BENCH_INTERNALS.json
  3. python bench.py --batch-sweep                          -> BENCH_BATCH.json
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


def _parse_pytest_counts(stdout: str) -> dict:
    """Pass/fail/skip counts from pytest -q output.

    Round 4 shipped HW_TESTS.json with passed=0/failed=0 next to
    returncode=1 (VERDICT r4 weak #1): the old parse regexed only the
    final "N passed" summary line, which is absent when pytest dies
    mid-run (device crash / timeout). Parse the count line wherever it
    is, and fall back to counting the per-test PASSED/FAILED markers
    from the short summary so a truncated run still reports what it
    saw. `summary` is the last count-shaped line, else the last line.
    """
    lines = stdout.strip().splitlines()
    count_re = re.compile(
        r"(\d+)\s+(passed|failed|skipped|errors?|xfailed|xpassed)")
    counts, summary = {}, (lines[-1] if lines else "")
    for ln in reversed(lines):
        found = count_re.findall(ln)
        if found:
            counts = {k.rstrip("s"): int(n) for n, k in found}
            summary = ln.strip("= ")
            break
    if not counts:
        # no count line at all (seen on-hardware 2026-08-19: stdout
        # ended at the "........ [100%]" progress line with rc=0) —
        # decode the progress line: '.'=pass, 's'=skip, 'F'=fail,
        # 'E'/'x'/'X' = error/xfail/xpass
        m = re.search(r"^([.sFEXx]+)\s+\[100%\]", stdout, re.M)
        if m:
            bar = m.group(1)
            counts = {"passed": bar.count("."),
                      "failed": bar.count("F") + bar.count("E"),
                      "skipped": bar.count("s"),
                      "counted_from_progress_bar": True}
        else:
            counts = {
                "passed": len(re.findall(r"^PASSED ", stdout, re.M)),
                "failed": len(re.findall(r"^FAILED ", stdout, re.M)),
                "truncated_output": True,
            }
    return {"passed": counts.get("passed", 0),
            "failed": counts.get("failed", 0) + counts.get("error", 0),
            "skipped": counts.get("skipped", 0),
            **({"truncated_output": True}
               if counts.get("truncated_output") else {}),
            **({"counted_from_progress_bar": True}
               if counts.get("counted_from_progress_bar") else {}),
            "summary": summary}


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

    # 0. bounded backend-init preflight with the shared retrying
    # probe (bench.probe_backend re-probes a wedged tunnel for up to
    # SIFT_TPU_PREFLIGHT_BUDGET before giving up, and fails fast on a
    # host with no TPU at all)
    sys.path.insert(0, REPO)
    import bench
    t0 = time.time()
    failure = bench.probe_backend()
    if failure is not None:
        failure["wall_s"] = round(time.time() - t0, 1)
        with open(os.path.join(REPO, "HW_TESTS.json"), "w") as fh:
            json.dump(failure, fh, indent=2)
        print("backend unavailable — no hardware artifacts refreshed:",
              failure["error_detail"], file=sys.stderr)
        return 2
    print(f"preflight ok ({time.time() - t0:.0f}s)")

    # 1. on-hardware kernel parity lane
    p, dt = run([sys.executable, "-m", "pytest",
                 "tests/test_tpu_hardware.py", "-q"],
                env={"SIFT_TPU_HW_TESTS": "1"})
    rec = {**_parse_pytest_counts(p.stdout or ""),
           "returncode": p.returncode,
           "wall_s": round(dt, 1)}
    with open(os.path.join(REPO, "HW_TESTS.json"), "w") as fh:
        json.dump(rec, fh, indent=2)
    print("HW_TESTS.json:", json.dumps(rec))
    if p.returncode != 0:
        failures.append("hw_tests")
        print(p.stdout[-2000:], file=sys.stderr)

    # 2-3. stage/internals/batched benches (each writes its own
    # artifact). --no-preflight: step 0 already proved the backend;
    # each child re-probing would burn 30-180s of a recovery window
    for extra in (["--stages"], ["--internals"], ["--batch-sweep"]):
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

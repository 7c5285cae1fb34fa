#!/bin/bash
# One-command hardware session, ordered so a SHORT tunnel-recovery
# window still lands the most important artifacts first:
#   1. headline bench          (the round's one number)
#   2. stage + internals       (detect <=10ms attribution)
#   3. batch throughput
#   4. A/Bs: orientation hist, descriptor layout
#   5. band blur timings       (spatial-tiling projection)
#   6. on-hardware kernel parity lane (HW_TESTS.json)
#   7. eval gates on TPU (EVAL refresh; slowest, last)
# Each step has its own timeout; a failure doesn't block later steps.
# Usage: bash tools/hw_session.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-HW_SESSION.log}"
: > "$LOG"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name: $* (timeout ${tmo}s)" | tee -a "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== $name: rc=$rc wall=$((SECONDS - t0))s" | tee -a "$LOG"
  return $rc
}

# Retrying preflight: bench.probe_backend re-probes a wedged tunnel
# every 2 min for up to SIFT_TPU_PREFLIGHT_BUDGET (default 30 min;
# raise via env for overnight sessions) and fails fast when the host
# has no TPU at all. One 180s health probe was not wedge-resistant:
# round 5's first session aborted on a wedge that cleared minutes
# later.
run preflight 3700 python -c '
import sys, bench
r = bench.probe_backend()
if r is not None:
    print(r); sys.exit(1)
' || {
  echo "backend unavailable — aborting hardware session" | tee -a "$LOG"
  exit 2
}

# --no-preflight: the health probe above already proved the backend
run headline   1800 python bench.py --no-preflight
run stages     1800 python bench.py --no-preflight --stages
run internals  2400 python bench.py --no-preflight --internals
run ori_gather_ab   2400 python bench.py --no-preflight --ori-gather-ab
run descr_gather_ab 2400 python bench.py --no-preflight --descr-gather-ab
run ori_ab     2400 python bench.py --no-preflight --ori-ab
run descr_ab   2400 python bench.py --no-preflight --descr-ab
run band       1800 python bench.py --no-preflight --band
# hw_artifacts re-runs stages/internals (cached compiles) and adds
# HW_TESTS.json, BENCH_BATCH.json, the TPU eval gate, and a final
# headline — the complete per-round artifact set
run artifacts  9000 python tools/hw_artifacts.py --batch 8

echo "=== session complete; artifacts: BENCH_STAGES/INTERNALS/BATCH/BAND, ORI_AB, DESCR_AB, HW_TESTS, EVAL" | tee -a "$LOG"
grep -h '"metric"\|"detect_ms"\|"detect_describe_ms"' BENCH_STAGES.json ORI_AB.json DESCR_AB.json 2>/dev/null | tail -5

#!/bin/bash
# Round-3 on-TPU measurement sequence — run ONCE when the relay is up.
#
# One TPU process at a time (concurrent tunnel use ABORTs), so everything
# is strictly sequential with generous timeouts; each step logs to
# /tmp/r3/<step>.log and keeps going if an earlier step fails.  Order is
# by value: the verify artifact first (the judge-facing correctness gate),
# then the three measurement campaigns, then the serving ladder.
#
# Usage: bash tools/round3_tpu_runs.sh [outdir]   (default /tmp/r3)
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/r3}"
mkdir -p "$OUT"

run() { # run <name> <timeout-s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc; tail:"
  tail -5 "$OUT/$name.log"
}

run verify      900 python tools/verify_tpu.py --out VERIFY.json
run sigmoid     600 python tools/check_sigmoid.py
run trace       900 python tools/profile.py trace
run blocksparse 1500 python tools/profile.py blocksparse
run int4        900 python tools/profile.py int4
run serve       1200 python tools/bench_serve.py --ladder
run autotune    1500 python tools/autotune.py --out /tmp/r3/tuned.json
run bench       900 python bench.py

echo "=== all done ($(date +%H:%M:%S)); logs in $OUT ==="

#!/bin/bash
# Round-4 on-TPU evidence ladder — RESUMABLE and OUTAGE-PROOF.
#
# VERDICT r3 "What's weak #5": a transient relay outage must delay, not
# erase, the round's artifacts.  So this script:
#   * waits for the relay with tools/tpu_probe.py before every step,
#   * persists each step's log AND artifact into artifacts/r4/ (in-repo,
#     committable) the moment the step completes,
#   * skips steps whose .ok marker already exists (re-run = resume),
#   * retries each failed step once after re-probing the relay.
#
# One TPU process at a time (concurrent tunnel use ABORTs) — strictly
# sequential.  Order is by value: the verify artifact first (the judge-
# facing correctness gate CLAUDE.md declares REQUIRED), the headline bench
# second, then the measurement campaigns that feed BENCHMARKS.md verdict
# tables, then autotune --commit (writes fastdnn_tpu/tuned.json), then the
# serving ladder.
#
# Usage: bash tools/round4_tpu_runs.sh [outdir]   (default artifacts/r4)
set -u
cd "$(dirname "$0")/.."
OUT="${1:-artifacts/r4}"
mkdir -p "$OUT"

probe() {
  python tools/tpu_probe.py --interval 120 --per-try 420 --max-hours 8 \
    --log "$OUT/probe.log"
}

run() { # run <name> <timeout-s> <cmd...>
  local name="$1" t="$2"; shift 2
  if [ -f "$OUT/$name.ok" ]; then
    echo "=== $name already done (marker exists) ==="
    return 0
  fi
  for attempt in 1 2; do
    echo "=== $name attempt $attempt ($(date +%H:%M:%S)) ==="
    probe || { echo "relay never answered; aborting ladder"; exit 1; }
    timeout "$t" "$@" >"$OUT/$name.log" 2>&1
    local rc=$?
    echo "--- $name rc=$rc; tail:"
    tail -5 "$OUT/$name.log"
    if [ "$rc" -eq 0 ]; then
      touch "$OUT/$name.ok"
      return 0
    fi
    sleep 30
  done
  echo "!!! $name failed twice; continuing with the rest of the ladder"
  return 1
}

run verify      1200 python tools/verify_tpu.py --out VERIFY.json
[ -f VERIFY.json ] && cp VERIFY.json "$OUT/VERIFY.json"
run sigmoid      600 python tools/check_sigmoid.py
run bench        900 python bench.py
[ -f "$OUT/bench.ok" ] && tail -1 "$OUT/bench.log" > "$OUT/bench.json"
run trace        900 python tools/profile.py trace
run blocksparse 1800 python tools/profile.py blocksparse
run int4         900 python tools/profile.py int4
run autotune    2400 python tools/autotune.py --commit --out "$OUT/tuned_flagship.json"
run autotune-mid 1800 python tools/autotune.py --hidden 1024 --layers 5 --out-dim 4000 --commit --out "$OUT/tuned_midsize.json"
run serve       1500 python tools/bench_serve.py --ladder
run bench-configs 1200 bash -c 'for c in bundled-8khz bundled-16khz midsize-lazy scaling; do python bench.py --config $c; done'

echo "=== ladder done ($(date +%H:%M:%S)); artifacts in $OUT ==="
ls -la "$OUT"

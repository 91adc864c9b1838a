#!/bin/bash
# Round-5 follow-up ladder: re-runs the steps the first r5 ladder lost and
# re-validates the paths the round-5 fixes touched.
#
#   verify2  — tools/verify_tpu.py after the host-numpy int4 prep rewrite
#              (the first run's EXCEPTION_426 was quantize_net(hidden_bits=4)
#              eagerly dispatching s4 on the axon runtime; prep is numpy now
#              and the native-s4 probe is isolated + rule-demotable)
#   int4-2   — tools/profile.py int4 (same root cause; per-variant Scorer
#              construction is now inside the isolation loop)
#   serve-2  — tools/bench_serve.py --ladder (spawned server inherited
#              JAX_PLATFORMS=axon but bench_serve replaced PYTHONPATH,
#              dropping the axon plugin; it appends now)
#   stack-2  — tools/profile.py stack (confirm the 2048 -> 8192
#              stack_hidden_max_frames move on a second session)
#   bench-2  — python bench.py with the new threshold routing the B=8192
#              headline through fused_hidden_stack (cmd_stack measured
#              1.01x in-session; revert the threshold if this regresses)
#   trace-2  — per-kernel floor for the new headline path
#
# .ok-marker resumable; restarting is always safe.
# Usage: bash tools/round5b_tpu_runs.sh [outdir]   (default artifacts/r5)
set -u
cd "$(dirname "$0")/.."
OUT="${1:-artifacts/r5}"
mkdir -p "$OUT"

probe() {
  python tools/tpu_probe.py --interval 120 --per-try 420 --max-hours 2 \
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
    probe || { echo "relay never answered; stopping"; exit 1; }
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
  echo "!!! $name failed twice; continuing"
  return 1
}

run verify2 2400 python tools/verify_tpu.py --out VERIFY.json
[ -f VERIFY.json ] && cp VERIFY.json "$OUT/VERIFY2.json"
run int4-2  1800 python tools/profile.py int4
run serve-2 2400 python tools/bench_serve.py --ladder
run stack-2 1200 python tools/profile.py stack
run bench-2 1800 python bench.py
run trace-2  900 python tools/profile.py trace

echo "=== round5b done ($(date -u +%H:%M:%S)Z); artifacts in $OUT ==="
ls -la "$OUT"

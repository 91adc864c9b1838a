#!/bin/bash
# Round-4 follow-on measurements — run AFTER round4_tpu_runs.sh completes
# (same outage-proof structure: relay probe before each step, .ok markers,
# one retry).  These feed the VERDICT r3 #6 / weak-#4 closures:
#   serving    — cheap-precision knob verdict (1-pass bf16 input, bf16
#                posteriors): device time + accuracy, decides the serving
#                defaults documented in docs/performance.md
#   stack      — re-measures the round-2 '31% faster at B=128' hidden-stack
#                claim that sets stack_hidden_max_frames=2048
#   variants   — end-to-end config sweep incl. the new "default" precision rows
#   trace-mesh — mesh(1,1) kernel-inventory diff vs plain single-device
#
# Usage: bash tools/round4b_tpu_runs.sh [outdir]   (default artifacts/r4)
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

run serving    1500 python tools/profile.py serving
run stack      1500 python tools/profile.py stack
run variants   1200 python tools/profile.py variants
run trace-mesh 1200 python tools/profile.py trace-mesh

echo "=== follow-on ladder done ($(date +%H:%M:%S)); artifacts in $OUT ==="
ls -la "$OUT"

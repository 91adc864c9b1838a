#!/bin/bash
# Round-5 master evidence ladder: chains the full round-4 ladder, the
# follow-on measurement ladder, and the round-5 extras, with restarts — so
# one transient relay failure can never end the round's listening.
# Everything underneath is .ok-marker resumable; restarting this script is
# always safe.
#
# Usage: bash tools/round5_tpu_runs.sh [outdir]   (default artifacts/r5)
set -u
cd "$(dirname "$0")/.."
OUT="${1:-artifacts/r5}"
mkdir -p "$OUT"

for attempt in 1 2 3; do
  echo "=== round5 master: main ladder attempt $attempt ($(date -u +%H:%M:%S)Z) ==="
  bash tools/round4_tpu_runs.sh "$OUT" && break
done
for attempt in 1 2; do
  echo "=== round5 master: follow-on ladder attempt $attempt ($(date -u +%H:%M:%S)Z) ==="
  bash tools/round4b_tpu_runs.sh "$OUT" && break
done

# round-5 extras ------------------------------------------------------------
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
    probe || { echo "relay never answered; stopping extras"; exit 1; }
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

# latency-regime registry entry: flagship at one utterance-sized batch, so
# EngineConfig(tuned_batch=128) deployments get measured blocks too
run autotune-latency 1800 python tools/autotune.py --batch 128 --commit \
    --out "$OUT/tuned_latency.json"

echo "=== round5 master done ($(date -u +%H:%M:%S)Z); artifacts in $OUT ==="
ls -la "$OUT"

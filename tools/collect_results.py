"""Consolidate evidence-ladder artifacts into one JSON summary.

The round-4 ladders (tools/round4_tpu_runs.sh, round4b_tpu_runs.sh) persist
each step's stdout under artifacts/r4/<step>.log and touch <step>.ok on
success.  Most steps end with machine-readable JSON lines (bench.py,
profile.py int4/serving/stack/blocksparse, autotune, verify_tpu,
bench_serve).  This tool walks the artifact directory and emits ONE
consolidated JSON object — the record the BENCHMARKS.md verdict tables are
written from, and a quick way to see what is still missing.

Usage:
    python tools/collect_results.py [artifacts/r4] [--out SUMMARY.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def extract_json_lines(path: str) -> list:
    """Every parseable top-level JSON object line in a log, in order."""
    out = []
    try:
        with open(path, errors="replace") as f:
            for line in f:
                line = line.strip()
                if not (line.startswith("{") and line.endswith("}")):
                    continue
                try:
                    out.append(json.loads(line))
                except ValueError:
                    continue
    except OSError:
        pass
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("dir", nargs="?", default="artifacts/r4")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    summary: dict = {"artifact_dir": args.dir, "steps": {}}
    for log in sorted(glob.glob(os.path.join(args.dir, "*.log"))):
        step = os.path.splitext(os.path.basename(log))[0]
        if step == "probe":
            continue
        done = os.path.exists(os.path.join(args.dir, step + ".ok"))
        records = extract_json_lines(log)
        entry: dict = {"ok": done, "json_records": len(records)}
        if records:
            # the last record is the step's verdict line by convention
            entry["last"] = records[-1]
            if len(records) > 1:
                entry["all"] = records
        else:
            # no JSON: keep the tail so failures are inspectable
            try:
                with open(log, errors="replace") as f:
                    entry["tail"] = f.read()[-500:]
            except OSError:
                pass
        summary["steps"][step] = entry

    # probe history: when did the relay answer / how long was it down
    probe = os.path.join(args.dir, "probe.log")
    if os.path.exists(probe):
        with open(probe, errors="replace") as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        summary["probe"] = {
            "attempts": len(lines),
            "first": lines[0] if lines else None,
            "last": lines[-1] if lines else None,
        }

    pending = [s for s, e in summary["steps"].items() if not e["ok"]]
    summary["pending_steps"] = pending
    line = json.dumps(summary, indent=1)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0 if not pending else 1


if __name__ == "__main__":
    sys.exit(main())

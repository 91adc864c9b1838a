#!/usr/bin/env python
"""Probe the TPU relay until it answers, then exit 0.

Addresses VERDICT r3 "What's weak #5": the measurement pipeline must survive a
transient relay outage. This probe retries `jax.devices()` in a fresh
subprocess per attempt (a hung libtpu init cannot be cancelled in-process),
logging each attempt to --log, and exits 0 the first time a TPU device
answers. Drive the evidence ladder off this: `python tools/tpu_probe.py &&
bash tools/round4_tpu_runs.sh`.

Usage: python tools/tpu_probe.py [--interval 300] [--per-try 420]
                                 [--max-hours 11] [--log tpu_probe.log]
"""
from __future__ import annotations

import argparse
import datetime
import subprocess
import sys
import time

CHILD = r"""
import jax
ds = jax.devices()
assert ds and ds[0].platform == "tpu", ds
print("OK", len(ds), ds[0].device_kind)
"""


def one_attempt(per_try: float) -> tuple[bool, str]:
    try:
        proc = subprocess.run(
            [sys.executable, "-c", CHILD],
            capture_output=True, text=True, timeout=per_try,
        )
    except subprocess.TimeoutExpired:
        return False, f"timeout after {per_try:.0f}s"
    if proc.returncode == 0 and proc.stdout.startswith("OK"):
        return True, proc.stdout.strip()
    tail = (proc.stderr or proc.stdout).strip().splitlines()
    return False, f"rc={proc.returncode}: {tail[-1] if tail else '<no output>'}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=300.0,
                    help="seconds between attempt starts")
    ap.add_argument("--per-try", type=float, default=420.0,
                    help="per-attempt init timeout (first compile can be slow)")
    ap.add_argument("--max-hours", type=float, default=11.0)
    ap.add_argument("--log", default="tpu_probe.log")
    args = ap.parse_args()

    deadline = time.time() + args.max_hours * 3600.0
    attempt = 0
    with open(args.log, "a") as log:
        while time.time() < deadline:
            attempt += 1
            t0 = time.time()
            ok, msg = one_attempt(args.per_try)
            stamp = datetime.datetime.now().isoformat(timespec="seconds")
            line = f"{stamp} attempt={attempt} ok={ok} {msg} ({time.time()-t0:.0f}s)"
            print(line, flush=True)
            log.write(line + "\n")
            log.flush()
            if ok:
                return 0
            time.sleep(max(0.0, args.interval - (time.time() - t0)))
    print("gave up: relay never answered", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())

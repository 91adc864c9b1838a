"""Render the evidence-ladder artifacts into BENCHMARKS.md-ready markdown.

Reads the per-step logs under an artifact directory (the same convention
tools/collect_results.py consumes: each measurement campaign ends with one
JSON verdict line) and prints the measured-verdict tables that replace the
PENDING sections in BENCHMARKS.md, applying each section's PRE-COMMITTED
decision rule (BENCHMARKS.md:83-124) so the prose verdict is computed from
the numbers, not narrated after the fact.

Usage:
    python tools/render_verdicts.py [artifacts/r5]
"""

from __future__ import annotations

import json
import os
import sys


def last_json(path: str) -> dict | None:
    try:
        with open(path, errors="replace") as f:
            recs = [
                json.loads(ln) for ln in f
                if ln.strip().startswith("{") and ln.strip().endswith("}")
            ]
        return recs[-1] if recs else None
    except (OSError, ValueError):
        return None


def render_blocksparse(d: str) -> None:
    rec = last_json(os.path.join(d, "blocksparse.log"))
    if not rec or "blocksparse" not in rec:
        print("## Block-sparse lazy — STILL PENDING (no artifact)\n")
        return
    rows = rec["blocksparse"]
    print(f"## Block-sparse lazy (measured, live-beam density "
          f"{rec.get('density', '?')})\n")
    print("| B | skip% | skip% clustered | dense ms | bs ms | bs+cluster ms | best vs dense |")
    print("|---:|---:|---:|---:|---:|---:|---:|")
    wins = []
    for r in rows:
        print(f"| {r['B']} | {r['skip']:.1%} | {r['skip_cl']:.1%} | "
              f"{r['dense_ms']} | {r['bs_ms']} | {r['bs_cluster_ms']} | "
              f"{r['speedup']:.2f}x |")
        wins.append(r["speedup"])
    # pre-committed rule: demote unless the win beats relay noise (>10%)
    best = max(wins) if wins else 0.0
    if best > 1.10:
        print(f"\n**Verdict: block-sparse WINS** (best {best:.2f}x > the 1.10x "
              "relay-noise bar) — lazy_mode='block_sparse' stays a first-class "
              "routing option; pair with engine.cluster for real decoder masks.")
    else:
        print(f"\n**Verdict: the dense floor stands** (best {best:.2f}x <= the "
              "1.10x relay-noise bar) — per the pre-committed rule, "
              "lazy_mode='block_sparse' is demoted to documented opt-in exactly "
              "as 'gathered' was, and the Scorer routing simplifies.")
    print()


def render_int4(d: str) -> None:
    rec = last_json(os.path.join(d, "int4.log"))
    if not rec or "int4" not in rec:
        print("## int4 hidden trunk — STILL PENDING (no artifact)\n")
        return
    t = rec["int4"]
    print(f"## int4 hidden trunk (measured, B={t.get('batch')})\n")
    print("| variant | ms/batch | float-oracle gate (<0.1) | status |")
    print("|---|---:|---:|---|")
    for name in ("int8", "int4", "int4_packed"):
        row = t.get(name, {})
        if "error" in row:
            print(f"| {name} | — | — | FAILED: {row['error'][:80]} |")
        else:
            print(f"| {name} | {row['ms']} | {row['oracle_gate']} | ok |")
    int8_ms = t.get("int8", {}).get("ms")
    cands = [
        (n, t[n]["ms"]) for n in ("int4", "int4_packed")
        if "ms" in t.get(n, {})
    ]
    if int8_ms and cands:
        best_name, best_ms = min(cands, key=lambda kv: kv[1])
        if best_ms < int8_ms / 1.10:
            print(f"\n**Verdict: {best_name} WINS** ({int8_ms/best_ms:.2f}x vs "
                  "int8, past the 1.10x relay-noise bar).")
        else:
            print("\n**Verdict: int8 stands** — per the pre-committed rule the "
                  "int4 trunk remains a capacity feature (half the weight "
                  "memory), not a speed feature.")
    if "error" in t.get("int4", {}) and "ms" in t.get("int4_packed", {}):
        print("\nNative s4 failed to lower; `int4_packed=True` is the "
              "documented way to run an int4 trunk (pre-committed rule).")
    print()


def render_serving(d: str) -> None:
    rec = last_json(os.path.join(d, "serving.log"))
    if not rec or "serving_config" not in rec:
        print("## Serving-config knobs — STILL PENDING (no artifact)\n")
        return
    t = rec["serving_config"]
    print(f"## Serving-config knobs (measured, B={t.get('batch')})\n")
    print("| config | ms/batch | float-oracle gate (<0.1) | max |dp| vs parity | argmax |")
    print("|---|---:|---:|---:|---:|")
    for name in ("parity", "fast_out", "fast_in", "serving"):
        row = t.get(name)
        if not isinstance(row, dict):
            continue
        print(f"| {name} | {row['ms']} | {row['oracle_gate']} | "
              f"{row['max_dp_vs_parity']:.2e} | {row['argmax_agree']:.4f} |")
    par, srv = t.get("parity", {}), t.get("serving", {})
    if "ms" in par and "ms" in srv:
        gain = par["ms"] / max(srv["ms"], 1e-9)
        gated = srv.get("oracle_gate", 1) < 0.1 and srv.get("argmax_agree") == 1.0
        if gain > 1.10 and gated:
            print(f"\n**Verdict: the serving profile WINS** ({gain:.2f}x, "
                  "accuracy gates green) — document "
                  "`--fast-posteriors --input-precision default` as the "
                  "deployment profile (parity stays the default).")
        else:
            print(f"\n**Verdict: parity stays the only documented profile** "
                  f"(gain {gain:.2f}x, gates {'green' if gated else 'RED'}).")
    print()


def render_stack(d: str) -> None:
    rec = last_json(os.path.join(d, "stack.log"))
    if not rec or "hidden_stack" not in rec:
        print("## Hidden-stack threshold — STILL PENDING (no artifact)\n")
        return
    rows = rec["hidden_stack"]
    print("## Hidden-stack threshold re-measurement\n")
    print("| B | per-layer ms | stack ms | stack is |")
    print("|---:|---:|---:|---:|")
    crossover = None
    for b in sorted(rows, key=int):
        r = rows[b]
        if "stack_error" in r:
            print(f"| {b} | {r['per_layer_ms']} | FAILED ({r['stack_error']}) | — |")
            continue
        ratio = r["per_layer_ms"] / max(r["stack_ms"], 1e-9)
        print(f"| {b} | {r['per_layer_ms']} | {r['stack_ms']} | {ratio:.2f}x |")
        if ratio > 1.0:
            crossover = int(b)
    print(f"\nLargest B where the stack still wins: {crossover} "
          "(config.stack_hidden_max_frames should sit at or above this and "
          "below the first per-layer win).")
    print()


def render_autotune(d: str) -> None:
    for tag in ("autotune", "autotune-mid", "autotune-latency"):
        rec = last_json(os.path.join(d, f"{tag}.log"))
        if rec and "knobs" in rec:
            print(f"autotune [{tag}]: net={rec['net']} batch={rec['batch']} "
                  f"default {rec['default_ms']} ms -> best {rec['best_ms']} ms "
                  f"({rec['speedup_vs_default']}x) knobs={rec['knobs']}")
    print()


def main() -> int:
    d = sys.argv[1] if len(sys.argv) > 1 else "artifacts/r5"
    for fn in (render_blocksparse, render_int4, render_serving, render_stack,
               render_autotune):
        fn(d)
    return 0


if __name__ == "__main__":
    sys.exit(main())

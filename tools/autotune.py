"""Block-size autotuner: find the fastest EngineConfig grid knobs for a
given net shape and batch on the REAL accelerator.

The shipped defaults (block_frames/block_nodes_hidden = 1024/1024,
block_frames_out = 256) were device-trace-tuned for the flagship
7x2048/8000 net at batch 8192 on v5e (docs/performance.md).  Other net
shapes, batch sizes, or TPU generations can prefer different tilings —
this tool sweeps the candidates and reports the measured best, using the
same exact per-kernel device times as tools/profile.py (wall clocks
through the relay are untrustworthy; see that module's docstring).

Two-stage sweep (keeps compiles bounded):
  1. hidden-layer (block_frames x block_nodes) over the divisor-valid
     subset of {256, 512, 1024, 2048}^2, output blocks fixed;
  2. output block_frames over {128, 256, 512} with the stage-1 winner.

Usage:
    python tools/autotune.py                         # flagship, batch 8192
    python tools/autotune.py --hidden 1024 --layers 5 --out-dim 4000
    python tools/autotune.py --batch 1024 --out tuned.json

Output: a table per stage plus ONE JSON line with the winning knobs,
ready to splat into EngineConfig(**knobs).  On CPU (no TPU) it still
runs — interpret-mode, device times ~0 — as a smoke path only.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

_spec = importlib.util.spec_from_file_location(
    "_fdn_profile", os.path.join(os.path.dirname(os.path.abspath(__file__)), "profile.py")
)
_profile = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_profile)
_device_total_ms = _profile._device_total_ms

#: hidden-block candidates; 128 joins only for small-batch (latency) sweeps
#: so the throughput sweep's compile budget stays bounded
HIDDEN_CANDIDATES_BASE = (128, 256, 512, 1024, 2048)
OUT_FRAME_CANDIDATES = (64, 128, 256, 512)


def _build(qnet, bf, bnh, bfo, interpret):
    from fastdnn_tpu.config import EngineConfig
    from fastdnn_tpu.engine.scorer import Scorer

    return Scorer(
        qnet,
        EngineConfig(
            backend="pallas", interpret=interpret,
            # autotuned=False: the sweep must measure exactly the knobs it
            # says it does — a previously committed registry entry would
            # otherwise silently overwrite knobs left at class defaults
            # (including the 'defaults' baseline itself)
            autotuned=False,
            block_frames=bf, block_nodes_hidden=bnh, block_frames_out=bfo,
        ),
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, default=2048)
    p.add_argument("--layers", type=int, default=7)
    p.add_argument("--out-dim", type=int, default=8000)
    p.add_argument("--input-dim", type=int, default=432)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--out", default=None, help="also write the JSON to a file")
    p.add_argument(
        "--commit", action="store_true",
        help="merge the winning knobs into the package registry "
        "(fastdnn_tpu/tuned.json) so Scorer picks them up as defaults for "
        "this (net, device kind); refuses on non-TPU platforms",
    )
    args = p.parse_args(argv)

    from fastdnn_tpu.config import EngineConfig, honor_jax_platforms_env
    from fastdnn_tpu.models.feedforward import random_net
    from fastdnn_tpu.quant.quantize import pad_qnet_for_tpu, quantize_net

    honor_jax_platforms_env()
    interpret = jax.devices()[0].platform != "tpu"
    if interpret:
        print("WARNING: no TPU — interpret-mode smoke run, times meaningless",
              flush=True)

    net = random_net(
        jax.random.PRNGKey(0), args.input_dim,
        [args.hidden] * args.layers, args.out_dim,
    )
    qnet = pad_qnet_for_tpu(quantize_net(net, cutoff=3.0))
    frames = np.random.default_rng(0).standard_normal(
        (args.batch, qnet.input_dim)
    ).astype(np.float32)

    probe = frames[: min(256, args.batch)]

    # Correctness yardstick for EVERY candidate (including the defaults
    # baseline): the jitted XLA oracle, established OUTSIDE the sweep — if
    # the baseline were allowed to seed the yardstick and it raised, the
    # first surviving candidate's output would become the reference, and a
    # result-corrupting tiling could win the sweep (ADVICE r4).  The suite's
    # invariant bounds pallas-vs-jitted-XLA posterior divergence at 3e-5.
    from fastdnn_tpu.engine.scorer import Scorer

    try:
        oracle = Scorer(
            qnet, EngineConfig(backend="xla", autotuned=False)
        )
        want_probe = np.asarray(oracle.score(probe))
    except Exception as e:
        print(f"FATAL: XLA-oracle baseline could not be established: "
              f"{type(e).__name__}: {e}", flush=True)
        return 2

    def measure(bf, bnh, bfo):
        """Device time for one knob combination — gated on correctness.

        Block sizes are pure scheduling knobs (the kernels compute identical
        results for every legal tiling), so before a candidate may win it
        must reproduce the XLA oracle's posteriors on a probe batch within
        the suite's 3e-5 resident-softmax bound; a tiling that trips a
        kernel edge is disqualified here rather than committed as an engine
        default behind a green sweep."""
        try:
            sc = _build(qnet, bf, bnh, bfo, interpret)
            got_probe = sc.score(probe)
        except Exception as e:  # e.g. a VMEM overflow at this tiling
            print(f"  knobs ({bf},{bnh},{bfo}) disqualified: "
                  f"{type(e).__name__}", flush=True)
            return float("inf")
        d = float(np.abs(got_probe - want_probe).max())
        if d > 3e-5:
            print(f"  knobs ({bf},{bnh},{bfo}) disqualified: posteriors "
                  f"diverge by {d}", flush=True)
            return float("inf")
        padded, _ = sc._prepare(frames)
        return _device_total_ms(lambda: sc._score(sc.net, padded), reps=args.reps)

    d = EngineConfig()  # shipped defaults as the sweep baseline
    hidden_pad = qnet.weights[0].shape[1]
    best = dict(
        block_frames=d.block_frames,
        block_nodes_hidden=d.block_nodes_hidden,
        block_frames_out=d.block_frames_out,
    )
    base_ms = measure(
        best["block_frames"], best["block_nodes_hidden"], best["block_frames_out"]
    )
    print(f"defaults {best} : {base_ms:7.3f} ms/{args.batch} frames", flush=True)

    print("\nstage 1: hidden blocks (frames x nodes)", flush=True)
    best_ms = base_ms
    hidden_candidates = tuple(
        c for c in HIDDEN_CANDIDATES_BASE if args.batch < 1024 or c >= 256
    )
    for bf in hidden_candidates:
        if args.batch % bf:
            continue
        for bnh in hidden_candidates:
            if hidden_pad % bnh:
                continue
            if (bf, bnh) == (d.block_frames, d.block_nodes_hidden):
                continue
            ms = measure(bf, bnh, best["block_frames_out"])
            mark = ""
            if ms < best_ms:
                best_ms = ms
                best["block_frames"], best["block_nodes_hidden"] = bf, bnh
                mark = "  <-- best"
            print(f"  {bf:>5} x {bnh:<5} : {ms:7.3f} ms{mark}", flush=True)

    print("\nstage 2: output frame block", flush=True)
    for bfo in OUT_FRAME_CANDIDATES:
        if bfo == best["block_frames_out"] or args.batch % bfo:
            continue
        ms = measure(best["block_frames"], best["block_nodes_hidden"], bfo)
        mark = ""
        if ms < best_ms:
            best_ms = ms
            best["block_frames_out"] = bfo
            mark = "  <-- best"
        print(f"  out frames {bfo:>4} : {ms:7.3f} ms{mark}", flush=True)

    result = {
        "net": f"{args.input_dim}-{args.layers}x{args.hidden}-{args.out_dim}",
        "batch": args.batch,
        "platform": jax.devices()[0].platform,
        "device_kind": jax.devices()[0].device_kind,
        "default_ms": round(base_ms, 3),
        "best_ms": round(best_ms, 3),
        "speedup_vs_default": round(base_ms / max(best_ms, 1e-9), 3),
        "knobs": best,
    }
    line = json.dumps(result)
    print("\n" + line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    if args.commit:
        if result["platform"] != "tpu":
            print("--commit refused: interpret-mode times are meaningless",
                  flush=True)
            return 1
        from fastdnn_tpu.tuning import merge_entry, registry_path

        merge_entry(result)
        print(f"committed to {registry_path()}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

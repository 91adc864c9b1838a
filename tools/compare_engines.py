"""Property-based cross-engine validation: fuzz random topologies through
THIS engine and the compiled reference C++ engine, and report divergences.

Generalizes the fixed goldens (tests/golden/*) into a sweep: for each trial
a random topology is drawn (depth, widths, senone count — including odd,
unaligned dims), a model is written with OUR binary writer, the UNMODIFIED
reference binary scores the bundled features, and the per-senone summed
|Δposterior| is compared against the reference's own acceptance gate
(summed |Δ| <= 0.1 per senone, FuncTest.java:70-72) and our 5x-tightened
gate.  Argmax agreement is reported on frames whose top-2 margin exceeds
cross-engine quantization noise.

Each trial ALSO gates the LAZY path (r5, VERDICT r4 #7): FuncTest-style
evolving beam masks are scored by the reference's own
CalculationContext::LazyOutputActivations via tools/ref_lazy_harness.cc
(the reference CLI never exposed lazy, so this is the only way to
cross-gate it) and compared against Scorer.score_masked under the default
softmax-over-zeros reference semantics.

    JAX_PLATFORMS=cpu python tools/compare_engines.py [--trials 10] [--seed 0]

Exit 0 = every trial (dense AND lazy) inside the tight gate with full
resolvable-argmax agreement.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference"
FEATURES = os.path.join(REF, "data", "8khz.aligned.bin")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--frames", type=int, default=64)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from fastdnn_tpu.config import EngineConfig
    from fastdnn_tpu.engine.scorer import Scorer
    from fastdnn_tpu.formats.binary import read_features, write_features, write_model
    from fastdnn_tpu.models.feedforward import align, random_net, to_raw
    from fastdnn_tpu.quant.quantize import quantize_net
    from tools.make_reference_golden import (
        build_reference_engine,
        build_reference_lazy_harness,
        run_reference,
        run_reference_lazy,
    )

    rng = np.random.default_rng(args.seed)
    feats = read_features(FEATURES)[: args.frames]

    from fastdnn_tpu.cli.score import generate_masks

    failures = 0
    with tempfile.TemporaryDirectory() as td:
        ref_bin = build_reference_engine(td)
        ref_lazy = build_reference_lazy_harness(td)
        feats_path = os.path.join(td, "feats.bin")
        write_features(feats, feats_path)
        print(f"{'trial':>5} {'topology':>22} {'max|dp|':>9} {'sum|dp|max':>10} "
              f"{'argmax':>7} {'lazy sum|dp|':>12} {'verdict':>8}")
        for t in range(args.trials):
            # depth >= 3: the REFERENCE cannot act as oracle for shallower
            # nets — CalculationContext sizes its activation buffers from
            # layers()[1] (dnn.cc:199), which is out of bounds with zero
            # int8 hidden layers (segfault) and the OUTPUT layer with
            # exactly one (silent heap overflow, ASan-verified).  This
            # engine handles every depth (tests/test_fuzz.py sweeps 1-4;
            # see PARITY.md "Reference bugs surfaced").
            depth = int(rng.integers(3, 6))
            width = int(rng.integers(48, 512))
            out = int(rng.integers(40, 2000))
            seed = int(rng.integers(0, 2**31))
            net = align(
                random_net(jax.random.PRNGKey(seed), 429, [width] * depth, out), 4, 16
            )
            model_path = os.path.join(td, f"m{t}.bin")
            write_model(to_raw(net), model_path)
            ref_post = run_reference(ref_bin, model_path, feats_path, td)

            scorer = Scorer(quantize_net(net, cutoff=3.0), EngineConfig(backend="xla"))
            ours = scorer.score(feats)
            d = np.abs(ours - ref_post)
            sum_dp = d.sum(axis=0).max()
            # argmax on frames whose reference top-2 margin is resolvable
            srt = np.sort(ref_post, axis=1)
            resolvable = (srt[:, -1] - srt[:, -2]) > 10 * d.max()
            agree = (
                float(
                    (ours[resolvable].argmax(1) == ref_post[resolvable].argmax(1)).mean()
                )
                if resolvable.any()
                else float("nan")
            )

            # lazy path: evolving FuncTest-style beam masks through the
            # reference's LazyOutputActivations vs our score_masked under
            # the default softmax-over-zeros reference semantics
            mask_rng = np.random.default_rng(seed ^ 0x5A5A)
            density = float(rng.uniform(0.05, 0.5))
            masks = generate_masks(mask_rng, len(feats), out, density)
            ref_lazy_post = run_reference_lazy(
                ref_lazy, model_path, feats_path, masks, td
            )
            ours_lazy = scorer.score_masked(feats, masks)
            lazy_sum_dp = np.abs(ours_lazy - ref_lazy_post).sum(axis=0).max()

            ok = (sum_dp < 0.02 and lazy_sum_dp < 0.02
                  and (not resolvable.any() or agree == 1.0))
            failures += not ok
            print(
                f"{t:>5} {f'{429}-{depth}x{width}-{out}':>22} {d.max():>9.2e} "
                f"{sum_dp:>10.4f} {agree:>7.3f} {lazy_sum_dp:>12.4f} "
                f"{'ok' if ok else 'DIVERGED':>8}",
                flush=True,
            )
    print(f"\n{args.trials - failures}/{args.trials} trials inside the tight gate "
          f"(reference's own gate is 5x looser)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

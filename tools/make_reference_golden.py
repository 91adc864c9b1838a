"""Regenerate tests/golden/* — cross-implementation parity fixtures.

Builds the UNMODIFIED reference C++ engine from /root/reference, writes
models with OUR binary writer, runs the reference CLI on them with the
bundled features, and stores its posteriors as goldens.  See
tests/test_reference_parity.py for what each fixture proves.

Fixtures:
  parity_model.bin / parity_ref_posteriors.bin
      Small net (429 -> 3x64 -> 100, align(4,16)); full 389-frame pass.
  flagship_seed_model.bin / flagship_ref_posteriors.bin
      The reference's own big-net recipe (FuncTest.java:21-28): a small
      7-hidden-layer seed net extended to the flagship 7x2048/8000 by
      circular cloning.  The 165 MB extended model is NOT checked in — the
      test re-derives it deterministically (pure numpy, no PRNG) from the
      checked-in seed via models.feedforward.extend.  32 frames.
  divergence_model.bin / divergence_ref_posteriors.bin
      Small net with POSITIVE weight outliers above the quantization cutoff
      (3.0).  The reference fails to clamp positive outliers before
      rounding (its max-side test reads `minWeight > maxWeight`,
      /root/reference/src/cpp/dnn.cc:496-498), so w=5 quantizes to
      round(5*42)=210 which overflows signed char; this fixture MEASURES
      the engines' divergence on that path instead of reasoning about it.

Usage:  JAX_PLATFORMS=cpu python tools/make_reference_golden.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
GOLDEN = os.path.join(REPO, "tests", "golden")
FEATURES = os.path.join(REF, "data", "8khz.aligned.bin")
FLAGSHIP_FRAMES = 32  # keeps the checked-in flagship golden at ~1 MB


def build_reference_engine(outdir: str) -> str:
    ref_bin = os.path.join(outdir, "ref-dnn")
    subprocess.run(
        [
            "g++", "-O2", "-msse4", "-std=c++11", "-o", ref_bin,
            os.path.join(REF, "src/cpp/dnn.cc"),
            os.path.join(REF, "src/cpp/float_dnn.cc"),
        ],
        check=True,
    )
    return ref_bin


def run_reference(ref_bin: str, model_path: str, features_path: str, td: str) -> np.ndarray:
    out_txt = os.path.join(td, "ref_out.txt")
    subprocess.run([ref_bin, model_path, features_path, out_txt, "TXT"], check=True)
    return np.loadtxt(out_txt, dtype=np.float32)


def build_reference_lazy_harness(td: str) -> str:
    """Compile tools/ref_lazy_harness.cc against the unmodified reference
    sources (dnn.cc's CLI main renamed out of the way) — the only route to
    the reference's lazy path, which its CLI never exposed."""
    obj = os.path.join(td, "ref_dnn.o")
    subprocess.run(
        ["g++", "-O2", "-msse4", "-std=c++11", "-Dmain=ref_cli_main",
         "-c", os.path.join(REF, "src/cpp/dnn.cc"), "-o", obj],
        check=True,
    )
    ref_lazy = os.path.join(td, "ref-lazy")
    subprocess.run(
        ["g++", "-O2", "-msse4", "-std=c++11",
         "-I", os.path.join(REF, "src/cpp"),
         "-o", ref_lazy,
         os.path.join(REPO, "tools", "ref_lazy_harness.cc"),
         obj, os.path.join(REF, "src/cpp/float_dnn.cc")],
        check=True,
    )
    return ref_lazy


def run_reference_lazy(ref_lazy: str, model_path: str, features_path: str,
                       masks: np.ndarray, td: str) -> np.ndarray:
    """Reference lazy posteriors [frames, out] for a 0/1 mask matrix."""
    sys.path.insert(0, REPO)
    from fastdnn_tpu.formats.binary import write_features

    masks_path = os.path.join(td, "masks.bin")
    write_features(masks.astype(np.float32), masks_path)
    out_txt = os.path.join(td, "ref_lazy_out.txt")
    subprocess.run(
        [ref_lazy, model_path, features_path, masks_path, out_txt], check=True
    )
    return np.loadtxt(out_txt, dtype=np.float32).reshape(masks.shape)


def make_divergence_net(jax):
    """Seed net with deliberate positive outliers above the cutoff."""
    from fastdnn_tpu.models.feedforward import align, random_net

    net = align(random_net(jax.random.PRNGKey(31), 429, [64, 64, 64], 100), 4, 16)
    # plant positive outliers in hidden layer 2 (weights[1]): deterministic
    # positions, magnitudes spanning (cutoff, 2*cutoff) where the reference's
    # unclamped rounding overflows char while our clamp saturates at 127
    w = np.asarray(net.weights[1]).copy()
    rows = np.arange(24) * 2 % w.shape[0]
    cols = np.arange(24) * 5 % w.shape[1]
    w[rows, cols] = np.linspace(3.5, 6.0, 24, dtype=np.float32)
    import dataclasses

    import jax.numpy as jnp

    return dataclasses.replace(
        net, weights=(net.weights[0], jnp.asarray(w)) + net.weights[2:]
    )


def main() -> int:
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from fastdnn_tpu.formats.binary import (
        read_features,
        write_features,
        write_model,
    )
    from fastdnn_tpu.models.feedforward import align, extend, random_net, to_raw

    os.makedirs(GOLDEN, exist_ok=True)

    with tempfile.TemporaryDirectory() as td:
        ref_bin = build_reference_engine(td)

        # -- 1. small full-pass parity golden --------------------------------
        model_path = os.path.join(GOLDEN, "parity_model.bin")
        net = align(random_net(jax.random.PRNGKey(11), 429, [64, 64, 64], 100), 4, 16)
        write_model(to_raw(net), model_path)
        post = run_reference(ref_bin, model_path, FEATURES, td)
        write_features(post, os.path.join(GOLDEN, "parity_ref_posteriors.bin"))
        print(f"parity golden: model + posteriors {post.shape}")

        # -- 2. flagship-scale golden (FuncTest.java:21-28 recipe) -----------
        # Seed weights are scaled for the POST-extend fan-in (2048): circular
        # cloning to 2048 wide multiplies fan-in 32x, so a seed scaled for
        # fan-in 64 would saturate every sigmoid in the extended net and
        # flatten the posteriors below quantization noise (no meaningful
        # argmax).  With 2048**-0.5 the extended flagship has trained-like
        # activation dynamics.
        seed_path = os.path.join(GOLDEN, "flagship_seed_model.bin")
        seed = align(
            random_net(jax.random.PRNGKey(21), 429, [64] * 7, 100, w_std=2048**-0.5),
            4, 16,
        )
        # widen the output layer so the 100 real senones have an O(1) logit
        # range: the recipe's 7900 zero-weight synthetic senones flatten the
        # softmax, and with hidden-scaled output weights the top-2 posterior
        # margin would sit below cross-engine quantization noise, making
        # argmax agreement untestable.  x14 keeps |w| well under the 3.0
        # cutoff (no clamping; the clamp path has its own divergence golden).
        import dataclasses

        import jax.numpy as jnp

        seed = dataclasses.replace(
            seed, weights=seed.weights[:-1] + (seed.weights[-1] * 14.0,)
        )
        assert float(jnp.abs(seed.weights[-1]).max()) < 3.0
        write_model(to_raw(seed), seed_path)
        big = extend(seed, 2048, 8000)  # deterministic numpy transform
        big_path = os.path.join(td, "flagship_model.bin")
        write_model(to_raw(big), big_path)
        feats32 = read_features(FEATURES)[:FLAGSHIP_FRAMES]
        feats32_path = os.path.join(td, "feats32.bin")
        write_features(feats32, feats32_path)
        post = run_reference(ref_bin, big_path, feats32_path, td)
        write_features(post, os.path.join(GOLDEN, "flagship_ref_posteriors.bin"))
        print(f"flagship golden: seed model + posteriors {post.shape}")

        # -- 3. quantizer-divergence golden -----------------------------------
        div_path = os.path.join(GOLDEN, "divergence_model.bin")
        write_model(to_raw(make_divergence_net(jax)), div_path)
        post = run_reference(ref_bin, div_path, FEATURES, td)
        write_features(post, os.path.join(GOLDEN, "divergence_ref_posteriors.bin"))
        print(f"divergence golden: model + posteriors {post.shape}")

        # -- 4. lazy-path golden (mask-matrix) --------------------------------
        # The reference CLI never exposed LazyOutputActivations; this golden
        # comes from tools/ref_lazy_harness.cc driving it with FuncTest-style
        # evolving beam masks (generateMasks, FuncTest.java:121-154 shape) on
        # the parity model — so the suite gates score_masked against the
        # reference's ACTUAL lazy output (softmax-over-zeros semantics
        # included) without recompiling the reference per run.
        from fastdnn_tpu.cli.score import generate_masks

        ref_lazy = build_reference_lazy_harness(td)
        feats64 = read_features(FEATURES)[:64]
        feats64_path = os.path.join(td, "feats64.bin")
        write_features(feats64, feats64_path)
        masks = generate_masks(np.random.default_rng(41), 64, 100, 0.4)
        write_features(
            masks.astype(np.float32), os.path.join(GOLDEN, "lazy_masks.bin")
        )
        post = run_reference_lazy(ref_lazy, model_path, feats64_path, masks, td)
        write_features(post, os.path.join(GOLDEN, "lazy_ref_posteriors.bin"))
        print(f"lazy golden: masks + posteriors {post.shape}")

    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Regenerate tests/golden/* — cross-implementation parity fixtures.

Builds the UNMODIFIED reference C++ engine from /root/reference, writes a
small model with OUR binary writer, runs the reference CLI on it with the
bundled features, and stores its posteriors as the golden.  See
tests/test_reference_parity.py for what the fixtures prove.

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


def main() -> int:
    sys.path.insert(0, REPO)
    import jax

    from fastdnn_tpu.formats.binary import write_features, write_model
    from fastdnn_tpu.models.feedforward import align, random_net, to_raw

    os.makedirs(GOLDEN, exist_ok=True)
    model_path = os.path.join(GOLDEN, "parity_model.bin")
    net = align(random_net(jax.random.PRNGKey(11), 429, [64, 64, 64], 100), 4, 16)
    write_model(to_raw(net), model_path)

    with tempfile.TemporaryDirectory() as td:
        ref_bin = os.path.join(td, "ref-dnn")
        subprocess.run(
            [
                "g++", "-O2", "-msse4", "-std=c++11", "-o", ref_bin,
                os.path.join(REF, "src/cpp/dnn.cc"),
                os.path.join(REF, "src/cpp/float_dnn.cc"),
            ],
            check=True,
        )
        out_txt = os.path.join(td, "ref_out.txt")
        subprocess.run([ref_bin, model_path, FEATURES, out_txt, "TXT"], check=True)
        post = np.loadtxt(out_txt, dtype=np.float32)

    write_features(post, os.path.join(GOLDEN, "parity_ref_posteriors.bin"))
    print(f"golden regenerated: model + posteriors {post.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

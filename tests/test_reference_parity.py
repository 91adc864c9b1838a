"""Cross-implementation parity against the REAL reference engine.

The golden files were produced by compiling the reference C++ engine
unmodified and running its CLI on a model written by OUR binary writer:

    g++ -O2 -msse4 -std=c++11 -o ref-dnn \
        /root/reference/src/cpp/dnn.cc /root/reference/src/cpp/float_dnn.cc
    ref-dnn tests/golden/parity_model.bin \
        /root/reference/data/8khz.aligned.bin ref_out.txt TXT

(reference CLI: cutoff 3, batch 8, dnn.cc:20-84).  That run proves two
things at once: the reference binary parses our model files byte-for-byte,
and our quantized posteriors match its actual SSE int8 output — not just
our own float oracle.

Model: 429 -> 3x64 sigmoid -> 100 softmax, align(4,16) -> 432 input
(random_net(PRNGKey(11)), tools/make_reference_golden.py regenerates).

Expected divergences are all sub-quantization-noise here: our exact int32
accumulation vs _mm_maddubs_epi16 16-bit pairwise saturation (dnn.cc:340;
no saturation occurs at these magnitudes), our stable vs the reference's
unstable softmax (dnn.cc:534-544), and f32 summation order.  Observed:
max |dp| ~1.4e-4, summed |dp| per senone ~0.011; the reference's own
FuncTest gate is summed |dp| < 0.1 (FuncTest.java:70-72) — we assert 5x
tighter.
"""

import os

import numpy as np
import pytest

from fastdnn_tpu.config import EngineConfig
from fastdnn_tpu.engine.scorer import Scorer
from fastdnn_tpu.formats.binary import read_features, read_model
from fastdnn_tpu.models.feedforward import from_raw
from fastdnn_tpu.quant.quantize import quantize_net

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
FEATURES = "/root/reference/data/8khz.aligned.bin"


@pytest.fixture(scope="module")
def golden():
    model = read_model(os.path.join(GOLDEN, "parity_model.bin"))
    ref = read_features(os.path.join(GOLDEN, "parity_ref_posteriors.bin"))
    frames = read_features(FEATURES)
    return model, frames, ref


@pytest.mark.parametrize("backend_kw", [
    dict(backend="xla"),
    dict(backend="pallas", interpret=True),
])
def test_posteriors_match_reference_engine(golden, backend_kw):
    raw, frames, ref = golden
    qnet = quantize_net(from_raw(raw), cutoff=3.0)  # CLI hardcodes 3 (dnn.cc:60)
    ours = Scorer(qnet, EngineConfig(**backend_kw)).score(frames)
    assert ours.shape == ref.shape
    d = np.abs(ours - ref)
    assert d.max() < 5e-4, f"max |dp| {d.max():.2e} vs reference engine"
    # the reference's own acceptance gate (0.1), 5x tightened
    assert d.sum(axis=0).max() < 0.02
    np.testing.assert_array_equal(ours.argmax(1), ref.argmax(1))


def test_reference_tolerance_gate_semantics(golden):
    """The gate above implies the reference's own diff() check passes
    (FuncTest.java:59-74: flag any senone whose summed |dp| across frames
    exceeds 0.1)."""
    raw, frames, ref = golden
    qnet = quantize_net(from_raw(raw))
    ours = Scorer(qnet, EngineConfig(backend="xla")).score(frames)
    flagged = (np.abs(ours - ref).sum(axis=0) > 0.1).sum()
    assert flagged == 0

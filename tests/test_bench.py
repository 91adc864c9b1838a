"""Smoke tests for the bench harness itself (bench.py at the repo root).

The headline numbers come from the real TPU; these tests only pin the
harness mechanics on CPU: the chained-repetition marginal produces a
finite positive rate, and the slice-only feedback used on the opaque
pallas path scores the same posteriors as the consume-sum feedback.
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


@pytest.fixture(scope="module")
def scorer():
    from fastdnn_tpu.config import EngineConfig
    from fastdnn_tpu.engine.scorer import Scorer
    from fastdnn_tpu.models.feedforward import random_net
    from fastdnn_tpu.quant.quantize import quantize_net

    # the posterior-feedback chain slices the first input_dim columns of
    # the posteriors, so (like every bench config) output_dim >= input_dim
    net = random_net(jax.random.PRNGKey(3), 96, [128, 128], 500)
    return Scorer(quantize_net(net), EngineConfig(backend="xla"))


def test_chained_marginal_finite(scorer):
    frames = jax.numpy.asarray(
        np.random.default_rng(0).standard_normal((64, scorer.input_dim)).astype(np.float32)
    )
    fps = bench.chained_frames_per_s(
        lambda x: scorer._score(scorer.net, x),
        frames,
        reps_lo=1,
        reps_hi=3,
        iters=2,
    )
    assert np.isfinite(fps) and fps > 0


def test_feedback_modes_score_full_posteriors(scorer):
    """Both feedback modes drive full-width, normalized posteriors through
    the whole chain (opaque_output changes what is consumed, not scored)."""
    frames = jax.numpy.asarray(
        np.random.default_rng(1).standard_normal((32, scorer.input_dim)).astype(np.float32)
    )

    def chain(opaque):
        x = frames
        for _ in range(3):
            p = scorer._score(scorer.net, x)
            x = p[:, : scorer.input_dim] * 50.0
            if not opaque:
                x = x + jax.numpy.sum(p, axis=1, keepdims=True)
        return np.asarray(p)

    for opaque in (True, False):
        p = chain(opaque)
        assert p.shape == (32, scorer.output_dim)
        assert np.isfinite(p).all()
        np.testing.assert_allclose(p.sum(1), 1.0, rtol=1e-4)


def test_autotune_smoke(tmp_path):
    """tools/autotune.py end to end on CPU (interpret): sweeps, prints the
    JSON line, writes --out, and returns the shipped defaults untouched
    when no candidate beats them (all-zero CPU device times)."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "fdn_autotune",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "autotune.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "tuned.json"
    rc = mod.main([
        "--hidden", "128", "--layers", "2", "--out-dim", "256",
        "--batch", "256", "--reps", "1", "--out", str(out),
    ])
    assert rc == 0
    got = json.loads(out.read_text())
    assert got["knobs"]["block_frames"] > 0
    assert got["net"] == "432-2x128-256"

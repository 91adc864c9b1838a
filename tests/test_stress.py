"""Concurrency + fuzz stress tests.

The reference's MultiThreadedStressTest (/root/reference/test/java/suskun/nn/
MultiThreadedStressTest.java) runs 8 threads x 1000 tasks over one shared
model, each task shuffling frames and taking a random-length prefix — a
crash-by-execution race detector.  Here the same contract (one shared Scorer,
many threads, random prefixes) is an actual correctness assertion: every
thread's posteriors must equal the single-threaded result for its input.
"""

import concurrent.futures

import jax
import numpy as np
import pytest

from fastdnn_tpu.config import EngineConfig
from fastdnn_tpu.engine.scorer import Scorer
from fastdnn_tpu.models.feedforward import random_net
from fastdnn_tpu.quant.quantize import quantize_net


@pytest.fixture(scope="module")
def scorer():
    net = random_net(jax.random.PRNGKey(11), 432, [128, 128], 200)
    return Scorer(quantize_net(net), EngineConfig(backend="xla"))


def test_shared_scorer_multithreaded(scorer, features_8khz):
    """8 threads x 25 tasks, shuffled prefixes, exact agreement with a
    single-threaded oracle (seeded like the reference, Random(1))."""
    rng = np.random.default_rng(1)
    tasks = []
    for _ in range(25 * 8):
        n = int(rng.integers(1, features_8khz.shape[0] + 1))
        perm = rng.permutation(features_8khz.shape[0])[:n]
        tasks.append(features_8khz[perm])

    expected_probe = {}  # spot-check oracle for a subset (full oracle is slow)
    for i in range(0, len(tasks), 40):
        expected_probe[i] = scorer.score(tasks[i])

    def run(i):
        return i, scorer.score(tasks[i])

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = dict(ex.map(run, range(len(tasks))))

    for i, frames in enumerate(tasks):
        assert results[i].shape == (frames.shape[0], scorer.output_dim)
        np.testing.assert_allclose(results[i].sum(-1), 1.0, rtol=1e-4)
    for i, exp in expected_probe.items():
        np.testing.assert_array_equal(results[i], exp)


def test_concurrent_lazy_contexts(scorer, features_16khz, rng):
    """Independent LazyContexts over one shared Scorer (the reference's
    context-per-call thread-safety model, jni_dnn.cc:49-52)."""
    masks = (rng.random((4, 6, scorer.output_dim)) < 0.4).astype(np.uint8)

    def run(t):
        ctx = scorer.new_lazy_context(6)
        ctx.calculate_until_output(features_16khz[t : t + 6])
        return [ctx.calculate_for_output_nodes(masks[t][i]) for i in range(6)]

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(run, range(4)))

    for t in range(4):
        expected = scorer.score_masked(features_16khz[t : t + 6], masks[t])
        for i in range(6):
            np.testing.assert_allclose(results[t][i], expected[i], atol=2e-6)


def test_shape_fuzz(scorer, rng):
    """Random frame counts and feature dims (<= input dim) never crash and
    always produce normalized posteriors."""
    for _ in range(20):
        n = int(rng.integers(1, 300))
        d = int(rng.integers(1, scorer.input_dim + 1))
        frames = rng.standard_normal((n, d)).astype(np.float32)
        out = scorer.score(frames)
        assert out.shape == (n, scorer.output_dim)
        np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-4)


def test_score_utterances_batch(scorer, features_16khz, features_8khz):
    utts = {"a": features_16khz[:33], "b": features_8khz[:7], "c": features_16khz[40:41]}
    batched = scorer.score_utterances(utts)
    assert set(batched) == {"a", "b", "c"}
    for k, frames in utts.items():
        np.testing.assert_array_equal(batched[k], scorer.score(frames))
    as_list = scorer.score_utterances([features_16khz[:5]])
    np.testing.assert_array_equal(as_list[0], scorer.score(features_16khz[:5]))
    assert scorer.score_utterances({}) == {}


def test_mesh_scorer_thread_stress(small_net, features_16khz, rng):
    """The MultiThreadedStressTest contract on the MESH engine: many
    threads share one Scorer(mesh=...) and every result must EXACTLY equal
    a serial run (shard_map programs are immutable + jit-cached, so
    concurrency must be a non-event)."""
    import concurrent.futures

    from fastdnn_tpu.parallel.mesh import make_mesh

    qnet = quantize_net(small_net)
    sc = Scorer(qnet, EngineConfig(backend="xla"), mesh=make_mesh(data=4, model=2))
    jobs = []
    for t in range(8):
        n = int(rng.integers(1, 40))
        jobs.append(np.asarray(features_16khz[t : t + n], np.float32))
    expected = [sc.score(f) for f in jobs]

    def run(i):
        return sc.score(jobs[i])

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(run, range(8)))
    for got, want in zip(results, expected):
        np.testing.assert_array_equal(got, want)

"""Streaming engine + scoring server tests (CPU backend).

The reference's serving model is thread-per-caller over JNI
(/root/reference/test/java/suskun/nn/MultiThreadedStressTest.java); the TPU
replacement batches across callers.  These tests verify: per-utterance
results identical to direct Scorer calls, cross-thread batching, masked
submissions, error propagation, and the TCP protocol end to end.
"""

import threading

import numpy as np
import pytest

from fastdnn_tpu.config import EngineConfig
from fastdnn_tpu.engine.scorer import Scorer
from fastdnn_tpu.engine.stream import StreamingScorer
from fastdnn_tpu.quant.quantize import quantize_net


@pytest.fixture(scope="module")
def scorer(small_net):
    return Scorer(quantize_net(small_net), EngineConfig(backend="xla"))


@pytest.fixture()
def stream(scorer):
    with StreamingScorer(scorer, max_batch_frames=256, max_wait_ms=10.0) as ss:
        yield ss


def rand_utts(rng, count, dim, lo=3, hi=40):
    return [
        rng.standard_normal((int(rng.integers(lo, hi)), dim)).astype(np.float32)
        for _ in range(count)
    ]


class TestStreamingScorer:
    def test_matches_direct_scoring(self, stream, scorer, rng):
        utts = rand_utts(rng, 12, scorer.input_dim)
        futs = [stream.submit(u) for u in utts]
        for u, f in zip(utts, futs):
            np.testing.assert_allclose(f.result(timeout=60), scorer.score(u), atol=1e-6)

    def test_many_threads(self, stream, scorer, rng):
        utts = rand_utts(rng, 32, scorer.input_dim)
        results = [None] * len(utts)
        errors = []

        def worker(lo, hi):
            try:
                futs = [(i, stream.submit(utts[i])) for i in range(lo, hi)]
                for i, f in futs:
                    results[i] = f.result(timeout=60)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [
            threading.Thread(target=worker, args=(i * 8, (i + 1) * 8)) for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        for u, r in zip(utts, results):
            np.testing.assert_allclose(r, scorer.score(u), atol=1e-6)
        assert stream.throughput.frames == sum(u.shape[0] for u in utts)

    def test_masked_submissions(self, stream, scorer, rng):
        u = rng.standard_normal((7, scorer.input_dim)).astype(np.float32)
        masks = (rng.random((7, scorer.output_dim)) < 0.4).astype(np.uint8)
        got = stream.submit(u, masks).result(timeout=60)
        np.testing.assert_allclose(got, scorer.score_masked(u, masks), atol=1e-6)

    def test_mixed_masked_and_plain(self, stream, scorer, rng):
        u1 = rng.standard_normal((5, scorer.input_dim)).astype(np.float32)
        u2 = rng.standard_normal((6, scorer.input_dim)).astype(np.float32)
        masks = (rng.random((6, scorer.output_dim)) < 0.5).astype(np.uint8)
        f1 = stream.submit(u1)
        f2 = stream.submit(u2, masks)
        np.testing.assert_allclose(f1.result(60), scorer.score(u1), atol=1e-6)
        np.testing.assert_allclose(f2.result(60), scorer.score_masked(u2, masks), atol=1e-6)

    def test_concurrent_load_batches_fill(self, scorer, rng):
        """Under concurrent load the packer must put more than one
        utterance per device dispatch (mean batch fill > one utterance's
        frames, batches < utterances) — the serving economics the whole
        streaming design exists for.  tools/bench_serve.py measures the
        same number under real TCP load on the TPU."""
        utts = rand_utts(rng, 48, scorer.input_dim, lo=8, hi=16)
        with StreamingScorer(scorer, max_batch_frames=4096, max_wait_ms=80.0) as ss:
            barrier = threading.Barrier(8)
            futs: list = [None] * len(utts)

            def worker(t):
                barrier.wait()  # all submitters hit the queue together
                for i in range(t, len(utts), 8):
                    futs[i] = ss.submit(utts[i])

            threads = [threading.Thread(target=worker, args=(t,)) for t in range(8)]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            for u, f in zip(utts, futs):
                np.testing.assert_allclose(
                    f.result(timeout=60), scorer.score(u), atol=1e-6
                )
            tp = ss.throughput
        assert tp.batches < len(utts), (tp.batches, len(utts))
        assert tp.mean_batch_fill() > max(u.shape[0] for u in utts)

    def test_oversized_utterance_rejected(self, stream, scorer):
        with pytest.raises(ValueError, match="exceeds"):
            stream.submit(np.zeros((257, scorer.input_dim), np.float32))

    def test_bad_mask_shape_rejected(self, stream, scorer):
        with pytest.raises(ValueError, match="masks"):
            stream.submit(
                np.zeros((4, scorer.input_dim), np.float32),
                np.zeros((4, 3), np.uint8),
            )

    def test_closed_rejects(self, scorer):
        ss = StreamingScorer(scorer)
        ss.close()
        with pytest.raises(RuntimeError):
            ss.submit(np.zeros((2, scorer.input_dim), np.float32))


class TestScoreServer:
    @pytest.fixture(scope="class")
    def server(self, small_net, tmp_path_factory):
        import jax

        from fastdnn_tpu.cli.serve import ScoreServer, make_server
        from fastdnn_tpu.formats.binary import write_model
        from fastdnn_tpu.models.feedforward import to_raw

        path = tmp_path_factory.mktemp("srv") / "model.bin"
        write_model(to_raw(small_net), path)

        class A:
            model = str(path)
            host, port = "127.0.0.1", 0  # ephemeral
            cutoff, backend = 3.0, "xla"
            max_batch_frames, max_wait_ms = 256, 5.0

        srv = make_server(A)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield srv
        srv.shutdown()
        srv.stream.close()

    def test_roundtrip_and_stats(self, server, scorer, rng):
        from fastdnn_tpu.cli.serve import ScoreClient

        host, port = server.server_address[:2]
        c = ScoreClient(host, port)
        u = rng.standard_normal((9, scorer.input_dim)).astype(np.float32)
        got = c.score(u)
        np.testing.assert_allclose(got, scorer.score(u), atol=1e-6)
        masks = (rng.random((9, scorer.output_dim)) < 0.4).astype(np.uint8)
        got_m = c.score(u, masks)
        np.testing.assert_allclose(got_m, scorer.score_masked(u, masks), atol=1e-6)
        stats = c.stats()
        assert stats["frames"] >= 18
        # model dims are discoverable on the wire (clients size mask
        # payloads from output_dim instead of out-of-band knowledge)
        assert stats["input_dim"] == scorer.input_dim
        assert stats["output_dim"] == scorer.output_dim
        c.close()

    def test_masked_dispatch_pipelines_both_strategies(self, small_net, rng):
        """VERDICT r1 #7: masked dispatch must return the IN-FLIGHT device
        array (tuple form) on both the dense and the gathered branch, so
        masked streams keep double-buffering — the gathered branch used to
        materialize synchronously on the worker's critical path."""
        from fastdnn_tpu.engine.stream import StreamingScorer

        qnet = quantize_net(small_net)
        frames = rng.standard_normal((4, 432)).astype(np.float32)
        masks = (rng.random((4, 400)) < 0.3).astype(np.uint8)
        for mode in ("auto", "gathered"):
            sc = Scorer(
                qnet,
                EngineConfig(backend="xla", lazy_mode=mode, lazy_capacity=1.0),
            )
            with StreamingScorer(sc, max_batch_frames=64) as ss:
                out = ss._dispatch_masked(frames, masks)
                assert isinstance(out, tuple), f"{mode} dispatch materialized"
                dev, n = out
                assert not isinstance(dev, np.ndarray)  # still on device
                assert n == 4
                got = ss._scorer._finish(dev, n)
            want = sc.score_masked(frames, masks)
            np.testing.assert_allclose(got, want, atol=2e-6)

    def test_masked_streaming_block_sparse(self, small_net, rng):
        """StreamingScorer over a block-sparse Scorer (the --lazy-mode
        block_sparse serving path): cross-utterance masked batching must
        resolve per-utterance results identical to direct dense scoring."""
        from fastdnn_tpu.engine.stream import StreamingScorer

        qnet = quantize_net(small_net)
        sc_bs = Scorer(
            qnet,
            EngineConfig(
                backend="pallas", interpret=True, lazy_mode="block_sparse"
            ),
        )
        oracle = Scorer(qnet, EngineConfig(backend="xla"))
        utts = rand_utts(rng, 3, 432)
        masks = [
            (rng.random((u.shape[0], 400)) < 0.3).astype(np.uint8) for u in utts
        ]
        with StreamingScorer(sc_bs, max_batch_frames=256) as ss:
            futs = [ss.submit(u, m) for u, m in zip(utts, masks)]
            got = [f.result(120) for f in futs]
        for g, u, m in zip(got, utts, masks):
            np.testing.assert_allclose(
                g, oracle.score_masked(u, m), atol=3e-5
            )

    def test_oversized_dim_rejected_before_payload(self, server, scorer):
        """A request declaring dim > the model's input width used to be
        accepted and desynchronize masked streams; it must error cleanly."""
        from fastdnn_tpu.cli.serve import ScoreClient

        host, port = server.server_address[:2]
        c = ScoreClient(host, port)
        with pytest.raises(RuntimeError, match="bad frame count/dim"):
            c.score(np.zeros((2, scorer.input_dim + 64), np.float32))
        c.close()

    def test_concurrent_clients(self, server, scorer, rng):
        from fastdnn_tpu.cli.serve import ScoreClient

        host, port = server.server_address[:2]
        utts = rand_utts(rng, 16, scorer.input_dim)
        results = [None] * len(utts)

        def worker(ids):
            c = ScoreClient(host, port)
            for i in ids:
                results[i] = c.score(utts[i])
            c.close()

        threads = [
            threading.Thread(target=worker, args=(range(i * 4, (i + 1) * 4),))
            for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for u, r in zip(utts, results):
            np.testing.assert_allclose(r, scorer.score(u), atol=1e-6)

    def test_bad_magic(self, server):
        import socket
        import struct

        host, port = server.server_address[:2]
        s = socket.create_connection((host, port))
        s.sendall(b"XXXX\x01")
        status = s.recv(1)[0]
        assert status == 1
        (ln,) = struct.unpack("<I", s.recv(4))
        assert b"magic" in s.recv(ln)
        s.close()


def test_serve_protocol_garbage_fuzz(small_net, tmp_path_factory, rng):
    """Random garbage byte streams against the TCP handler: the server must
    answer with a clean error or drop the connection — never wedge a worker
    thread or crash — and stay fully usable for real clients afterwards."""
    import socket
    import threading

    from fastdnn_tpu.cli.serve import MAGIC, ScoreClient, ScoreServer
    from fastdnn_tpu.engine.stream import StreamingScorer

    scorer = Scorer(quantize_net(small_net), EngineConfig(backend="xla"))
    stream = StreamingScorer(scorer, max_batch_frames=128)
    server = ScoreServer(("127.0.0.1", 0), stream)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        host, port = server.server_address[:2]
        for trial in range(25):
            blob = rng.bytes(int(rng.integers(1, 200)))
            if trial % 3 == 0:
                blob = MAGIC + blob  # valid magic, garbage op/dims/payload
            s = socket.create_connection((host, port), timeout=10)
            s.settimeout(5)
            try:
                s.sendall(blob)
                s.shutdown(socket.SHUT_WR)  # half-close: header reads must bail
                while s.recv(4096):
                    pass
            except OSError:
                pass  # reset by the server is an acceptable outcome
            finally:
                s.close()
        # server still healthy for a real client
        c = ScoreClient(host, port)
        u = rng.standard_normal((3, scorer.input_dim)).astype(np.float32)
        np.testing.assert_allclose(c.score(u), scorer.score(u), atol=1e-6)
        c.close()
    finally:
        server.shutdown()
        stream.close()

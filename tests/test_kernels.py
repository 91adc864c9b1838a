"""Pallas kernel tests (interpreter mode on CPU).

The XLA ops (fastdnn_tpu/ops/matmul.py) are the oracle: integer matmul is
exact everywhere, so the fused kernels must match bit-for-bit on int8
outputs and to f32 roundoff on logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastdnn_tpu.ops import matmul as xops
from fastdnn_tpu.ops import pallas_kernels as pk


def rand_layer(rng, b, k, n):
    x = rng.integers(-128, 128, (b, k)).astype(np.int8)
    w = rng.integers(-128, 128, (k, n)).astype(np.int8)
    cs = 128 * w.astype(np.int32).sum(axis=0)
    inv = np.float32(1.0 / (42 * 255))
    bias = rng.standard_normal(n).astype(np.float32)
    return (jnp.asarray(x), jnp.asarray(w), jnp.asarray(cs), jnp.asarray(inv), jnp.asarray(bias))


@pytest.mark.parametrize("b,k,n", [(128, 256, 384), (256, 128, 128), (384, 512, 640)])
def test_fused_hidden_layer_matches_xla(rng, b, k, n):
    args = rand_layer(rng, b, k, n)
    ours = pk.fused_hidden_layer(*args, interpret=True)
    # the oracle must run JITTED, like the engine does: an eager evaluation
    # compiles each op separately and (under --xla_allow_excess_precision)
    # can round `lin` differently by 1 ulp, flipping a sigmoid count when a
    # value lands within ulps of a 0.01-resolution table boundary — observed
    # once per ~250k elements.  The invariant is pallas == jitted XLA.
    ref = jax.jit(xops.hidden_layer_step)(*args)
    assert ours.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


@pytest.mark.parametrize("b,k,n", [(128, 256, 384), (384, 512, 640)])
def test_output_logits_matches_xla(rng, b, k, n):
    args = rand_layer(rng, b, k, n)
    ours = pk.output_layer_logits(*args, interpret=True)
    ref = xops.output_logits(*args)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_block_fallback_nondivisible(rng):
    """Shapes that don't divide the default blocks must still work via the
    halving fallback (b=384 vs block 256, n=640 vs block 512)."""
    args = rand_layer(rng, 384, 128, 640)
    ours = pk.fused_hidden_layer(*args, interpret=True)
    ref = jax.jit(xops.hidden_layer_step)(*args)  # jitted oracle, like the engine
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_unpadded_shapes_rejected(rng):
    x = jnp.zeros((100, 128), jnp.int8)  # 100 not a multiple of 32/128
    w = jnp.zeros((128, 128), jnp.int8)
    cs = jnp.zeros(128, jnp.int32)
    bias = jnp.zeros(128, jnp.float32)
    with pytest.raises(ValueError):
        pk.fused_hidden_layer(x, w, cs, jnp.float32(1.0), bias, interpret=True)


def test_fused_hidden_stack_matches_sequential(rng):
    """All-layers-in-one kernel (small-batch latency path) must be bit-exact
    with the per-layer kernels / XLA steps."""
    L, b, h = 4, 384, 256
    x = jnp.asarray(rng.integers(-128, 128, (b, h)).astype(np.int8))
    ws = rng.integers(-128, 128, (L, h, h)).astype(np.int8)
    cs = (128 * ws.astype(np.int64).sum(axis=1)).astype(np.int32)
    inv = (1.0 / (np.arange(1, L + 1) * 255)).astype(np.float32)
    bias = rng.standard_normal((L, h)).astype(np.float32)
    ours = pk.fused_hidden_stack(
        x, jnp.asarray(ws), jnp.asarray(cs), jnp.asarray(inv), jnp.asarray(bias),
        interpret=True,
    )
    step = jax.jit(xops.hidden_layer_step)  # jitted oracle, like the engine
    ref = x
    for l in range(L):
        ref = step(
            ref, jnp.asarray(ws[l]), jnp.asarray(cs[l]), jnp.float32(inv[l]),
            jnp.asarray(bias[l]),
        )
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_fused_hidden_stack_rejects_nonsquare(rng):
    with pytest.raises(ValueError, match="square"):
        pk.fused_hidden_stack(
            jnp.zeros((128, 256), jnp.int8),
            jnp.zeros((2, 256, 384), jnp.int8),
            jnp.zeros((2, 384), jnp.int32),
            jnp.zeros(2, jnp.float32),
            jnp.zeros((2, 384), jnp.float32),
            interpret=True,
        )


class TestFusedPosteriors:
    """output_layer_posteriors = matmul + stats + fused normalize."""

    def test_matches_xla_softmax(self, rng):
        args = rand_layer(rng, 128, 256, 640)
        out_dim = 600  # pretend last 40 columns are MXU padding
        ours = pk.output_layer_posteriors(*args, out_dim=out_dim, interpret=True)
        logits = xops.output_logits(*args)[:, :out_dim]
        ref = jax.nn.softmax(logits, axis=-1)
        assert ours.shape == (128, out_dim)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("semantics", ["reference", "active_only"])
    def test_masked_matches_xla(self, rng, semantics):
        args = rand_layer(rng, 128, 256, 640)
        out_dim = 600
        masks = (rng.random((128, 640)) < 0.4).astype(np.uint8)
        masks[:, out_dim:] = 0
        ours = pk.output_layer_posteriors(
            *args, jnp.asarray(masks), out_dim=out_dim, semantics=semantics, interpret=True
        )
        logits = xops.output_logits(*args)[:, :out_dim]
        mask_bool = jnp.asarray(masks[:, :out_dim] != 0)
        if semantics == "reference":
            ref = xops.masked_softmax_reference(logits, mask_bool)
        else:
            ref = xops.masked_softmax_active_only(logits, mask_bool)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_multiblock_stats_sweep(self, rng):
        """Node dim spanning several blocks exercises the online max/sum."""
        args = rand_layer(rng, 64, 128, 1536)
        ours = pk.output_layer_posteriors(
            *args, out_dim=1536, block_nodes=256, interpret=True
        )
        ref = jax.nn.softmax(xops.output_logits(*args), axis=-1)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_fast_bf16_mode(self, rng):
        """fast=True stores logits/posteriors as bf16; stats stay f32, so
        the result matches f32 softmax to bf16 rounding (~0.4% relative)."""
        args = rand_layer(rng, 128, 256, 640)
        fast = pk.output_layer_posteriors(*args, out_dim=600, interpret=True, fast=True)
        assert fast.dtype == jnp.bfloat16
        full = pk.output_layer_posteriors(*args, out_dim=600, interpret=True)
        np.testing.assert_allclose(
            np.asarray(fast, np.float32), np.asarray(full), rtol=2e-2, atol=1e-4
        )
        # probabilities still normalized
        np.testing.assert_allclose(
            np.asarray(fast, np.float32).sum(-1), 1.0, rtol=1e-2
        )

    def test_multiblock_frames_and_nodes(self, rng):
        """Several frame blocks x several node sweeps: stats for each frame
        block accumulate in the persistent scratch across non-adjacent grid
        steps and are emitted only on the last node sweep (the conditional
        output index map)."""
        args = rand_layer(rng, 512, 128, 1024)
        ours = pk.output_layer_posteriors(
            *args, out_dim=1000, block_frames=128, block_nodes=256, interpret=True
        )
        ref = jax.nn.softmax(xops.output_logits(*args)[:, :1000], axis=-1)
        assert ours.shape == (512, 1000)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_end_to_end_pallas_scorer_interpret(small_net, features_16khz):
    """Whole engine on the pallas backend (interpret mode) vs XLA backend."""
    from fastdnn_tpu.config import EngineConfig
    from fastdnn_tpu.engine.scorer import Scorer
    from fastdnn_tpu.quant.quantize import quantize_net

    qnet = quantize_net(small_net)
    sc_x = Scorer(qnet, EngineConfig(backend="xla"))
    sc_p = Scorer(qnet, EngineConfig(backend="pallas", interpret=True))
    frames = features_16khz[:32]
    out_x = sc_x.score(frames)
    out_p = sc_p.score(frames)
    assert out_p.shape == (32, sc_x.output_dim)
    # softmax reduction order differs between the backends (see test_fuzz)
    np.testing.assert_allclose(out_p, out_x, atol=3e-5)
    # masked path too
    masks = (np.arange(sc_x.output_dim) % 3 == 0).astype(np.uint8)
    masks = np.tile(masks, (32, 1))
    np.testing.assert_allclose(
        sc_p.score_masked(frames, masks), sc_x.score_masked(frames, masks), atol=3e-5
    )


def test_fused_softmax_chunks_large_batches(rng, monkeypatch):
    """Batches beyond the stats-scratch cap run as row-chunked fused calls;
    softmax is per-row so the result equals the unchunked plain path."""
    import jax.numpy as jnp

    import fastdnn_tpu.engine.scorer as sc
    from fastdnn_tpu.models.feedforward import random_net
    from fastdnn_tpu.quant.quantize import pad_qnet_for_tpu, quantize_net

    monkeypatch.setattr(sc, "MAX_FUSED_SOFTMAX_FRAMES", 128)
    monkeypatch.setattr(sc, "RESIDENT_OUTPUT_MAX_BYTES", 0)  # force stats path
    net = random_net(jax.random.PRNGKey(0), 40, [64, 64], 100)
    qnet = pad_qnet_for_tpu(quantize_net(net))
    x = jnp.asarray(rng.standard_normal((384, 40)).astype(np.float32))
    xp = jnp.pad(x, ((0, 0), (0, qnet.input_dim - 40)))
    kw = dict(backend="pallas", interpret=True, out_dim=100)
    fused = sc.score_fn(qnet, xp, fused_softmax=True, **kw)
    plain = sc.score_fn(qnet, xp, fused_softmax=False, **kw)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain), atol=1e-6)
    # masked path chunks too
    masks = jnp.asarray((rng.random((384, 100)) < 0.4).astype(np.uint8))
    mf = sc.score_masked_fn(qnet, xp, masks, fused_softmax=True, **kw)
    mp = sc.score_masked_fn(qnet, xp, masks, fused_softmax=False, **kw)
    np.testing.assert_allclose(np.asarray(mf), np.asarray(mp), atol=1e-6)


class TestResidentPosteriors:
    """output_layer_posteriors_resident: whole weights in VMEM, softmax in
    one pass, output written at the true (unaligned) senone count."""

    def test_matches_stats_kernel_and_xla(self, rng):
        args = rand_layer(rng, 256, 256, 640)
        res = pk.output_layer_posteriors_resident(*args, out_dim=600, interpret=True)
        stats = pk.output_layer_posteriors(*args, out_dim=600, interpret=True)
        ref = jax.nn.softmax(xops.output_logits(*args)[:, :600], axis=-1)
        assert res.shape == (256, 600)
        np.testing.assert_allclose(np.asarray(res), np.asarray(ref), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(res), np.asarray(stats), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("semantics", ["reference", "active_only"])
    def test_masked(self, rng, semantics):
        args = rand_layer(rng, 128, 256, 640)
        masks = (rng.random((128, 640)) < 0.4).astype(np.uint8)
        masks[:, 600:] = 0
        ours = pk.output_layer_posteriors_resident(
            *args, jnp.asarray(masks), out_dim=600, semantics=semantics, interpret=True
        )
        logits = xops.output_logits(*args)[:, :600]
        mb = jnp.asarray(masks[:, :600] != 0)
        ref = (
            xops.masked_softmax_reference(logits, mb)
            if semantics == "reference"
            else xops.masked_softmax_active_only(logits, mb)
        )
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_fast_bf16(self, rng):
        args = rand_layer(rng, 128, 256, 640)
        fast = pk.output_layer_posteriors_resident(
            *args, out_dim=600, interpret=True, fast=True
        )
        assert fast.dtype == jnp.bfloat16
        full = pk.output_layer_posteriors_resident(*args, out_dim=600, interpret=True)
        np.testing.assert_allclose(
            np.asarray(fast, np.float32), np.asarray(full), rtol=2e-2, atol=1e-3
        )


class TestBlockSparseMasked:
    """Block-sparse lazy kernels: all-inactive (frame x node) tiles are
    skipped; posteriors must equal the dense masked path to softmax
    reduction-order roundoff, for both semantics, including fully-masked
    rows, whole skipped node columns, and MXU padding columns."""

    def _mk(self, rng, b=96, k=128, n=512, out=450, density=0.08):
        args = rand_layer(rng, b, k, n)
        # clustered masks: each frame block activates one narrow id band,
        # so many (frame, node) tiles are genuinely all-zero
        masks = np.zeros((b, n), np.uint8)
        for blk in range(b // 32):
            lo = int(rng.integers(0, out - 40))
            rows = slice(blk * 32, (blk + 1) * 32)
            band = (rng.random((32, 40)) < density * 10).astype(np.uint8)
            masks[rows, lo : lo + 40] = band
        masks[1] = 0  # fully-masked row
        masks[:, out:] = 0  # padding columns never active
        return args, jnp.asarray(masks), out

    def _oracle(self, args, masks, out, semantics):
        x, w, cs, inv, bias = args
        logits = xops.output_logits(x, w, cs, inv, bias)[:, :out]
        mb = np.asarray(masks)[:, :out] != 0
        if semantics == "reference":
            return np.asarray(xops.masked_softmax_reference(logits, mb))
        return np.asarray(xops.masked_softmax_active_only(logits, mb))

    @pytest.mark.parametrize("semantics", ["reference", "active_only"])
    def test_stats_variant_matches_dense(self, rng, semantics):
        args, masks, out = self._mk(rng)
        got = pk.output_layer_posteriors_block_sparse(
            *args, masks, out_dim=out, semantics=semantics,
            block_frames=32, block_nodes=128, interpret=True,
        )
        want = self._oracle(args, masks, out, semantics)
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)

    @pytest.mark.parametrize("semantics", ["reference", "active_only"])
    def test_resident_variant_matches_dense(self, rng, semantics):
        args, masks, out = self._mk(rng)
        got = pk.output_layer_posteriors_resident_block_sparse(
            *args, masks, out_dim=out, semantics=semantics,
            block_frames=32, block_nodes=128, interpret=True,
        )
        want = self._oracle(args, masks, out, semantics)
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)

    def test_all_tiles_active_degenerates_to_dense(self, rng):
        args = rand_layer(rng, 64, 128, 256)
        masks = jnp.ones((64, 256), jnp.uint8)
        got = pk.output_layer_posteriors_block_sparse(
            *args, masks, out_dim=250, block_frames=32, block_nodes=128,
            interpret=True,
        )
        want = self._oracle(args, masks, 250, "reference")
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)

    def test_everything_inactive_reference_is_uniform(self, rng):
        """All masks zero: reference semantics = softmax over all-zero
        logits = uniform over real senones (the dense path's behavior)."""
        args = rand_layer(rng, 32, 128, 256)
        masks = jnp.zeros((32, 256), jnp.uint8)
        for fn in (pk.output_layer_posteriors_block_sparse,
                   pk.output_layer_posteriors_resident_block_sparse):
            got = np.asarray(fn(
                *args, masks, out_dim=200, block_frames=32, block_nodes=128,
                interpret=True,
            ))
            np.testing.assert_allclose(got, np.full((32, 200), 1 / 200.0),
                                       rtol=1e-5)


class TestClusterPermutation:
    def test_permuted_net_posteriors_are_permuted(self, rng):
        from fastdnn_tpu.engine.cluster import (
            inverse_permutation,
            mask_cluster_permutation,
            permute_output_layer,
        )
        from fastdnn_tpu.models.feedforward import random_net
        from fastdnn_tpu.quant.quantize import pad_qnet_for_tpu, quantize_net

        net = random_net(jax.random.PRNGKey(0), 40, [64], 200)
        qnet = pad_qnet_for_tpu(quantize_net(net), out_lanes=128)
        frames = jnp.asarray(rng.standard_normal((16, 40)), jnp.float32)
        frames = jnp.pad(frames, ((0, 0), (0, qnet.input_dim - 40)))

        masks = (rng.random((50, 200)) < 0.1).astype(np.uint8)
        perm = mask_cluster_permutation(masks)
        qp = permute_output_layer(qnet, perm)

        from fastdnn_tpu.engine.scorer import score_fn

        p0 = np.asarray(score_fn(qnet, frames, backend="xla"))
        p1 = np.asarray(score_fn(qp, frames, backend="xla"))
        np.testing.assert_allclose(p1, p0[:, perm], atol=1e-6)
        inv = inverse_permutation(perm)
        np.testing.assert_allclose(p1[:, inv], p0, atol=1e-6)

    def test_clustering_raises_zero_tile_fraction(self, rng):
        """On temporally-coherent masks the permutation must strictly
        increase the all-zero (32 x 128) tile fraction vs raw ids."""
        from fastdnn_tpu.engine.cluster import mask_cluster_permutation

        frames, out = 256, 1024
        masks = np.zeros((frames, out), np.uint8)
        ids = np.arange(out)
        np.random.default_rng(3).shuffle(ids)  # scattered raw senone ids
        for t in range(frames):  # a "beam" sweeping through word groups
            lo = (t * 2) % (out - 64)
            masks[t, ids[lo : lo + 64]] = 1

        def zero_frac(m):
            blocks = m.reshape(frames // 32, 32, out // 128, 128)
            return float((~blocks.any(axis=(1, 3))).mean())

        raw = zero_frac(masks)
        perm = mask_cluster_permutation(masks)
        clustered = zero_frac(masks[:, perm])
        assert clustered > raw + 0.3, (raw, clustered)

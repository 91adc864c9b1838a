"""Float model tests: pytree plumbing, align/extend surgery, forward oracle.

The float forward pass is validated against an independent numpy
implementation of the reference's naive Java pass
(/root/reference/src/java/suskun/nn/FeedForwardNetwork.java:121-148,360-414).
"""

import jax
import jax.numpy as jnp
import numpy as np

from fastdnn_tpu.formats.binary import RawLayer, RawNetwork
from fastdnn_tpu.models import feedforward as ff


def naive_forward(raw: RawNetwork, frames: np.ndarray) -> np.ndarray:
    """Independent float64 oracle mirroring the reference Java semantics."""
    x = (frames.astype(np.float64) + raw.shift) * raw.scale
    for i, layer in enumerate(raw.layers):
        x = x @ layer.weights.T.astype(np.float64) + layer.bias
        if i < len(raw.layers) - 1:
            x = 1.0 / (1.0 + np.exp(-x))
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def make_raw(rng, dims=(6, 8, 8, 5)) -> RawNetwork:
    layers = [
        RawLayer(
            rng.standard_normal((dims[i + 1], dims[i])).astype(np.float32) * 0.5,
            rng.standard_normal(dims[i + 1]).astype(np.float32) * 0.1,
        )
        for i in range(len(dims) - 1)
    ]
    return RawNetwork(
        layers,
        rng.standard_normal(dims[0]).astype(np.float32),
        rng.uniform(0.5, 1.5, dims[0]).astype(np.float32),
    )


class TestPytree:
    def test_from_to_raw_roundtrip(self, rng):
        raw = make_raw(rng)
        net = ff.from_raw(raw)
        assert net.input_dim == 6 and net.output_dim == 5 and net.layer_count == 3
        back = ff.to_raw(net)
        for a, b in zip(raw.layers, back.layers):
            np.testing.assert_array_equal(a.weights, b.weights)
            np.testing.assert_array_equal(a.bias, b.bias)

    def test_is_jax_pytree(self, rng):
        net = ff.from_raw(make_raw(rng))
        leaves = jax.tree_util.tree_leaves(net)
        assert len(leaves) == 3 * 2 + 2  # per-layer w,b + shift + scale
        doubled = jax.tree.map(lambda x: x * 2, net)
        np.testing.assert_allclose(doubled.scale, np.asarray(net.scale) * 2)


class TestForward:
    def test_matches_naive_oracle(self, rng):
        raw = make_raw(rng)
        net = ff.from_raw(raw)
        frames = rng.standard_normal((13, 6)).astype(np.float32)
        ours = np.asarray(ff.forward(net, jnp.asarray(frames)))
        oracle = naive_forward(raw, frames)
        np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(ours.sum(-1), 1.0, rtol=1e-5)

    def test_fused_transform_equivalence(self, rng):
        raw = make_raw(rng)
        net = ff.from_raw(raw)
        fused = ff.fuse_transform(net)
        frames = jnp.asarray(rng.standard_normal((7, 6)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(ff.forward(net, frames)),
            np.asarray(ff.forward(fused, frames)),
            rtol=1e-4,
            atol=1e-6,
        )
        np.testing.assert_array_equal(np.asarray(fused.shift), 0.0)
        np.testing.assert_array_equal(np.asarray(fused.scale), 1.0)

    def test_jit_forward(self, rng):
        net = ff.from_raw(make_raw(rng))
        frames = jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32))
        jitted = jax.jit(ff.forward)(net, frames)
        eager = ff.forward(net, frames)
        np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager), rtol=1e-6)


class TestAlign:
    def test_align_shapes(self, rng):
        net = ff.from_raw(make_raw(rng, dims=(6, 9, 9, 5)))
        aligned = ff.align(net, 4, 16)
        assert aligned.input_dim == 8  # 6 -> x4
        assert aligned.weights[0].shape == (8, 16)  # 9 -> x16
        assert aligned.weights[1].shape == (16, 16)
        assert aligned.weights[2].shape == (16, 5)  # output: input side only
        assert aligned.shift.shape == (8,)

    def test_align_preserves_outputs(self, rng):
        """Zero padding must not change posteriors on original dims."""
        raw = make_raw(rng, dims=(6, 9, 9, 5))
        net = ff.from_raw(raw)
        aligned = ff.align(net, 4, 16)
        frames = rng.standard_normal((11, 6)).astype(np.float32)
        padded = np.pad(frames, ((0, 0), (0, 2)))
        out = np.asarray(ff.forward(net, jnp.asarray(frames)))
        out_aligned = np.asarray(ff.forward(aligned, jnp.asarray(padded)))
        np.testing.assert_allclose(out, out_aligned, rtol=2e-4, atol=1e-6)

    def test_align_noop_when_aligned(self, rng):
        net = ff.from_raw(make_raw(rng, dims=(8, 16, 16, 5)))
        aligned = ff.align(net, 4, 16)
        for a, b in zip(net.weights, aligned.weights):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestExtend:
    def test_extend_shapes(self, rng):
        net = ff.from_raw(make_raw(rng, dims=(6, 8, 8, 5)))
        big = ff.extend(net, hidden_width=16, output_count=12)
        assert big.weights[0].shape == (6, 16)
        assert big.weights[1].shape == (16, 16)
        assert big.weights[2].shape == (16, 12)

    def test_extend_circular_cloning(self, rng):
        net = ff.from_raw(make_raw(rng, dims=(6, 8, 8, 5)))
        big = ff.extend(net, 16, 12)
        w0, w0_big = np.asarray(net.weights[0]), np.asarray(big.weights[0])
        # columns (nodes) cloned circularly
        np.testing.assert_array_equal(w0_big[:, 8:16], w0)
        b1, b1_big = np.asarray(net.biases[1]), np.asarray(big.biases[1])
        np.testing.assert_array_equal(b1_big[8:16], b1)
        # hidden layer cloned circularly in both dims
        w1, w1_big = np.asarray(net.weights[1]), np.asarray(big.weights[1])
        np.testing.assert_array_equal(w1_big[8:16, 8:16], w1)

    def test_extend_output_layer_zero_padded(self, rng):
        """The reference zero-pads (aligns) the output layer on extend
        (FeedForwardNetwork.java:65) rather than cloning — synthetic senones
        have zero weights/bias."""
        net = ff.from_raw(make_raw(rng, dims=(6, 8, 8, 5)))
        big = ff.extend(net, 16, 12)
        w_out = np.asarray(big.weights[2])
        np.testing.assert_array_equal(w_out[8:, :], 0.0)
        np.testing.assert_array_equal(w_out[:8, 5:], 0.0)
        np.testing.assert_array_equal(np.asarray(big.biases[2])[5:], 0.0)

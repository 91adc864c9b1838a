"""Multi-device sharding tests on the forced 8-device CPU mesh.

Validates that data-parallel frames + tensor-parallel output layer produce
posteriors identical to the single-device engine, for both the GSPMD path
and the explicit shard_map/psum path (SURVEY.md §2 new-components table).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastdnn_tpu.config import EngineConfig
from fastdnn_tpu.engine.scorer import Scorer
from fastdnn_tpu.models.feedforward import random_net
from fastdnn_tpu.parallel import mesh as pmesh
from fastdnn_tpu.parallel.sharded import make_gspmd_scorer, score_shard_map
from fastdnn_tpu.quant.quantize import pad_qnet_for_tpu, quantize_net


@pytest.fixture(scope="module")
def qnet():
    net = random_net(jax.random.PRNGKey(7), 432, [256, 256], 512)
    return quantize_net(net)


@pytest.fixture(scope="module")
def frames(features_16khz):
    return jnp.asarray(features_16khz[:64])  # 64 divides the 8-dev data axis


def single_device_reference(qnet, frames, masks=None):
    sc = Scorer(qnet, EngineConfig(backend="xla"))
    if masks is None:
        return sc.score(np.asarray(frames))
    return sc.score_masked(np.asarray(frames), np.asarray(masks))


class TestMesh:
    def test_make_mesh_shapes(self):
        assert len(jax.devices()) == 8
        m = pmesh.make_mesh()
        assert m.shape == {"data": 8, "model": 1}
        m2 = pmesh.make_mesh(model=2)
        assert m2.shape == {"data": 4, "model": 2}
        with pytest.raises(ValueError):
            pmesh.make_mesh(model=3)
        with pytest.raises(ValueError):
            pmesh.make_mesh(data=3, model=2)

    def test_shard_qnet_layout(self, qnet):
        m = pmesh.make_mesh(data=4, model=2)
        sharded = pmesh.shard_qnet(qnet, m)
        # output layer node dim split over 2 model shards
        out_w = sharded.weights[-1]
        assert out_w.sharding.spec == jax.sharding.PartitionSpec(None, "model")
        # hidden layers replicated
        assert sharded.weights[0].sharding.is_fully_replicated


class TestGSPMD:
    @pytest.mark.parametrize("data,model", [(8, 1), (4, 2), (2, 4), (1, 8)])
    def test_score_matches_single_device(self, qnet, frames, data, model):
        m = pmesh.make_mesh(data=data, model=model)
        score, _ = make_gspmd_scorer(m)
        out = np.asarray(score(qnet, frames))
        ref = single_device_reference(qnet, frames)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_score_masked_matches(self, qnet, frames, rng):
        m = pmesh.make_mesh(data=4, model=2)
        _, score_masked = make_gspmd_scorer(m)
        masks = (rng.random((64, qnet.output_dim)) < 0.4).astype(np.uint8)
        out = np.asarray(score_masked(qnet, frames, jnp.asarray(masks)))
        ref = single_device_reference(qnet, frames, masks)
        np.testing.assert_allclose(out, ref, atol=2e-5)


class TestShardMap:
    @pytest.mark.parametrize("data,model", [(4, 2), (2, 4)])
    def test_explicit_collectives_match(self, qnet, frames, data, model):
        m = pmesh.make_mesh(data=data, model=model)
        out = np.asarray(score_shard_map(qnet, frames, m))
        ref = Scorer(qnet, EngineConfig(backend="xla")).score(np.asarray(frames))
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_masked_reference_semantics(self, qnet, frames, rng):
        m = pmesh.make_mesh(data=2, model=4)
        masks = (rng.random((64, qnet.output_dim)) < 0.4).astype(np.uint8)
        out = np.asarray(
            score_shard_map(qnet, frames, m, masks=jnp.asarray(masks))
        )
        ref = single_device_reference(qnet, frames, masks)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_masked_active_only_semantics(self, qnet, frames, rng):
        m = pmesh.make_mesh(data=2, model=4)
        masks = (rng.random((64, qnet.output_dim)) < 0.4).astype(np.uint8)
        out = np.asarray(
            score_shard_map(
                qnet, frames, m, masks=jnp.asarray(masks), semantics="active_only"
            )
        )
        sc = Scorer(qnet, EngineConfig(backend="xla", lazy_semantics="active_only"))
        ref = sc.score_masked(np.asarray(frames), masks)
        np.testing.assert_allclose(out, ref, atol=2e-5)
        assert np.all(out[masks == 0] == 0.0)


def test_shard_map_active_only_fully_masked_row_is_zero(qnet, frames):
    """A frame whose mask is all-zero must yield an all-zero posterior row
    (not NaN) under active_only semantics — the shard_map path used to
    divide by a zero psum (ADVICE r1)."""
    masks = np.ones((64, qnet.output_dim), np.uint8)
    masks[3] = 0
    masks[17] = 0
    m = pmesh.make_mesh(data=2, model=4)
    out = np.asarray(
        score_shard_map(qnet, frames, m, masks=jnp.asarray(masks), semantics="active_only")
    )
    assert not np.isnan(out).any()
    np.testing.assert_array_equal(out[3], 0.0)
    np.testing.assert_array_equal(out[17], 0.0)


def test_shard_map_derives_out_dim_from_padded_net(small_net):
    """pad_qnet_for_tpu stamps the true senone count on the net, so the
    sharded path must exclude padding columns from the softmax WITHOUT the
    caller passing out_dim (ADVICE r1: silent divergence by default)."""
    from fastdnn_tpu.parallel.mesh import make_mesh
    from fastdnn_tpu.quant.quantize import pad_qnet_for_tpu, quantize_net

    qnet = quantize_net(small_net)  # 400 outputs
    padded = pad_qnet_for_tpu(qnet, out_lanes=256)  # -> 512
    assert padded.output_dim == 400 and padded.padded_output_dim == 512
    mesh = make_mesh(model=2)
    frames = np.random.default_rng(0).standard_normal((16, qnet.input_dim)).astype(np.float32)
    fp = jnp.pad(jnp.asarray(frames), ((0, 0), (0, padded.input_dim - qnet.input_dim)))
    out = np.asarray(score_shard_map(padded, fp, mesh))  # no out_dim passed
    expected = Scorer(qnet, EngineConfig(backend="xla")).score(frames)
    np.testing.assert_array_equal(out[:, 400:], 0.0)
    np.testing.assert_allclose(out[:, :400], expected, atol=1e-5)


def test_shard_map_excludes_mxu_padding_from_softmax(small_net):
    """With a pad_qnet_for_tpu-padded net (senone count not divisible by
    the model axis), score_shard_map must keep the zero-logit padding
    columns out of the softmax denominator and zero them in the output."""
    import jax
    import numpy as np

    from fastdnn_tpu.config import EngineConfig
    from fastdnn_tpu.engine.scorer import Scorer
    from fastdnn_tpu.parallel.mesh import make_mesh
    from fastdnn_tpu.parallel.sharded import score_shard_map
    from fastdnn_tpu.quant.quantize import pad_qnet_for_tpu, quantize_net

    qnet = quantize_net(small_net)  # 400 outputs
    padded = pad_qnet_for_tpu(qnet, out_lanes=256)  # -> 512, 112 pad columns
    mesh = make_mesh(model=2)
    frames = np.random.default_rng(0).standard_normal((16, qnet.input_dim)).astype(np.float32)
    fp = jax.numpy.pad(
        jax.numpy.asarray(frames), ((0, 0), (0, padded.input_dim - qnet.input_dim))
    )
    out = np.asarray(score_shard_map(padded, fp, mesh, out_dim=qnet.output_dim))
    expected = Scorer(qnet, EngineConfig(backend="xla")).score(frames)
    np.testing.assert_array_equal(out[:, qnet.output_dim :], 0.0)
    np.testing.assert_allclose(out[:, : qnet.output_dim], expected, atol=1e-5)

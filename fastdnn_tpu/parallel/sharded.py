"""Sharded scoring: data-parallel frames x tensor-parallel output layer.

Two equivalent implementations, both returning posteriors identical to the
single-device engine:

  * `score_gspmd` — `jax.jit` with NamedShardings; XLA's SPMD partitioner
    inserts the collectives.  The production path: composes with any backend
    and lets XLA fuse.
  * `score_shard_map` — explicit `shard_map` with hand-placed collectives
    (pmax/psum over the model axis for the globally-correct softmax).  The
    didactic/verification path, and the place where custom Pallas
    collectives would slot in.

Softmax across a node-sharded output layer needs a global max and a global
sum (SURVEY.md §5 "Multi-host numerics"): with logits z sharded over
MODEL_AXIS,

    m = pmax(max(z_local));  s = psum(sum(exp(z_local - m)))
    softmax = exp(z_local - m) / s

which is exact (not approximate) across shardings.  Masked (lazy) semantics
compose the same way because the reference's zero-logit convention
(/root/reference/src/cpp/dnn.cc:369-389) is just a different z.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 public API, else experimental
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..engine.scorer import hidden_forward, output_logits
from ..quant.quantize import QuantizedNet
from .mesh import DATA_AXIS, MODEL_AXIS, frames_sharding, qnet_shardings


# ---------------------------------------------------------------------------
# GSPMD path
# ---------------------------------------------------------------------------

def make_gspmd_scorer(
    mesh: Mesh,
    *,
    backend: str = "xla",
    interpret: bool = False,
    out_dim: Optional[int] = None,
    semantics: str = "reference",
):
    """Returns jitted (score, score_masked) over the mesh.

    The returned callables take (qnet, frames[, masks]) already or not yet
    device_put — jit moves them per the declared shardings either way.
    """
    from ..engine.scorer import score_fn, score_masked_fn

    fs = frames_sharding(mesh)
    out_sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    mask_sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    # jit executables are cached per net STRUCTURE (the in_shardings pytree
    # depends on the layer count): building a fresh jax.jit wrapper per call
    # would retrace + recompile every invocation.
    _cache: dict = {}

    def _jitted(kind: str, qnet: QuantizedNet):
        key = (kind, len(qnet.weights))
        if key not in _cache:
            net_sh = qnet_shardings(mesh)(qnet)
            if kind == "score":
                _cache[key] = jax.jit(
                    functools.partial(
                        score_fn, backend=backend, interpret=interpret, out_dim=out_dim
                    ),
                    in_shardings=(net_sh, fs),
                    out_shardings=out_sharding,
                )
            else:
                _cache[key] = jax.jit(
                    functools.partial(
                        score_masked_fn,
                        backend=backend,
                        interpret=interpret,
                        out_dim=out_dim,
                        semantics=semantics,
                    ),
                    in_shardings=(net_sh, fs, mask_sharding),
                    out_shardings=out_sharding,
                )
        return _cache[key]

    def score(qnet, frames):
        return _jitted("score", qnet)(qnet, frames)

    def score_masked(qnet, frames, masks):
        return _jitted("masked", qnet)(qnet, frames, masks)

    return score, score_masked


# ---------------------------------------------------------------------------
# Explicit shard_map path
# ---------------------------------------------------------------------------

def _valid_cols(n_local: int, out_dim: int | None):
    """Per-shard boolean [1, n_local]: True where the global column index is
    a real senone, False on MXU padding columns (pad_qnet_for_tpu) — those
    must not join the softmax max/denominator (score_fn slices them off in
    the single-device engine; here they live on the last shard)."""
    if out_dim is None:
        return None
    shard = jax.lax.axis_index(MODEL_AXIS)
    col = shard * n_local + jax.lax.broadcasted_iota(jnp.int32, (1, n_local), 1)
    return col < out_dim


def _sharded_softmax(z_local: jax.Array, valid=None) -> jax.Array:
    """Exact softmax over an output axis sharded on MODEL_AXIS."""
    NEG = jnp.float32(-1e30)
    if valid is not None:
        z_local = jnp.where(valid, z_local, NEG)
    m_local = jnp.max(z_local, axis=-1, keepdims=True)
    m = jax.lax.pmax(m_local, MODEL_AXIS)
    e = jnp.exp(z_local - m)
    if valid is not None:
        e = jnp.where(valid, e, 0.0)
    s = jax.lax.psum(jnp.sum(e, axis=-1, keepdims=True), MODEL_AXIS)
    return e / s


#: jitted shard_map programs, keyed on everything that changes the trace
_SHARD_MAP_CACHE: dict = {}


def score_shard_map(
    qnet: QuantizedNet,
    frames: jax.Array,
    mesh: Mesh,
    *,
    masks: Optional[jax.Array] = None,
    backend: str = "xla",
    interpret: bool = False,
    semantics: str = "reference",
    out_dim: Optional[int] = None,
) -> jax.Array:
    """Explicit-collective scoring.  frames [B, in] with B divisible by the
    data axis; output dim must be divisible by the model axis (pad the net
    with pad_qnet_for_tpu(lanes=128*model) if needed, and pass the TRUE
    senone count as out_dim so padding columns stay out of the softmax).
    Returns posteriors [B, out_padded] sharded (data, model); columns at or
    beyond out_dim are exactly 0.
    """
    if out_dim is None:
        # pad_qnet_for_tpu stamps the true senone count on the net; fall
        # back to it so padded zero-logit columns never join the softmax
        # denominator by default (width == count for unpadded nets).
        out_dim = qnet.output_dim
    n_layers = len(qnet.weights)
    net_spec = QuantizedNet(
        input_w=P(),
        input_b=P(),
        weights=tuple([P()] * (n_layers - 1) + [P(None, MODEL_AXIS)]),
        colsum128=tuple([P()] * (n_layers - 1) + [P(MODEL_AXIS)]),
        biases=tuple([P()] * (n_layers - 1) + [P(MODEL_AXIS)]),
        inv_scales=tuple([P()] * n_layers),
        multipliers=tuple([P()] * n_layers),
        true_output_dim=qnet.true_output_dim,
    )
    in_specs = [net_spec, P(DATA_AXIS, None)]
    args = [qnet, frames]
    if masks is not None:
        in_specs.append(P(DATA_AXIS, MODEL_AXIS))
        args.append(masks)

    def body(net, local_frames, *rest):
        acts = hidden_forward(net, local_frames, backend, interpret)
        z = output_logits(net, acts, backend, interpret)
        valid = _valid_cols(z.shape[-1], out_dim)
        if rest:
            mask_bool = rest[0] != 0
            if valid is not None:
                mask_bool = mask_bool & valid
            if semantics == "reference":
                z = jnp.where(mask_bool, z, 0.0)
                return _sharded_softmax(z, valid)
            neg = jnp.float32(-1e30)
            zm = jnp.where(mask_bool, z, neg)
            m = jax.lax.pmax(jnp.max(zm, axis=-1, keepdims=True), MODEL_AXIS)
            e = jnp.where(mask_bool, jnp.exp(zm - m), 0.0)
            s = jax.lax.psum(jnp.sum(e, axis=-1, keepdims=True), MODEL_AXIS)
            # a fully-masked frame has s == 0; emit an all-zero row instead
            # of NaN, matching masked_softmax_active_only and the kernels
            return e / jnp.maximum(s, jnp.finfo(jnp.float32).tiny)
        return _sharded_softmax(z, valid)

    key = (
        mesh,
        n_layers,
        tuple(w.shape for w in qnet.weights),
        frames.shape,
        masks is not None,
        backend,
        interpret,
        semantics,
        out_dim,
    )
    if key not in _SHARD_MAP_CACHE:
        _SHARD_MAP_CACHE[key] = jax.jit(
            shard_map(
                body,
                mesh=mesh,
                in_specs=tuple(in_specs),
                out_specs=P(DATA_AXIS, MODEL_AXIS),
            )
        )
    return _SHARD_MAP_CACHE[key](*args)

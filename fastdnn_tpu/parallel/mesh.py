"""Device mesh construction and sharding layouts.

The reference has no distributed components at all (SURVEY.md §2, "none
exist") — its only concurrency is threads sharing one immutable model.  The
TPU-native scaling design (BASELINE.json north star) is:

  * axis "data":  utterance/frame batches are data-parallel
  * axis "model": the output layer (8000+ senones) is tensor-parallel —
    weight matrix sharded on its node dim, posteriors combined with XLA
    collectives over ICI

Hidden layers are replicated (40 MB int8 for the 7x2048 net — cheap) so the
only per-step collectives are on the output layer, where psum/all_gather
ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the given (default: all) devices.

    With `data=None`, the data axis absorbs all devices not used by `model`.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def init_multihost(coordinator_address: Optional[str] = None, **kwargs) -> None:
    """Initialize JAX's multi-host runtime (DCN-level data parallelism).

    Thin wrapper over jax.distributed.initialize so CLIs can expose it as a
    flag; a no-op when running single-process.
    """
    if coordinator_address is None and not kwargs:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)


def qnet_shardings(mesh: Mesh):
    """NamedShardings for a QuantizedNet pytree on `mesh`.

    Hidden layers replicated; output layer (last entry of weights/colsum128/
    biases) sharded over MODEL_AXIS on the node dim.
    """
    from ..quant.quantize import QuantizedNet

    rep = NamedSharding(mesh, P())
    col = NamedSharding(mesh, P(None, MODEL_AXIS))
    vec = NamedSharding(mesh, P(MODEL_AXIS))

    def build(qnet: QuantizedNet) -> QuantizedNet:
        n = len(qnet.weights)
        return QuantizedNet(
            input_w=rep,
            input_b=rep,
            weights=tuple([rep] * (n - 1) + [col]),
            colsum128=tuple([rep] * (n - 1) + [vec]),
            biases=tuple([rep] * (n - 1) + [vec]),
            inv_scales=tuple([rep] * n),
            multipliers=tuple([rep] * n),
            # static metadata must match the net's treedef for in_shardings
            true_output_dim=qnet.true_output_dim,
            packed_int4=qnet.packed_int4,
        )

    return build


def shard_qnet(qnet, mesh: Mesh):
    """Place a QuantizedNet on the mesh with the layout above.

    Works on multi-process meshes too: every process holds the same host
    net (deterministic load), and each materializes only its addressable
    shards.
    """
    shardings = qnet_shardings(mesh)(qnet)
    if len(mesh.devices.flat) == len([d for d in mesh.devices.flat if d.process_index == jax.process_index()]):
        return jax.device_put(qnet, shardings)

    def place(leaf, sharding):
        arr = np.asarray(leaf)
        return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])

    return jax.tree_util.tree_map(place, qnet, shardings)


def frames_sharding(mesh: Mesh) -> NamedSharding:
    """Frame batches shard over the data axis, features replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, None))


def shard_frames(frames, mesh: Mesh):
    return jax.device_put(frames, frames_sharding(mesh))

"""Worker for the true multi-process (multi-"host") test.

Launched once per process by tests/test_multihost.py:

    python tests/multihost_worker.py COORD_ADDR NUM_PROCS PROC_ID OUT_DIR

Each process owns 4 virtual CPU devices; jax.distributed.initialize wires
them into one 8-device global mesh (2 "hosts" x 4 devices — the DP axis
spans processes like DCN would, the model axis stays process-local like
ICI).  Every process feeds its local shard of a deterministic frame batch
through the GSPMD scorer; process 0 writes the gathered posteriors for the
driver test to compare against the single-process engine.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    coord, num, pid, out_dir = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    from fastdnn_tpu.parallel.mesh import init_multihost

    init_multihost(coord, num_processes=num, process_id=pid)
    assert jax.process_count() == num, jax.process_count()
    devices = jax.devices()
    assert len(devices) == 4 * num, len(devices)

    import numpy as np

    from fastdnn_tpu.models.feedforward import random_net
    from fastdnn_tpu.parallel.mesh import make_mesh
    from fastdnn_tpu.parallel.sharded import make_gspmd_scorer
    from fastdnn_tpu.quant.quantize import quantize_net
    from jax.sharding import NamedSharding, PartitionSpec as P

    # identical model + frames in every process (deterministic seeds)
    net = random_net(jax.random.PRNGKey(5), 32, [64, 64], 4 * len(devices))
    qnet = quantize_net(net)
    B = 64
    frames = np.random.default_rng(7).standard_normal((B, 32)).astype(np.float32)

    mesh = make_mesh(model=2)  # (data=4, model=2) over 8 global devices
    score, _ = make_gspmd_scorer(mesh, out_dim=qnet.output_dim)

    # build the globally-sharded frame array from per-process local shards:
    # mesh device order follows process order, so process p owns the data
    # rows [p*B/num, (p+1)*B/num)
    sharding = NamedSharding(mesh, P("data", None))
    local = frames[pid * (B // num) : (pid + 1) * (B // num)]
    global_frames = jax.make_array_from_process_local_data(
        sharding, local, global_shape=(B, frames.shape[1])
    )

    post = score(qnet, global_frames)
    # gather to every process for the check
    gathered = np.asarray(
        jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(post)
    )
    if pid == 0:
        np.save(os.path.join(out_dir, "multihost_post.npy"), gathered)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Minimal on-device compile+run repro for the packed-int4 Pallas kernel.

Round-5b debugging aid: the first real-Mosaic compile of
`_hidden_kernel_packed` failed (remote_compile HTTP 500, tpu_compile_helper
exit 1 — artifacts/r5/verify2.log) with the root Mosaic message truncated by
the harness.  This runs JUST that kernel at tiny shapes and prints either OK
with the max |diff| vs the XLA packed oracle, or the FULL untruncated error.

Usage: python tools/repro_packed.py [K] [N] [B]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastdnn_tpu.config import enable_compilation_cache, honor_jax_platforms_env

honor_jax_platforms_env()
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastdnn_tpu.ops.matmul import hidden_layer_step_packed  # noqa: E402
from fastdnn_tpu.ops.pallas_kernels import fused_hidden_layer  # noqa: E402


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}; shapes B={b} K={k} N={n}",
          flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (b, k), dtype=np.int8) + 127,
                    jnp.int8)  # shifted activations
    packed = jnp.asarray(rng.integers(-128, 128, (k // 2, n), dtype=np.int8))
    colsum = jnp.asarray(rng.integers(-4000, 4000, (n,), dtype=np.int32))
    bias = jnp.asarray(rng.standard_normal(n), jnp.float32)
    inv = jnp.float32(0.01)

    want = np.asarray(jax.jit(hidden_layer_step_packed)(
        x, packed, colsum, inv, bias))
    got = np.asarray(fused_hidden_layer(
        x, packed, colsum, inv, bias, interpret=dev.platform != "tpu",
        packed=True))
    d = int(np.abs(want.astype(np.int32) - got.astype(np.int32)).max())
    print(f"OK max|diff| = {d} (want 0: bitwise)")
    return 0 if d == 0 else 1


if __name__ == "__main__":
    sys.exit(main())

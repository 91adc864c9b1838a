"""On-device exhaustive check of the quantized sigmoid against the LUT.

The Pallas kernels compute the reference's 1280-entry sigmoid table
(/root/reference/src/cpp/dnn.h:23-47) in closed form via the v5e's tanh
(ops/pallas_kernels._quantized_sigmoid_shifted, with 2 pinned entries);
the XLA path uses the exp form (ops/sigmoid.py).  CPU tests prove both
bit-exact where libm is correctly rounded — THIS script proves it on the
actual accelerator's transcendental approximations, at every one of the
1281 representable inputs.  Run after any kernel/toolchain change:

    python tools/check_sigmoid.py        # exit 0 = both paths exact
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def main() -> int:
    from fastdnn_tpu.config import honor_jax_platforms_env

    honor_jax_platforms_env()  # the axon hook force-registers TPU over the env
    from fastdnn_tpu.ops.pallas_kernels import _quantized_sigmoid_shifted
    from fastdnn_tpu.ops.sigmoid import (
        ZERO_POINT,
        quantized_sigmoid_shifted_i8,
        reference_lut_lookup,
    )

    ks = np.arange(-640, 641, dtype=np.int64)
    lin = (ks.astype(np.float32)) / 100.0
    # expected via the test-gated oracle (the rebuilt reference LUT itself,
    # ops.sigmoid.build_reference_lut) so this tool and the CPU tests share
    # ONE reference construction — not an independent float64 closed form
    expected = (reference_lut_lookup(lin).astype(np.int16) - ZERO_POINT).astype(
        np.int8
    )
    pad = np.zeros(8 * 2048 - lin.size, np.float32)
    lin_mat = jnp.asarray(np.concatenate([lin, pad]).reshape(8, 2048))

    def kernel(lin_ref, out_ref):
        out_ref[:] = _quantized_sigmoid_shifted(lin_ref[:])

    platform = jax.devices()[0].platform
    got_pallas = np.asarray(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(lin_mat.shape, jnp.int8),
            interpret=platform != "tpu",
        )(lin_mat)
    ).reshape(-1)[: ks.size]
    got_xla = np.asarray(jax.jit(quantized_sigmoid_shifted_i8)(lin_mat)).reshape(-1)[
        : ks.size
    ]

    ok = True
    for name, got in (("pallas", got_pallas), ("xla", got_xla)):
        bad = np.nonzero(got != expected)[0]
        if bad.size:
            ok = False
            print(
                f"{name} [{platform}]: {bad.size} MISMATCHES at k={ks[bad][:10]} "
                f"(got {got[bad][:10]}, want {expected[bad][:10]})"
            )
        else:
            print(f"{name} [{platform}]: bit-exact at all {ks.size} entries")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

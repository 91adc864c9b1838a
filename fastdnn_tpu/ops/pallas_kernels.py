"""Pallas TPU kernels: the hot path of the quantized engine.

These kernels replace the reference's entire per-layer loop nest
(quantizedNodeSum x nodes x frames, /root/reference/src/cpp/dnn.cc:289-349):

  * `fused_hidden_layer` — one MXU pass per hidden layer computing
      s8xs8 matmul -> +colsum128 zero-point fix -> *inv_scale -> +bias
      -> quantized sigmoid -> shifted int8
    in VMEM, so the only HBM traffic per layer is int8 in, int8 weights,
    int8 out.  Fuses reference components #1, #2, #5, #6 (SURVEY.md §2).

  * `fused_hidden_stack` — ALL equal-width hidden layers in one kernel,
    activations VMEM-resident between layers; the engine's small-batch
    latency path (dispatches and weight streaming collapse).

  * `output_layer_posteriors_resident` — the engine's primary output path:
    whole output weight matrix VMEM-resident (the 16 MB scoped-VMEM limit
    is soft), full softmax computed in-kernel per frame block, posteriors
    written at the true unaligned senone count.  Replaces components #1,
    #2, #5, #10, #11 with one kernel launch.

  * `output_layer_posteriors` — fallback for output layers too large for
    VMEM residency: node-blocked matmul accumulating flash-softmax stats
    in a persistent scratch, plus a single-read XLA normalize.

  * `output_layer_logits` — pre-softmax logits for the plain
    (fused_softmax=False) path and the gathered lazy path.

All expect MXU-padded operands: frame count a multiple of 32, node dims
multiples of 128 (see quant.quantize.pad_qnet_for_tpu).  Grids iterate
frames-fastest so weight blocks are loaded once and reused across frame
blocks (the reference's batch_size cache-blocking insight, dnn.cc:301-317,
transposed to VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ACTIVATION_SCALE, SIGMOID_RESOLUTION

LANES = 128


def _quantized_sigmoid_shifted(lin: jax.Array) -> jax.Array:
    """In-kernel quantized sigmoid -> shifted int8: the trimmed tanh form,
    identical to ops/sigmoid.quantized_sigmoid_shifted_i8 (see its
    docstring for the algebra and the two pinned entries).

    127.5*tanh(kc/200) is 255*sigmoid(kc/100) - 127.5; one VPU
    transcendental instead of exp + divide, trunc-based half-away rounding,
    no clip (tanh saturates to the boundary counts), and the shifted int8
    value taken directly as floor(127.5*tanh(kc/200)).  The epilogue is
    pure serial VPU time on top of a matmul at ~96% of int8 peak, so every
    op counts: v-form exp 242 -> v-form tanh 221 -> this form 206 us per
    8192x2048 hidden layer (v5e, device-traced).  The v5e tanh
    approximation lands on the wrong side of the rounding boundary for
    exactly 2 of the 1281 table entries — k = +/-513, margin 1.5e-4 where
    every other entry's margin is >= 0.0216, far above the ~3e-3
    approximation error — so those two are pinned, keeping the kernel
    bit-exact with the reference LUT at EVERY entry: exhaustively verified
    on-device by tools/check_sigmoid.py and on CPU (where tanh is
    correctly rounded and the pins are no-ops) by tests/test_quant.py +
    the pallas-vs-XLA bitwise gates.
    """
    half_scale = ACTIVATION_SCALE / 2.0  # 127.5
    k = jnp.trunc(
        lin * SIGMOID_RESOLUTION + jnp.copysign(jnp.float32(0.5), lin)
    )
    s = jnp.floor(half_scale * jnp.tanh(k * (0.5 / SIGMOID_RESOLUTION)))
    s = jnp.where(k == 513.0, 126.0, s)
    s = jnp.where(k == -513.0, -127.0, s)
    return s.astype(jnp.int8)


def _hidden_kernel(x_ref, w_ref, colsum_ref, bias_ref, inv_scale_ref, out_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    lin = (acc + colsum_ref[:]).astype(jnp.float32) * inv_scale_ref[0, 0] + bias_ref[:]
    out_ref[:] = _quantized_sigmoid_shifted(lin)


def _hidden_kernel_packed(xlo_ref, xhi_ref, w_ref, colsum_ref, bias_ref,
                          inv_scale_ref, out_ref):
    """_hidden_kernel for pack_int4_trunk weights: w_ref is [K/2, bn] int8
    carrying two s4 nibbles per byte (quant.quantize.pack_int4_trunk).  Two
    arithmetic shifts recover the halves on the VPU (amortized: ~1M ops per
    ~2G-MAC step) and two plain s8 x s8 MXU dots over the activation halves
    replace the one s4 dot — no jnp.int4 anywhere in the compiled kernel.

    Mosaic-safety (first real-hardware compile, round 5b): the unpack is
    widened to int32 before shifting — i8 vector shifts crashed the v5e
    remote compiler (tpu_compile_helper exit 1, artifacts/r5/verify2.log) —
    and the activation halves arrive as two separate refs sliced by XLA
    outside the kernel, so Mosaic never sees a lane-dimension slice."""
    packed = w_ref[:].astype(jnp.int32)
    lo = ((packed << 28) >> 28).astype(jnp.int8)  # sign-extend the low nibble
    hi = (packed >> 4).astype(jnp.int8)           # arithmetic shift: high nibble
    acc = jnp.dot(xlo_ref[:], lo, preferred_element_type=jnp.int32)
    acc += jnp.dot(xhi_ref[:], hi, preferred_element_type=jnp.int32)
    lin = (acc + colsum_ref[:]).astype(jnp.float32) * inv_scale_ref[0, 0] + bias_ref[:]
    out_ref[:] = _quantized_sigmoid_shifted(lin)


def _logits_kernel(x_ref, w_ref, colsum_ref, bias_ref, inv_scale_ref, out_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    out_ref[:] = (acc + colsum_ref[:]).astype(jnp.float32) * inv_scale_ref[0, 0] + bias_ref[:]


def _check_shapes(x, w, colsum, bias, block_frames, block_nodes):
    b, k = x.shape
    k2, n = w.shape
    if k != k2:
        raise ValueError(f"K mismatch: activations {k} vs weights {k2}")
    if colsum.shape != (n,) or bias.shape != (n,):
        raise ValueError("colsum/bias must be [N]")
    if b % block_frames or n % block_nodes or k % LANES or n % LANES or b % 32:
        raise ValueError(
            f"pallas path needs padded shapes: B={b} must be a multiple of 32 "
            f"and of the frame block {block_frames}; N={n} a multiple of 128 "
            f"and of the node block {block_nodes}; K={k} a multiple of 128 "
            "(use pad_qnet_for_tpu and frame bucketing)"
        )


def _layer_call(kernel, out_dtype, x, w, colsum, bias, inv_scale, *, block_frames, block_nodes, interpret, packed=False):
    b, k = x.shape
    n = w.shape[1]
    kw = w.shape[0]  # = k, or k/2 for packed-nibble int4 weights
    if packed and kw * 2 != k:
        raise ValueError(
            f"packed weights must be [K/2, N]: K={k} but packed rows={kw}"
        )
    bm = min(block_frames, b)
    while b % bm:  # engine buckets frames to x128, so this terminates at 128
        bm //= 2
    bn = min(block_nodes, n)
    while n % bn:  # node dims are padded to x128 (pad_qnet_for_tpu)
        bn //= 2
    # packed weights check as their logical [K, N] shape
    w_logical = w if not packed else jax.ShapeDtypeStruct((k, n), w.dtype)
    _check_shapes(x, w_logical, colsum, bias, bm, bn)
    grid = (n // bn, b // bm)  # frames iterate fastest: weight block reused
    flops = 2 * b * n * k
    bytes_accessed = b * k + kw * n + b * n * (1 if out_dtype == jnp.int8 else 4) + 4 * n * 2
    # packed path: the activation halves are sliced by XLA here, OUTSIDE the
    # kernel, so Mosaic sees two plain [bm, kk] refs (lane-dim slicing inside
    # the kernel is a real-hardware compile hazard; see _hidden_kernel_packed)
    x_in = [x[:, :kw], x[:, kw:]] if packed else [x]
    x_specs = [
        pl.BlockSpec((bm, kw if packed else k), lambda j, i: (i, 0),
                     memory_space=pltpu.VMEM)
        for _ in x_in
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=x_specs + [
            pl.BlockSpec((kw, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=b * n
        ),
        interpret=interpret,
    )(*x_in, w, colsum.reshape(1, n), bias.reshape(1, n), inv_scale.reshape(1, 1))


@functools.partial(
    jax.jit, static_argnames=("block_frames", "block_nodes", "interpret", "packed")
)
def fused_hidden_layer(
    acts_i8: jax.Array,
    w_i8: jax.Array,
    colsum128_i32: jax.Array,
    inv_scale_f32: jax.Array,
    bias_f32: jax.Array,
    *,
    block_frames: int = 1024,
    block_nodes: int = 1024,
    interpret: bool = False,
    packed: bool = False,
) -> jax.Array:
    """One quantized hidden layer on the MXU: int8 [B,K] x int8 [K,N] ->
    shifted-int8 activations [B,N].  packed=True consumes a
    pack_int4_trunk weight matrix ([K/2, N] two-nibbles-per-byte int8,
    unpacked in VMEM — same math, half the HBM weight bytes, no jnp.int4)."""
    return _layer_call(
        _hidden_kernel_packed if packed else _hidden_kernel,
        jnp.int8,
        acts_i8,
        w_i8,
        colsum128_i32,
        bias_f32,
        jnp.asarray(inv_scale_f32, jnp.float32),
        block_frames=block_frames,
        block_nodes=block_nodes,
        interpret=interpret,
        packed=packed,
    )


def _stack_kernel_factory(n_layers: int, resident: bool):
    """All hidden layers in one kernel: grid (frame blocks, layers) with the
    LAYER axis fastest.  Activations stay in a VMEM scratch between layers —
    they never touch HBM.  Weights either stream one matrix per step
    (double-buffered; re-read once per frame block) or, `resident`, the
    whole [L, H, H] stack sits in VMEM for the entire grid — zero weight
    re-streaming at any batch size (scoped-VMEM limit raised accordingly)."""

    def kernel(x_ref, w_ref, colsum_ref, bias_ref, inv_ref, out_ref, acts):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            acts[:] = x_ref[:]

        a = acts[:]
        w = w_ref[l] if resident else w_ref[0]
        cs = colsum_ref[l] if resident else colsum_ref[0]
        bias = bias_ref[l] if resident else bias_ref[0]
        inv = inv_ref[l, 0, 0] if resident else inv_ref[0, 0, 0]
        acc = jnp.dot(a, w, preferred_element_type=jnp.int32)
        lin = (acc + cs).astype(jnp.float32) * inv + bias
        res = _quantized_sigmoid_shifted(lin)
        acts[:] = res

        @pl.when(l == n_layers - 1)
        def _():
            out_ref[:] = res

    return kernel


@functools.partial(jax.jit, static_argnames=("block_frames", "interpret", "resident"))
def fused_hidden_stack(
    acts_i8: jax.Array,
    w_stack_i8: jax.Array,
    colsum_stack_i32: jax.Array,
    inv_scales_f32: jax.Array,
    bias_stack_f32: jax.Array,
    *,
    block_frames: int = 512,
    interpret: bool = False,
    resident: bool = False,
) -> jax.Array:
    """All equal-width hidden layers in one MXU pass chain.

    w_stack: int8 [L, H, H]; colsum/bias stacks [L, H]; inv_scales [L].
    Requires every hidden width equal (the reference topology guarantees
    this, /root/reference/README.md:69-70).

    Wins at small frame counts (<= one 512-frame block: weights stream once
    and n-1 dispatches vanish; measured 31% faster hidden time at B=128 on
    v5e).  Loses at batch, where per-layer kernels keep weights resident
    across many frame blocks — the engine switches on
    config.stack_hidden_max_frames.
    """
    b, k = acts_i8.shape
    L, k2, n = w_stack_i8.shape
    if k != k2 or k != n:
        raise ValueError(f"stack needs square equal-width layers, got {w_stack_i8.shape}")
    if b % 32 or k % LANES:
        raise ValueError("pallas path needs padded shapes (see pad_qnet_for_tpu)")
    bm = min(block_frames, b)
    while b % bm:
        bm //= 2
    grid = (b // bm, L)  # layers iterate fastest; acts scratch carries depth
    if resident:
        w_spec = pl.BlockSpec((L, k, n), lambda i, l: (0, 0, 0), memory_space=pltpu.VMEM)
        v_spec = pl.BlockSpec((L, 1, n), lambda i, l: (0, 0, 0), memory_space=pltpu.VMEM)
        i_spec = pl.BlockSpec((L, 1, 1), lambda i, l: (0, 0, 0), memory_space=pltpu.SMEM)
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=min(
                int((L * k * n + 4 * bm * k + 12 * bm * n + (1 << 22)) * 1.25),
                100 * 1024 * 1024,
            )
        )
    else:
        w_spec = pl.BlockSpec((1, k, n), lambda i, l: (l, 0, 0), memory_space=pltpu.VMEM)
        v_spec = pl.BlockSpec((1, 1, n), lambda i, l: (l, 0, 0), memory_space=pltpu.VMEM)
        i_spec = pl.BlockSpec((1, 1, 1), lambda i, l: (l, 0, 0), memory_space=pltpu.SMEM)
        compiler_params = None
    return pl.pallas_call(
        _stack_kernel_factory(L, resident),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, l: (i, 0), memory_space=pltpu.VMEM),
            w_spec,
            v_spec,
            v_spec,
            i_spec,
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i, l: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.int8),
        scratch_shapes=[pltpu.VMEM((bm, n), jnp.int8)],
        **({"compiler_params": compiler_params} if compiler_params else {}),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * k * L,
            bytes_accessed=b * k + (k * n * (L if resident else (b // bm) * L)) + b * n,
            transcendentals=b * n * L,
        ),
        interpret=interpret,
    )(
        acts_i8,
        w_stack_i8,
        colsum_stack_i32.reshape(L, 1, n),
        bias_stack_f32.reshape(L, 1, n),
        jnp.asarray(inv_scales_f32, jnp.float32).reshape(L, 1, 1),
    )


def _resident_softmax_kernel_factory(out_dim: int, masked: bool, semantics: str, p_dtype):
    """Output layer + FULL softmax in one kernel pass.

    The whole [K, N] output weight matrix stays VMEM-resident (the 16 MB
    scoped-VMEM default is a soft limit; we raise it) and the grid walks
    frame blocks only, so each step sees a complete logits row block:
    softmax needs no online stats, no side channels, no epilogue — the
    kernel writes exactly [B, out_dim] posteriors (a full-block unaligned
    last dim is legal in Mosaic), which also kills the XLA padding-slice.
    """

    def kernel(*refs):
        if masked:
            x_ref, w_ref, colsum_ref, bias_ref, inv_ref, mask_ref, p_ref = refs
        else:
            x_ref, w_ref, colsum_ref, bias_ref, inv_ref, p_ref = refs
        acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
        z = (acc + colsum_ref[:]).astype(jnp.float32) * inv_ref[0, 0] + bias_ref[:]
        NEG_CAP = jnp.float32(-1e30)
        if masked:
            if semantics == "reference":
                # inactive senones keep logit 0 (dnn.cc:369-389)
                z = jnp.where(mask_ref[:] != 0, z, 0.0)
            else:
                z = jnp.where(mask_ref[:] != 0, z, NEG_CAP)
        # MXU padding columns never contribute
        col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
        z = jnp.where(col < out_dim, z, NEG_CAP)
        m = jnp.max(z, axis=1, keepdims=True)
        e = jnp.exp(z - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        # a fully-masked active_only row has every z at NEG_CAP and would
        # come out uniform; emit zeros instead (matches the XLA path)
        p = jnp.where(m > jnp.float32(-1e29), p, 0.0)
        p_ref[:] = p[:, :out_dim].astype(p_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("out_dim", "semantics", "block_frames", "interpret", "fast"),
)
def output_layer_posteriors_resident(
    acts_i8: jax.Array,
    w_i8: jax.Array,
    colsum128_i32: jax.Array,
    inv_scale_f32: jax.Array,
    bias_f32: jax.Array,
    masks: jax.Array | None = None,
    *,
    out_dim: int,
    semantics: str = "reference",
    block_frames: int = 256,
    interpret: bool = False,
    fast: bool = False,
) -> jax.Array:
    """Fused output layer + softmax, weights resident -> [B, out_dim].

    VMEM per step: K x N int8 weights (e.g. 16.8 MB for 2048x8192) + two
    f32 [bm, N] working sets; the call raises the scoped-VMEM limit
    accordingly.  `fast=True` emits bfloat16 posteriors.
    """
    b, k = acts_i8.shape
    n = w_i8.shape[1]
    bm = min(block_frames, b)
    while b % bm:
        bm //= 2
    _check_shapes(acts_i8, w_i8, colsum128_i32, bias_f32, bm, n)
    if masks is not None and masks.shape != (b, n):
        raise ValueError(f"masks must be [{b}, {n}], got {masks.shape}")
    masked = masks is not None
    p_dtype = jnp.bfloat16 if fast else jnp.float32
    in_specs = [
        pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    args = [
        acts_i8,
        w_i8,
        colsum128_i32.reshape(1, n),
        bias_f32.reshape(1, n),
        jnp.asarray(inv_scale_f32, jnp.float32).reshape(1, 1),
    ]
    if masked:
        in_specs.append(pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM))
        args.append(masks)
    # weights + double-buffered activations/posteriors/mask blocks + slack
    vmem_budget = (
        k * n
        + 2 * (bm * k)
        + 2 * 4 * (bm * n)  # z working set + p block (f32)
        + (2 * bm * n if masked else 0)
        + (1 << 22)
    )
    return pl.pallas_call(
        _resident_softmax_kernel_factory(out_dim, masked, semantics, p_dtype),
        grid=(b // bm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_dim), p_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_budget * 1.25), 100 * 1024 * 1024)
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * k,
            bytes_accessed=b * k + k * n + 4 * b * out_dim,
            transcendentals=b * n,
        ),
        interpret=interpret,
    )(*args)


def _stats_kernel_factory(
    bm: int, bn: int, masked: bool, semantics: str, z_dtype=jnp.float32
):
    """Kernel computing output-logits blocks plus online softmax stats.

    Grid is (node blocks, frame blocks) with FRAMES iterating fastest, so a
    weight block is DMA'd once and reused across every frame block (the same
    order as the plain layer kernels).  Running (max, sum-of-exp) per frame
    live in a [B, 128] VMEM scratch that persists across the whole grid —
    flash-softmax style — and are emitted on the last node sweep via a
    conditional output index map.  The XLA epilogue then normalizes with a
    single read of the logits (exp(z - m)/s) instead of the two-read,
    one-write standalone softmax.

    Columns at or beyond the DYNAMIC valid-count scalar (an SMEM operand)
    are excluded from the stats via a large negative cap — MXU padding for
    the single-device path (where the epilogue also slices them off), or
    the shard-local senone cutoff for the tensor-parallel path (where the
    valid count varies per shard and so cannot be a static kernel
    attribute).
    """

    fast = z_dtype != jnp.float32

    def kernel(*refs):
        refs = list(refs)
        x_ref, w_ref, colsum_ref, bias_ref, inv_ref, valid_ref = refs[:6]
        del refs[:6]
        mask_ref = refs.pop(0) if masked else None
        z_ref, m_ref, s_ref = refs[:3]
        del refs[:3]
        bmax_ref = refs.pop(0) if fast else None
        m_acc, s_acc = refs[:2]
        bmax_acc = refs[2] if fast else None
        j = pl.program_id(0)
        i = pl.program_id(1)
        nj = pl.num_programs(0)
        acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
        z = (acc + colsum_ref[:]).astype(jnp.float32) * inv_ref[0, 0] + bias_ref[:]

        # NEG_CAP instead of -inf keeps the running stats NaN-free
        # (exp(-inf - -inf) would poison the sum on fully-masked rows)
        NEG_CAP = jnp.float32(-1e30)

        if masked:
            if semantics == "reference":
                # inactive senones keep logit 0 (dnn.cc:369-389)
                z = jnp.where(mask_ref[:] != 0, z, 0.0)
            else:
                z = jnp.where(mask_ref[:] != 0, z, NEG_CAP)
        # exclude invalid (padding / out-of-shard) columns from the stats
        col = j * bn + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
        z = jnp.where(col < valid_ref[0, 0], z, NEG_CAP)

        rows = pl.ds(i * bm, bm)

        @pl.when(j == 0)
        def _():
            m_acc[rows] = jnp.full((bm, LANES), NEG_CAP, jnp.float32)
            s_acc[rows] = jnp.zeros((bm, LANES), jnp.float32)

        zm = jnp.maximum(jnp.max(z, axis=1, keepdims=True), NEG_CAP)  # (bm, 1)
        if fast:
            # store z relative to the block-row max: the low-precision
            # rounding error is then proportional to (zm - z), which is
            # exactly where softmax is insensitive — senones near the max
            # (the ones with mass) round to ~full precision.  The block
            # maxes ride a [B, 128] side channel (lane j) for the epilogue.
            z_ref[:] = (z - zm).astype(z_dtype)
            lane = jax.lax.broadcasted_iota(jnp.int32, (bm, LANES), 1)

            @pl.when(j == 0)
            def _():
                bmax_acc[rows] = jnp.zeros((bm, LANES), jnp.float32)

            bmax_acc[rows] = jnp.where(lane == j, zm, bmax_acc[rows])
        else:
            z_ref[:] = z
        m_old = m_acc[rows]
        m_new = jnp.maximum(m_old, zm)
        # sum exp with rescaling of the previously accumulated sum
        block_sum = jnp.sum(jnp.exp(z - zm), axis=1, keepdims=True)
        s_acc[rows] = s_acc[rows] * jnp.exp(m_old - m_new) + block_sum * jnp.exp(zm - m_new)
        m_acc[rows] = m_new

        @pl.when(j == nj - 1)
        def _():
            m_ref[:] = m_acc[rows]
            s_ref[:] = s_acc[rows]
            if fast:
                bmax_ref[:] = bmax_acc[rows]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("out_dim", "semantics", "block_frames", "block_nodes", "interpret", "fast"),
)
def output_layer_posteriors(
    acts_i8: jax.Array,
    w_i8: jax.Array,
    colsum128_i32: jax.Array,
    inv_scale_f32: jax.Array,
    bias_f32: jax.Array,
    masks: jax.Array | None = None,
    *,
    out_dim: int,
    semantics: str = "reference",
    block_frames: int = 512,
    block_nodes: int = 512,
    interpret: bool = False,
    fast: bool = False,
) -> jax.Array:
    """Fused output layer + softmax -> posteriors f32 [B, out_dim].

    One MXU pass produces logits and flash-style softmax stats; a single
    fused XLA read normalizes (and slices off MXU padding).  `masks`
    ([B, N] nonzero=active, optional) applies the lazy semantics in-kernel.

    fast=True stores the logits buffer and the returned posteriors as
    bfloat16, halving the output-stage HBM traffic.  The buffer holds
    z - blockmax (f32 stats and block maxes ride exact side channels), so
    bf16 rounding error is ~2^-9 x (blockmax - z) — largest only for
    senones far below the max, whose posteriors are ~0 anyway.  Posteriors
    with non-negligible mass come out within ~0.3% relative.  Returned
    dtype is bfloat16; requires n <= 128 node blocks.
    """
    outs, nj, bn = _flash_stats_call(
        acts_i8, w_i8, colsum128_i32, inv_scale_f32, bias_f32, masks,
        valid_count=jnp.int32(out_dim), semantics=semantics,
        block_frames=block_frames, block_nodes=block_nodes,
        interpret=interpret, fast=fast,
    )
    z_dtype = jnp.bfloat16 if fast else jnp.float32
    # single fused pass: slice padding, normalize
    if fast:
        z, m, s, bmax = outs
        # rebuild z = z_rel + blockmax(lane j); equal-repeat is a broadcast,
        # so XLA fuses it into the normalize pass without materializing
        bm_cols = jnp.repeat(bmax[:, :nj], bn, axis=1)[:, :out_dim]
        p = jnp.exp(z[:, :out_dim].astype(jnp.float32) + bm_cols - m[:, :1]) / s[:, :1]
    else:
        z, m, s = outs
        p = jnp.exp(z[:, :out_dim] - m[:, :1]) / s[:, :1]
    # fully-masked active_only rows (running max still at the cap) -> zeros
    p = jnp.where(m[:, :1] > -1e29, p, 0.0)
    return p.astype(z_dtype)


def _flash_stats_call(
    acts_i8, w_i8, colsum128_i32, inv_scale_f32, bias_f32, masks, *,
    valid_count, semantics, block_frames, block_nodes, interpret, fast,
):
    """Shared plumbing: one MXU pass producing logits + flash softmax
    stats.  `valid_count` is a DYNAMIC int32 scalar (SMEM): columns at or
    beyond it are capped out of the stats — MXU padding for single-device,
    the shard-local senone cutoff for tensor-parallel shards (where the
    count varies per shard).  Returns (pallas outputs, nj, bn)."""
    b, k = acts_i8.shape
    n = w_i8.shape[1]
    bm = min(block_frames, b)
    while b % bm:
        bm //= 2
    bn = min(block_nodes, n)
    while n % bn:
        bn //= 2
    _check_shapes(acts_i8, w_i8, colsum128_i32, bias_f32, bm, bn)
    if masks is not None and masks.shape != (b, n):
        raise ValueError(f"masks must be [{b}, {n}], got {masks.shape}")
    masked = masks is not None
    grid = (n // bn, b // bm)  # frames iterate fastest: weight block reused
    nj = n // bn
    last_sweep = lambda j, i: (jnp.where(j == nj - 1, i, 0), 0)
    in_specs = [
        pl.BlockSpec((bm, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
    ]
    args = [
        acts_i8,
        w_i8,
        colsum128_i32.reshape(1, n),
        bias_f32.reshape(1, n),
        jnp.asarray(inv_scale_f32, jnp.float32).reshape(1, 1),
        jnp.asarray(valid_count, jnp.int32).reshape(1, 1),
    ]
    if masked:
        in_specs.append(pl.BlockSpec((bm, bn), lambda j, i: (i, j), memory_space=pltpu.VMEM))
        args.append(masks)
    z_dtype = jnp.bfloat16 if fast else jnp.float32
    if fast and nj > LANES:
        raise ValueError(f"fast mode supports at most {LANES} node blocks, got {nj}")
    out_specs = [
        pl.BlockSpec((bm, bn), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        # stats blocks all alias block 0 until the last node sweep, when
        # the index map walks the real frame blocks — so only final stats
        # ever reach HBM (one flush per frame block)
        pl.BlockSpec((bm, LANES), last_sweep, memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, LANES), last_sweep, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, n), z_dtype),
        jax.ShapeDtypeStruct((b, LANES), jnp.float32),
        jax.ShapeDtypeStruct((b, LANES), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((b, LANES), jnp.float32),
        pltpu.VMEM((b, LANES), jnp.float32),
    ]
    if fast:
        out_specs.append(pl.BlockSpec((bm, LANES), last_sweep, memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, LANES), jnp.float32))
        scratch.append(pltpu.VMEM((b, LANES), jnp.float32))
    outs = pl.pallas_call(
        _stats_kernel_factory(bm, bn, masked, semantics, z_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * k,
            bytes_accessed=b * k + k * n + 4 * b * n,
            transcendentals=b * n,
        ),
        interpret=interpret,
    )(*args)
    return outs, nj, bn


def output_layer_flash_stats(
    acts_i8: jax.Array,
    w_i8: jax.Array,
    colsum128_i32: jax.Array,
    inv_scale_f32: jax.Array,
    bias_f32: jax.Array,
    masks: jax.Array | None = None,
    *,
    valid_count,
    semantics: str = "reference",
    block_frames: int = 512,
    block_nodes: int = 512,
    interpret: bool = False,
):
    """Local output logits + UN-normalized flash softmax stats, for the
    tensor-parallel fused-softmax path: each shard runs this kernel over
    its weight columns, then the globally-exact softmax needs only the
    tiny cross-shard stat collectives

        m = pmax(m_local);  s = psum(s_local * exp(m_local - m))
        p = exp(z_local - m) / s

    instead of an extra logits HBM round-trip.  `valid_count` is dynamic
    (int32 scalar): the number of REAL senone columns in this shard
    (0..n_local); capped columns carry z = -1e30 so exp(z - m) is 0.

    Returns (z [B, n_local], m [B, 1], s [B, 1]); masked semantics applied
    in-kernel like output_layer_posteriors.
    """
    outs, _, _ = _flash_stats_call(
        acts_i8, w_i8, colsum128_i32, inv_scale_f32, bias_f32, masks,
        valid_count=valid_count, semantics=semantics,
        block_frames=block_frames, block_nodes=block_nodes,
        interpret=interpret, fast=False,
    )
    z, m, s = outs
    return z, m[:, :1], s[:, :1]


def _block_sparse_kernel_factory(
    bm: int, bn: int, semantics: str, capped_fill: bool = False
):
    """Masked output kernel that SKIPS node blocks whose mask block is
    all-zero — the TPU translation of the reference's lazy dot-product
    skipping (dnn.cc:355-392), at MXU-block granularity instead of per
    senone.

    Same grid/stats structure as _stats_kernel_factory (frames fastest,
    flash stats in persistent scratch), plus two tiny SMEM side inputs:

      act[j, i]  — nonzero iff mask block (i, j) has any active senone;
                   `pl.when(act == 0)` skips the matmul, the epilogue
                   write becomes a constant fill, and the stats update
                   vanishes;
      nskip[i]   — per frame block, the number of REAL (non-padding)
                   senone columns covered by skipped blocks.  Under
                   reference semantics those senones carry logit 0 and
                   STILL join the softmax (dnn.cc:369-389), so the running
                   stats are INITIALIZED to (m=0, s=nskip) — each skipped
                   zero contributes exp(0-0)=1 — and the online update
                   then reproduces the dense kernel's result exactly.
                   active_only skips contribute nothing (init NEG_CAP/0).

    Weight-block DMA is unchanged (frames-fastest already loads each
    weight block once per batch sweep); the win is the skipped MXU matmul
    + VPU stats work, which at decoder densities is most of the output
    stage.  Bit-compatibility with the dense masked kernel is gated by
    tests/test_kernels.py and tools/verify_tpu.py.
    """

    def kernel(x_ref, w_ref, colsum_ref, bias_ref, inv_ref, valid_ref,
               mask_ref, act_ref, nskip_ref, z_ref, m_ref, s_ref,
               m_acc, s_acc):
        j = pl.program_id(0)
        i = pl.program_id(1)
        nj = pl.num_programs(0)
        NEG_CAP = jnp.float32(-1e30)
        rows = pl.ds(i * bm, bm)
        active = act_ref[j, i] != 0

        @pl.when(j == 0)
        def _():
            if semantics == "reference":
                nskip = nskip_ref[i].astype(jnp.float32)
                m0 = jnp.where(nskip > 0, 0.0, NEG_CAP)
                s0 = nskip
            else:
                m0 = NEG_CAP
                s0 = jnp.float32(0.0)
            m_acc[rows] = jnp.full((bm, LANES), m0, jnp.float32)
            s_acc[rows] = jnp.full((bm, LANES), s0, jnp.float32)

        @pl.when(active)
        def _():
            acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
            z = (acc + colsum_ref[:]).astype(jnp.float32) * inv_ref[0, 0] + bias_ref[:]
            if semantics == "reference":
                z = jnp.where(mask_ref[:] != 0, z, 0.0)
            else:
                z = jnp.where(mask_ref[:] != 0, z, NEG_CAP)
            col = j * bn + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
            z = jnp.where(col < valid_ref[0, 0], z, NEG_CAP)
            z_ref[:] = z
            zm = jnp.maximum(jnp.max(z, axis=1, keepdims=True), NEG_CAP)
            m_old = m_acc[rows]
            m_new = jnp.maximum(m_old, zm)
            block_sum = jnp.sum(jnp.exp(z - zm), axis=1, keepdims=True)
            s_acc[rows] = (
                s_acc[rows] * jnp.exp(m_old - m_new) + block_sum * jnp.exp(zm - m_new)
            )
            m_acc[rows] = m_new

        @pl.when(jnp.logical_not(active))
        def _():
            # reference: skipped senones keep logit 0 (their stats ride the
            # nskip init); active_only: capped out of the softmax entirely.
            fill = 0.0 if semantics == "reference" else NEG_CAP
            if capped_fill:
                # stats consumers keep the full width (no :out_dim slice),
                # so padding/beyond-valid columns must carry the cap here
                # too or reference-semantics fills would leak exp(0) into
                # padding columns of the assembled output
                col = j * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
                z_ref[:] = jnp.where(
                    col < valid_ref[0, 0], jnp.float32(fill), NEG_CAP
                )
            else:
                # single-device posteriors path: padding columns are never
                # read (the epilogue slices :out_dim), constant fill is fine
                z_ref[:] = jnp.full((bm, bn), fill, jnp.float32)

        @pl.when(j == nj - 1)
        def _():
            m_ref[:] = m_acc[rows]
            s_ref[:] = s_acc[rows]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("out_dim", "semantics", "block_frames", "block_nodes", "interpret"),
)
def output_layer_posteriors_block_sparse(
    acts_i8: jax.Array,
    w_i8: jax.Array,
    colsum128_i32: jax.Array,
    inv_scale_f32: jax.Array,
    bias_f32: jax.Array,
    masks: jax.Array,
    *,
    out_dim: int,
    semantics: str = "reference",
    block_frames: int = 256,
    block_nodes: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Masked output + softmax with all-inactive node blocks SKIPPED.

    Posteriors equal the dense masked kernels (output_layer_posteriors /
    _resident) to softmax reduction-order roundoff; the win scales with
    the fraction of (frame block x node block) tiles whose mask is all
    zero — near nil for random masks, large for real decoder masks with a
    senone-clustering permutation (engine.cluster).  See BENCHMARKS.md
    "block-sparse lazy" for the measured verdict.
    """
    z, m, s = _block_sparse_stats_call(
        acts_i8, w_i8, colsum128_i32, inv_scale_f32, bias_f32, masks,
        valid_count=out_dim, semantics=semantics, block_frames=block_frames,
        block_nodes=block_nodes, interpret=interpret, capped_fill=False,
    )
    p = jnp.exp(z[:, :out_dim] - m[:, :1]) / jnp.maximum(
        s[:, :1], jnp.finfo(jnp.float32).tiny
    )
    # fully-masked active_only rows (running max still at the cap) -> zeros
    return jnp.where(m[:, :1] > -1e29, p, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("semantics", "block_frames", "block_nodes", "interpret"),
)
def output_flash_stats_block_sparse(
    acts_i8: jax.Array,
    w_i8: jax.Array,
    colsum128_i32: jax.Array,
    inv_scale_f32: jax.Array,
    bias_f32: jax.Array,
    masks: jax.Array,
    *,
    valid_count,
    semantics: str = "reference",
    block_frames: int = 256,
    block_nodes: int = 512,
    interpret: bool = False,
):
    """Block-sparse analog of output_layer_flash_stats, for the
    tensor-parallel fused-softmax MASKED path: each model shard runs the
    tile-skipping kernel over its local weight columns and mask slice,
    emitting local logits plus UN-normalized flash stats; the globally
    exact softmax then needs only the tiny stat collectives
    (parallel.sharded._sharded_fused_posteriors).

    `valid_count` is a DYNAMIC int32 scalar — this shard's real senone
    count; under reference semantics each shard's skipped REAL columns
    join its local sum as exp(0)=1 via the nskip init, so psum over
    shards counts every inactive senone exactly once.  Columns at or
    beyond valid_count carry the -1e30 cap even inside skipped-block
    fills (capped_fill): the sharded output keeps the full padded width,
    so a constant reference fill would leak exp(0) into padding columns.

    Returns (z [B, n_local], m [B, 1], s [B, 1]).
    """
    z, m, s = _block_sparse_stats_call(
        acts_i8, w_i8, colsum128_i32, inv_scale_f32, bias_f32, masks,
        valid_count=valid_count, semantics=semantics,
        block_frames=block_frames, block_nodes=block_nodes,
        interpret=interpret, capped_fill=True,
    )
    return z, m[:, :1], s[:, :1]


def _block_sparse_stats_call(
    acts_i8, w_i8, colsum128_i32, inv_scale_f32, bias_f32, masks, *,
    valid_count, semantics, block_frames, block_nodes, interpret, capped_fill,
):
    """Shared plumbing for the tile-skipping masked output kernel: returns
    raw (z [B, n], m [B, LANES], s [B, LANES]).  `valid_count` may be a
    Python int or a traced int32 scalar (the per-shard senone cutoff)."""
    b, k = acts_i8.shape
    n = w_i8.shape[1]
    bm = min(block_frames, b)
    while b % bm:
        bm //= 2
    bn = min(block_nodes, n)
    while n % bn:
        bn //= 2
    _check_shapes(acts_i8, w_i8, colsum128_i32, bias_f32, bm, bn)
    if masks.shape != (b, n):
        raise ValueError(f"masks must be [{b}, {n}], got {masks.shape}")
    ni, nj = b // bm, n // bn
    grid = (nj, ni)  # frames iterate fastest: weight block reused

    # tiny XLA prologue: block activity + skipped-real-column counts
    valid = jnp.asarray(valid_count, jnp.int32)
    mblocks = (masks != 0).reshape(ni, bm, nj, bn)
    act = mblocks.any(axis=(1, 3))  # [ni, nj]
    real_cols = jnp.clip(valid - jnp.arange(nj) * bn, 0, bn)  # [nj]
    nskip = jnp.sum(
        jnp.where(act, 0, real_cols[None, :]), axis=1, dtype=jnp.int32
    )  # [ni]

    in_specs = [
        pl.BlockSpec((bm, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((bm, bn), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # act [nj, ni], whole array
        pl.BlockSpec(memory_space=pltpu.SMEM),  # nskip [ni], whole array
    ]
    last_sweep = lambda j, i: (jnp.where(j == nj - 1, i, 0), 0)
    out_specs = (
        pl.BlockSpec((bm, bn), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, LANES), last_sweep, memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, LANES), last_sweep, memory_space=pltpu.VMEM),
    )
    z, m, s = pl.pallas_call(
        _block_sparse_kernel_factory(bm, bn, semantics, capped_fill),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((b, n), jnp.float32),
            jax.ShapeDtypeStruct((b, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, LANES), jnp.float32),
            pltpu.VMEM((b, LANES), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * k,
            bytes_accessed=b * k + k * n + 4 * b * n,
            transcendentals=b * n,
        ),
        interpret=interpret,
    )(
        acts_i8,
        w_i8,
        colsum128_i32.reshape(1, n),
        bias_f32.reshape(1, n),
        jnp.asarray(inv_scale_f32, jnp.float32).reshape(1, 1),
        valid.reshape(1, 1),
        masks,
        act.T.astype(jnp.int32),
        nskip,
    )
    return z, m, s


def _resident_block_sparse_kernel_factory(
    out_dim: int, semantics: str, nj: int, bn: int
):
    """Resident-weights masked softmax with per-step node-SUB-block
    skipping: the whole [K, N] weight matrix stays in VMEM (as in
    _resident_softmax_kernel_factory) and each frame-block step runs an
    UNROLLED loop of nj sub-block matmuls, each guarded by
    `pl.when(mask sub-block has any active senone)`.  Skipped sub-blocks
    write their softmax fill (0 logits under reference semantics, the cap
    under active_only) straight into the VMEM z scratch — so unlike the
    stats-based block-sparse kernel there is NO logits HBM round-trip at
    all: the only HBM writes are the final posteriors, and the win is the
    skipped MXU work itself."""

    def kernel(x_ref, w_ref, colsum_ref, bias_ref, inv_ref, mask_ref,
               act_ref, p_ref, z_scr):
        i = pl.program_id(0)
        NEG_CAP = jnp.float32(-1e30)
        fill = jnp.float32(0.0 if semantics == "reference" else -1e30)
        for j in range(nj):  # static unroll: each sub-block is predicated
            cols = slice(j * bn, (j + 1) * bn)

            @pl.when(act_ref[j, i] != 0)
            def _(j=j, cols=cols):
                acc = jnp.dot(
                    x_ref[:], w_ref[:, cols], preferred_element_type=jnp.int32
                )
                z = (acc + colsum_ref[:, cols]).astype(jnp.float32) * inv_ref[0, 0] \
                    + bias_ref[:, cols]
                if semantics == "reference":
                    z = jnp.where(mask_ref[:, cols] != 0, z, 0.0)
                else:
                    z = jnp.where(mask_ref[:, cols] != 0, z, NEG_CAP)
                col = j * bn + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
                z_scr[:, cols] = jnp.where(col < out_dim, z, NEG_CAP)

            @pl.when(act_ref[j, i] == 0)
            def _(j=j, cols=cols):
                col = j * bn + jax.lax.broadcasted_iota(
                    jnp.int32, (z_scr.shape[0], bn), 1
                )
                z_scr[:, cols] = jnp.where(col < out_dim, fill, NEG_CAP)

        z = z_scr[:]
        m = jnp.max(z, axis=1, keepdims=True)
        e = jnp.exp(z - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        p = jnp.where(m > jnp.float32(-1e29), p, 0.0)
        p_ref[:] = p[:, :out_dim]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("out_dim", "semantics", "block_frames", "block_nodes", "interpret"),
)
def output_layer_posteriors_resident_block_sparse(
    acts_i8: jax.Array,
    w_i8: jax.Array,
    colsum128_i32: jax.Array,
    inv_scale_f32: jax.Array,
    bias_f32: jax.Array,
    masks: jax.Array,
    *,
    out_dim: int,
    semantics: str = "reference",
    block_frames: int = 256,
    block_nodes: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Masked resident softmax with node-sub-block skipping -> [B, out_dim].

    block_nodes here is the SKIP granularity (the unrolled sub-block
    width), not a grid dimension.  Equal to the dense resident kernel's
    posteriors up to softmax reduction-order roundoff.
    """
    b, k = acts_i8.shape
    n = w_i8.shape[1]
    bm = min(block_frames, b)
    while b % bm:
        bm //= 2
    bn = min(block_nodes, n)
    while n % bn:
        bn //= 2
    _check_shapes(acts_i8, w_i8, colsum128_i32, bias_f32, bm, n)
    if masks.shape != (b, n):
        raise ValueError(f"masks must be [{b}, {n}], got {masks.shape}")
    ni, nj = b // bm, n // bn
    mblocks = (masks != 0).reshape(ni, bm, nj, bn)
    act = mblocks.any(axis=(1, 3)).T.astype(jnp.int32)  # [nj, ni]

    in_specs = [
        pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # act [nj, ni]
    ]
    vmem_budget = k * n + 2 * bm * k + 2 * 4 * bm * n + 2 * bm * n + 4 * bm * n + (1 << 22)
    return pl.pallas_call(
        _resident_block_sparse_kernel_factory(out_dim, semantics, nj, bn),
        grid=(ni,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_dim), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_budget * 1.25), 100 * 1024 * 1024)
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * k,
            bytes_accessed=b * k + k * n + 4 * b * out_dim,
            transcendentals=b * n,
        ),
        interpret=interpret,
    )(
        acts_i8,
        w_i8,
        colsum128_i32.reshape(1, n),
        bias_f32.reshape(1, n),
        jnp.asarray(inv_scale_f32, jnp.float32).reshape(1, 1),
        masks,
        act,
    )


@functools.partial(jax.jit, static_argnames=("block_frames", "block_nodes", "interpret"))
def output_layer_logits(
    acts_i8: jax.Array,
    w_i8: jax.Array,
    colsum128_i32: jax.Array,
    inv_scale_f32: jax.Array,
    bias_f32: jax.Array,
    *,
    block_frames: int = 256,
    block_nodes: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Output layer pre-softmax logits f32 [B, N] on the MXU."""
    return _layer_call(
        _logits_kernel,
        jnp.float32,
        acts_i8,
        w_i8,
        colsum128_i32,
        bias_f32,
        jnp.asarray(inv_scale_f32, jnp.float32),
        block_frames=block_frames,
        block_nodes=block_nodes,
        interpret=interpret,
    )

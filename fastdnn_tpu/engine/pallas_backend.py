"""Thin adapter from the engine's layer-step signatures to the Pallas
kernels (fastdnn_tpu/ops/pallas_kernels.py).  Keeping this indirection means
scorer.py stays backend-agnostic and the XLA path never imports Pallas."""

from __future__ import annotations

import jax

from ..ops import pallas_kernels as pk


def hidden_layer_step(
    acts_i8: jax.Array,
    w_i8: jax.Array,
    colsum128_i32: jax.Array,
    inv_scale_f32: jax.Array,
    bias_f32: jax.Array,
    *,
    interpret: bool = False,
    block_frames: int = 1024,
    block_nodes: int = 1024,
    packed: bool = False,
) -> jax.Array:
    return pk.fused_hidden_layer(
        acts_i8,
        w_i8,
        colsum128_i32,
        inv_scale_f32,
        bias_f32,
        block_frames=block_frames,
        block_nodes=block_nodes,
        interpret=interpret,
        packed=packed,
    )


def output_logits(
    acts_i8: jax.Array,
    w_i8: jax.Array,
    colsum128_i32: jax.Array,
    inv_scale_f32: jax.Array,
    bias_f32: jax.Array,
    *,
    interpret: bool = False,
    block_frames: int = 256,
    block_nodes: int = 1024,
) -> jax.Array:
    return pk.output_layer_logits(
        acts_i8,
        w_i8,
        colsum128_i32,
        inv_scale_f32,
        bias_f32,
        block_frames=block_frames,
        block_nodes=block_nodes,
        interpret=interpret,
    )


def output_posteriors(
    acts_i8: jax.Array,
    w_i8: jax.Array,
    colsum128_i32: jax.Array,
    inv_scale_f32: jax.Array,
    bias_f32: jax.Array,
    masks: jax.Array | None,
    *,
    out_dim: int,
    semantics: str = "reference",
    interpret: bool = False,
    fast: bool = False,
    block_frames: int = 512,
    block_nodes: int = 512,
) -> jax.Array:
    """Fused output matmul + (optional mask) + softmax -> [B, out_dim]."""
    return pk.output_layer_posteriors(
        acts_i8,
        w_i8,
        colsum128_i32,
        inv_scale_f32,
        bias_f32,
        masks,
        out_dim=out_dim,
        semantics=semantics,
        interpret=interpret,
        fast=fast,
        block_frames=block_frames,
        block_nodes=block_nodes,
    )


def output_flash_stats(
    acts_i8: jax.Array,
    w_i8: jax.Array,
    colsum128_i32: jax.Array,
    inv_scale_f32: jax.Array,
    bias_f32: jax.Array,
    masks: jax.Array | None,
    *,
    valid_count,
    semantics: str = "reference",
    interpret: bool = False,
    block_frames: int = 512,
    block_nodes: int = 512,
):
    """Local logits + un-normalized flash softmax stats (z, m, s) — the
    kernel half of the tensor-parallel fused softmax (valid_count is the
    dynamic per-shard real-senone cutoff)."""
    return pk.output_layer_flash_stats(
        acts_i8,
        w_i8,
        colsum128_i32,
        inv_scale_f32,
        bias_f32,
        masks,
        valid_count=valid_count,
        semantics=semantics,
        interpret=interpret,
        block_frames=block_frames,
        block_nodes=block_nodes,
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
    interpret: bool = False,
    block_frames: int = 256,
    block_nodes: int = 512,
):
    """output_flash_stats with all-inactive (frame x node) tiles SKIPPED —
    the kernel half of the tensor-parallel fused softmax for the
    block-sparse lazy path (valid_count is the dynamic per-shard
    real-senone cutoff)."""
    return pk.output_flash_stats_block_sparse(
        acts_i8,
        w_i8,
        colsum128_i32,
        inv_scale_f32,
        bias_f32,
        masks,
        valid_count=valid_count,
        semantics=semantics,
        interpret=interpret,
        block_frames=block_frames,
        block_nodes=block_nodes,
    )


def hidden_stack_step(
    acts_i8: jax.Array,
    hstack,
    *,
    interpret: bool = False,
    resident: bool = False,
) -> jax.Array:
    """All hidden layers in one kernel (small-batch latency path).

    hstack = (w_stack, colsum_stack, inv_scales, bias_stack) as built by
    engine.scorer.build_hidden_stack.  `resident=True` keeps the whole
    weight stack in VMEM (experimental: measured neutral vs streaming on
    v5e at batch; exposed for other chips/topologies).
    """
    w, cs, inv, bias = hstack
    return pk.fused_hidden_stack(
        acts_i8, w, cs, inv, bias, interpret=interpret, resident=resident
    )


def output_posteriors_block_sparse(
    acts_i8: jax.Array,
    w_i8: jax.Array,
    colsum128_i32: jax.Array,
    inv_scale_f32: jax.Array,
    bias_f32: jax.Array,
    masks: jax.Array,
    *,
    out_dim: int,
    semantics: str = "reference",
    interpret: bool = False,
    resident: bool = True,
    block_frames: int = 256,
    block_nodes: int = 512,
) -> jax.Array:
    """Masked output + softmax skipping all-inactive (frame x node) tiles.

    resident=True keeps the whole weight matrix in VMEM (sub-block skip,
    no logits HBM round-trip); False uses the stats-based grid kernel for
    output layers too large for residency.  Posteriors are f32 (no `fast`
    variant: the win is skipped work, not bandwidth)."""
    fn = (
        pk.output_layer_posteriors_resident_block_sparse
        if resident
        else pk.output_layer_posteriors_block_sparse
    )
    return fn(
        acts_i8,
        w_i8,
        colsum128_i32,
        inv_scale_f32,
        bias_f32,
        masks,
        out_dim=out_dim,
        semantics=semantics,
        interpret=interpret,
        block_frames=block_frames,
        block_nodes=block_nodes,
    )


def output_posteriors_resident(
    acts_i8: jax.Array,
    w_i8: jax.Array,
    colsum128_i32: jax.Array,
    inv_scale_f32: jax.Array,
    bias_f32: jax.Array,
    masks: jax.Array | None,
    *,
    out_dim: int,
    semantics: str = "reference",
    interpret: bool = False,
    fast: bool = False,
    block_frames: int = 256,
) -> jax.Array:
    """One-kernel output + full softmax with VMEM-resident weights."""
    return pk.output_layer_posteriors_resident(
        acts_i8,
        w_i8,
        colsum128_i32,
        inv_scale_f32,
        bias_f32,
        masks,
        out_dim=out_dim,
        semantics=semantics,
        interpret=interpret,
        fast=fast,
        block_frames=block_frames,
    )

"""Senone-clustering permutation for the block-sparse lazy kernels.

The block-sparse masked output kernels (ops.pallas_kernels
.output_layer_posteriors[_resident]_block_sparse) skip a (frame block x
node block) tile only when EVERY mask entry in it is zero.  Real decoder
masks are sparse (0.03-0.10 density, BENCHMARKS.md) but senone ids are
scattered, so random-id masks almost never zero out a whole 128+-wide
node block.  The fix is a static relabeling: order senones so ids that
are active TOGETHER sit in the same block.

`mask_cluster_permutation` derives that order from a sample of real mask
trajectories: senones are sorted by the mean frame index at which they
fire (never-active senones go last).  Beam-search activity is temporally
coherent — a senone's active frames cluster around where its words sit in
the beam — so mean-time ordering groups co-active senones and the
all-zero tile fraction rises sharply (BENCHMARKS.md "block-sparse lazy"
tracks the on-TPU verdict; the tile-fraction effect itself is asserted in
tests/test_kernels.py::test_clustering_raises_zero_tile_fraction).

Deployment model: permute the MODEL once at load time
(`permute_output_layer`), feed the decoder permuted posteriors, and
translate the decoder's senone ids once (`Lexicon` words are senone-id
tuples — map them through the permutation) — NOT per-call posterior
gathers, which would cost a full [B, out] HBM round-trip.  The reference
has no analog; its lazy path skips per senone on a CPU where gather
granularity is one float (dnn.cc:355-392).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..quant.quantize import QuantizedNet


def mask_cluster_permutation(masks: np.ndarray) -> np.ndarray:
    """Permutation `perm` (new position -> old senone id) clustering
    co-active senones, from sample mask trajectories [frames, out]."""
    m = np.asarray(masks) != 0
    counts = m.sum(axis=0)
    t = np.arange(m.shape[0], dtype=np.float64)[:, None]
    mean_t = (m * t).sum(axis=0) / np.maximum(counts, 1)
    key = np.where(counts > 0, mean_t, np.inf)
    return np.argsort(key, kind="stable").astype(np.int32)


def inverse_permutation(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0], dtype=perm.dtype)
    return inv


def permute_output_layer(qnet: QuantizedNet, perm: np.ndarray) -> QuantizedNet:
    """New QuantizedNet whose output-layer columns are reordered by `perm`
    (length = true output dim; MXU padding columns stay in place).
    Posteriors of the permuted net satisfy p_new[:, i] == p_old[:, perm[i]].
    """
    import jax.numpy as jnp

    perm = np.asarray(perm)
    out = qnet.output_dim
    if perm.shape != (out,) or sorted(perm.tolist()) != list(range(out)):
        raise ValueError(f"perm must be a permutation of range({out})")
    n_pad = qnet.weights[-1].shape[1]
    full = np.concatenate([perm, np.arange(out, n_pad)]).astype(np.int32)
    idx = jnp.asarray(full)
    return dataclasses.replace(
        qnet,
        weights=qnet.weights[:-1] + (jnp.take(qnet.weights[-1], idx, axis=1),),
        colsum128=qnet.colsum128[:-1] + (jnp.take(qnet.colsum128[-1], idx),),
        biases=qnet.biases[:-1] + (jnp.take(qnet.biases[-1], idx),),
    )

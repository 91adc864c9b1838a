"""Scoring engine: jitted end-to-end forward passes over a QuantizedNet.

Replaces the reference's CalculationContext + JNI + Java API layers
(SURVEY.md §2 #8, #15, #16) with three jitted programs:

  * `score(frames)`            — full posteriors, like QuantizedDnn.calculate
                                 (/root/reference/src/java/suskun/nn/
                                 QuantizedDnn.java:149-167)
  * `score_masked(frames, masks)` — the whole lazy path in ONE device call:
                                 the reference crosses JNI once per frame
                                 (README.md:45); here masks are a
                                 [frames, out] array and the masked output
                                 layer runs batched on the MXU
  * `LazyContext`              — API-parity shim over score_masked for
                                 decoders that feed masks frame by frame
                                 (QuantizedDnn.java:72-107)

There is no per-call mutable context: XLA owns all buffers, so one Scorer is
trivially shareable across threads (the reference needs a per-call
CalculationContext to be thread-safe, MultiThreadedStressTest.java:48-61).

Frame counts are bucketed (padded up to `config.frame_bucket`) so streaming
workloads hit a small set of compiled shapes — jit-friendly static shapes
instead of the reference's arbitrary-length batch loops.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..ops import matmul as xops
from ..quant.quantize import QuantizedNet
from ..utils.align import aligned_size

#: the stats-based fused-softmax kernel keeps two [B, 128] f32 scratches in
#: VMEM for the whole grid; past 8192 frames they exceed its VMEM budget, so
#: larger batches are row-chunked (exact: softmax is per-row).
MAX_FUSED_SOFTMAX_FRAMES = 8192

#: the resident output kernel holds the whole [K, N] int8 output weight
#: matrix in VMEM (plus two f32 [bm, N] working sets); beyond this weight
#: size fall back to the node-blocked stats kernel + normalize pass.
RESIDENT_OUTPUT_MAX_BYTES = 48 * 1024 * 1024


def _default_platform() -> str:
    return jax.devices()[0].platform


def build_hidden_stack(net: QuantizedNet):
    """Stack the equal-width hidden layers for the one-kernel latency path
    (ops.pallas_kernels.fused_hidden_stack).  Returns None when the topology
    has < 2 hidden layers or unequal/non-square widths."""
    hw = net.weights[:-1]
    if len(hw) < 2:
        return None
    shape = hw[0].shape
    if shape[0] != shape[1] or any(w.shape != shape for w in hw):
        return None
    return (
        jnp.stack(hw),
        jnp.stack(net.colsum128[:-1]),
        jnp.stack([jnp.asarray(s, jnp.float32) for s in net.inv_scales[:-1]]),
        jnp.stack(net.biases[:-1]),
    )


def hidden_forward(
    net: QuantizedNet,
    frames: jax.Array,
    backend: str,
    interpret: bool,
    input_precision: str = "high",
    hstack=None,
    stack_max_frames: int = 0,
    hidden_blocks=None,
):
    """Input layer + all hidden layers -> shifted-int8 activations [B, H].

    Equivalent of CalculateUntilLastHiddenLayer (/root/reference/src/cpp/
    dnn.cc:402-424), minus the in-place shift/scale (fused at quantize time).

    When `hstack` (see build_hidden_stack) is given and the frame count is
    within stack_max_frames, all hidden layers run as ONE Pallas kernel —
    the small-batch latency path.
    """
    acts = xops.input_layer_step(frames, net.input_w, net.input_b, input_precision)
    if backend == "pallas":
        from . import pallas_backend  # local import: TPU-only dependency path

        if hstack is not None and frames.shape[0] <= stack_max_frames:
            return pallas_backend.hidden_stack_step(acts, hstack, interpret=interpret)
        bkw = {}
        if hidden_blocks is not None:
            bkw = dict(block_frames=hidden_blocks[0], block_nodes=hidden_blocks[1])
        for i in range(len(net.weights) - 1):
            # packed-nibble int4 weights are [K/2, N] (pack_int4_trunk)
            packed = (
                net.packed_int4
                and net.weights[i].shape[0] * 2 == acts.shape[-1]
            )
            acts = pallas_backend.hidden_layer_step(
                acts,
                net.weights[i],
                net.colsum128[i],
                net.inv_scales[i],
                net.biases[i],
                interpret=interpret,
                packed=packed,
                **bkw,
            )
    else:
        for i in range(len(net.weights) - 1):
            step = xops.hidden_layer_step
            if net.packed_int4 and net.weights[i].shape[0] * 2 == acts.shape[-1]:
                step = xops.hidden_layer_step_packed
            acts = step(
                acts, net.weights[i], net.colsum128[i], net.inv_scales[i], net.biases[i]
            )
    return acts


def output_logits(
    net: QuantizedNet, acts: jax.Array, backend: str, interpret: bool, out_blocks=None
):
    if backend == "pallas":
        from . import pallas_backend

        bkw = {}
        if out_blocks is not None:
            bkw = dict(block_frames=out_blocks[0], block_nodes=out_blocks[1])
        return pallas_backend.output_logits(
            acts,
            net.weights[-1],
            net.colsum128[-1],
            net.inv_scales[-1],
            net.biases[-1],
            interpret=interpret,
            **bkw,
        )
    return xops.output_logits(
        acts, net.weights[-1], net.colsum128[-1], net.inv_scales[-1], net.biases[-1]
    )


def uses_resident_output(
    net: QuantizedNet, block_frames_out: int = 256, *, block_sparse: bool = False
) -> bool:
    """True when _fused_posteriors selects the one-kernel RESIDENT softmax,
    i.e. posteriors come out of a single opaque pallas_call whose execution
    XLA can neither dead-code nor narrow.  bench.py keys its feedback-chain
    liveness strategy off this (an XLA-visible normalize epilogue, as in the
    stats fallback, could be narrowed to the consumed columns and
    under-charge posterior materialization).

    Mirrors the kernel's own VMEM budget (weights + double-buffered
    activation/posterior/mask blocks + slack, x1.25): if it would not fit
    under the 100 MB clamp the kernel requests, the stats fallback runs
    instead of tripping a Mosaic scoped-vmem compile error.  The resident
    BLOCK-SPARSE kernel additionally keeps a [bm, n] f32 logits scratch
    (pallas_kernels.output_layer_posteriors_resident_block_sparse), so its
    gate must charge those 4*bm*n bytes too.
    """
    k, n = net.weights[-1].shape
    working_set = (
        k * n + 2 * block_frames_out * k + 10 * block_frames_out * n + (1 << 22)
    )
    if block_sparse:
        working_set += 4 * block_frames_out * n
    return (
        k * n <= RESIDENT_OUTPUT_MAX_BYTES
        and working_set * 1.25 <= 100 * 1024 * 1024
    )


def _fused_posteriors(
    net, acts, masks, *, out_dim, semantics, interpret, fast, out_blocks=None,
    block_sparse=False,
):
    """Fused output + softmax, picking the best kernel for the net size.

    Primary: the RESIDENT kernel — the whole output weight matrix lives in
    VMEM, the softmax completes in one pass (no stats side channels, no
    normalize read), and it works at any batch size.  Fallback for output
    weights too big for VMEM: the node-blocked stats kernel + one-read
    normalize, row-chunked past its [B, 128]-scratch cap
    (MAX_FUSED_SOFTMAX_FRAMES; softmax is per-row, so chunking is exact).

    block_sparse (masked calls only): use the tile-skipping lazy kernels —
    all-inactive (frame x node) tiles skip their matmul + stats work.
    Same resident/stats split; posteriors stay f32 (no `fast` variant).
    """
    from . import pallas_backend

    resident_ok = uses_resident_output(
        net,
        out_blocks[0] if out_blocks is not None else 256,
        block_sparse=block_sparse and masks is not None,
    )
    if block_sparse and masks is not None:
        bkw = {}
        if out_blocks is not None:
            bkw = dict(block_frames=out_blocks[0], block_nodes=out_blocks[1])

        def one_bs(a, m):
            return pallas_backend.output_posteriors_block_sparse(
                a,
                net.weights[-1],
                net.colsum128[-1],
                net.inv_scales[-1],
                net.biases[-1],
                m,
                out_dim=out_dim,
                semantics=semantics,
                interpret=interpret,
                resident=resident_ok,
                **bkw,
            )

        b = acts.shape[0]
        if resident_ok or b <= MAX_FUSED_SOFTMAX_FRAMES:
            return one_bs(acts, masks)
        # stats variant: same [B, 128] scratch cap as the dense stats kernel
        return jnp.concatenate(
            [
                one_bs(
                    acts[lo : lo + MAX_FUSED_SOFTMAX_FRAMES],
                    masks[lo : lo + MAX_FUSED_SOFTMAX_FRAMES],
                )
                for lo in range(0, b, MAX_FUSED_SOFTMAX_FRAMES)
            ],
            axis=0,
        )

    if resident_ok:
        return pallas_backend.output_posteriors_resident(
            acts,
            net.weights[-1],
            net.colsum128[-1],
            net.inv_scales[-1],
            net.biases[-1],
            masks,
            out_dim=out_dim,
            semantics=semantics,
            interpret=interpret,
            fast=fast,
            block_frames=out_blocks[0] if out_blocks is not None else 256,
        )

    bkw = {}
    if out_blocks is not None:
        bkw = dict(block_frames=out_blocks[0], block_nodes=out_blocks[1])

    def one(a, m):
        return pallas_backend.output_posteriors(
            a,
            net.weights[-1],
            net.colsum128[-1],
            net.inv_scales[-1],
            net.biases[-1],
            m,
            out_dim=out_dim,
            semantics=semantics,
            interpret=interpret,
            fast=fast,
            **bkw,
        )

    b = acts.shape[0]
    if b <= MAX_FUSED_SOFTMAX_FRAMES:
        return one(acts, masks)
    chunks = []
    for lo in range(0, b, MAX_FUSED_SOFTMAX_FRAMES):
        hi = min(lo + MAX_FUSED_SOFTMAX_FRAMES, b)
        chunks.append(one(acts[lo:hi], masks[lo:hi] if masks is not None else None))
    return jnp.concatenate(chunks, axis=0)


def score_fn(
    net: QuantizedNet,
    frames: jax.Array,
    *,
    backend: str = "xla",
    interpret: bool = False,
    out_dim: Optional[int] = None,
    fused_softmax: bool = False,
    input_precision: str = "high",
    fast_posteriors: bool = False,
    hstack=None,
    stack_max_frames: int = 0,
    hidden_blocks=None,
    out_blocks=None,
):
    """Full forward pass -> posteriors f32 [B, out].  Jittable.

    `out_dim` slices away MXU padding columns (pad_qnet_for_tpu) before the
    softmax — padded logits are exactly 0.0 and must not join the denominator.
    Defaults to the net's own true senone count (QuantizedNet.output_dim,
    static metadata set by pad_qnet_for_tpu), so padded nets are safe without
    callers threading the count through.
    """
    if out_dim is None:
        out_dim = net.output_dim
    acts = hidden_forward(
        net, frames, backend, interpret, input_precision, hstack, stack_max_frames,
        hidden_blocks,
    )
    if backend == "pallas" and fused_softmax:
        return _fused_posteriors(
            net,
            acts,
            None,
            out_dim=out_dim,
            semantics="reference",
            interpret=interpret,
            fast=fast_posteriors,
            out_blocks=out_blocks,
        )
    logits = output_logits(net, acts, backend, interpret, out_blocks)
    if out_dim != logits.shape[-1]:
        logits = logits[:, :out_dim]
    return jax.nn.softmax(logits, axis=-1)


def score_masked_fn(
    net: QuantizedNet,
    frames: jax.Array,
    masks: jax.Array,
    *,
    backend: str = "xla",
    interpret: bool = False,
    semantics: str = "reference",
    out_dim: Optional[int] = None,
    fused_softmax: bool = False,
    input_precision: str = "high",
    fast_posteriors: bool = False,
    hstack=None,
    stack_max_frames: int = 0,
    hidden_blocks=None,
    out_blocks=None,
    block_sparse: bool = False,
):
    """Lazy/masked forward pass -> posteriors f32 [B, out].  Jittable.

    masks: [B, out], nonzero = senone active for that frame (the reference's
    byte mask, /root/reference/src/java/suskun/nn/QuantizedDnn.java:88-93).
    block_sparse selects the tile-skipping lazy kernels (pallas +
    fused_softmax only; see config.lazy_mode="block_sparse").
    """
    if out_dim is None:
        out_dim = net.output_dim
    acts = hidden_forward(
        net, frames, backend, interpret, input_precision, hstack, stack_max_frames,
        hidden_blocks,
    )
    if backend == "pallas" and fused_softmax:
        # masks are [B, out_dim]; pad to the MXU-padded width (padded
        # columns are masked out in-kernel via the out_dim cutoff anyway)
        n_pad = net.weights[-1].shape[1]
        if masks.shape[-1] != n_pad:
            masks = jnp.pad(masks, ((0, 0), (0, n_pad - masks.shape[-1])))
        return _fused_posteriors(
            net,
            acts,
            masks,
            out_dim=out_dim,
            semantics=semantics,
            interpret=interpret,
            fast=fast_posteriors,
            out_blocks=out_blocks,
            block_sparse=block_sparse,
        )
    logits = output_logits(net, acts, backend, interpret, out_blocks)
    if out_dim != logits.shape[-1]:
        logits = logits[:, :out_dim]
    mask_bool = masks != 0
    if semantics == "reference":
        return xops.masked_softmax_reference(logits, mask_bool)
    return xops.masked_softmax_active_only(logits, mask_bool)


class Scorer:
    """User-facing engine around one immutable QuantizedNet.

    Thread-safe by construction: all state is immutable; jitted executables
    are cached per input shape.

    `mesh` (a jax.sharding.Mesh with axes ("data", "model"), see
    parallel.mesh.make_mesh) turns the same API multi-chip: frames are
    data-parallel, the output layer is tensor-parallel, and every public
    method — score / score_masked / score_utterances / LazyContext —
    produces posteriors equal to the single-device engine.  The sharded
    programs run the configured kernel stack per shard under shard_map with
    explicit pmax/psum softmax collectives (parallel.sharded
    .make_mesh_programs), so the Pallas kernels never force weight gathers.
    The gathered small-batch lazy path is single-device only (its
    host-side union indexing does not shard); lazy_mode="auto" degrades to
    dense under a mesh.
    """

    def __init__(
        self,
        net: QuantizedNet,
        config: Optional[EngineConfig] = None,
        mesh=None,
    ):
        self.config = config or EngineConfig()
        self.mesh = mesh
        self._backend = self.config.resolve_backend(_default_platform())
        if (
            self._backend == "pallas"
            and self.config.autotuned
            and jax.process_count() == 1
        ):
            from ..tuning import apply_tuned

            # measured block sizes for this (net topology, device kind)
            # replace hand-default block knobs; explicit knobs win.  Skipped
            # on multi-process pods: the registry file is per-host state, and
            # hosts resolving different knobs would compile mismatched
            # lockstep programs — pod deployments set block knobs explicitly.
            self.config = apply_tuned(
                self.config, net, jax.devices()[0].device_kind
            )
        self._output_dim = net.output_dim
        self._input_dim = net.input_dim
        if self.config.lazy_mode == "block_sparse" and not (
            self._backend == "pallas" and self.config.fused_softmax
        ):
            raise ValueError(
                "lazy_mode='block_sparse' needs backend='pallas' (or 'auto' "
                "on TPU) with fused_softmax=True — the tile-skipping lives "
                "inside the fused masked kernels"
            )
        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

            self._data_size = mesh.shape[DATA_AXIS]
            model_size = mesh.shape[MODEL_AXIS]
            if self.config.lazy_mode == "gathered":
                raise ValueError(
                    "lazy_mode='gathered' is single-device only; use "
                    "'dense', 'block_sparse', or 'auto' with a mesh"
                )
        else:
            self._data_size = 1
            model_size = 1
        if self._backend == "pallas":
            import math

            from ..quant.quantize import pad_qnet_for_tpu

            # output width must tile the MXU (x1024) AND split evenly over
            # the model axis into x128 local shards
            net = pad_qnet_for_tpu(net, out_lanes=math.lcm(1024, 128 * model_size))
        elif model_size > 1 and net.padded_output_dim % model_size:
            from ..quant.quantize import pad_qnet_for_tpu

            # XLA backend only needs even model-axis shards
            net = pad_qnet_for_tpu(net, lanes=1, out_lanes=model_size)
        if self.config.int4_packed:
            from ..quant.quantize import pack_int4_trunk

            # AFTER padding: packing first would split the nibble halves
            # at the wrong (unpadded) K
            net = pack_int4_trunk(net)
        if mesh is not None:
            from ..parallel.mesh import shard_qnet

            net = shard_qnet(net, mesh)
        else:
            # Commit the weights to the device ONCE: quantize/pack/pad run in
            # host numpy (quant.quantize INT4 note), and a numpy leaf passed
            # as a jit argument would re-upload on every call.  On runtimes
            # without native-s4 transport (axon) this is also where an
            # unpacked int4 net fails — contained here, at construction,
            # instead of at the first score() (int4_packed=True avoids it).
            net = jax.device_put(net)
        self.net = net
        hstack = None
        if (
            mesh is None
            and self._backend == "pallas"
            and self.config.stack_hidden_max_frames > 0
        ):
            # the stacked-hidden kernel closes over the weight stack, which
            # shard_map cannot capture; mesh scoring uses per-layer kernels
            hstack = build_hidden_stack(net)
        kw = dict(
            backend=self._backend,
            interpret=self.config.interpret,
            out_dim=self._output_dim,
            fused_softmax=self.config.fused_softmax,
            input_precision=self.config.input_precision,
            fast_posteriors=self.config.fast_posteriors,
            hstack=hstack,
            stack_max_frames=self.config.stack_hidden_max_frames,
            hidden_blocks=(self.config.block_frames, self.config.block_nodes_hidden),
            out_blocks=(self.config.block_frames_out, self.config.block_nodes_out),
        )
        if mesh is not None:
            from ..parallel.sharded import make_mesh_programs

            (
                self._score,
                self._score_masked,
                self._hidden,
                self._masked_from_acts,
            ) = make_mesh_programs(
                mesh,
                n_layers=len(net.weights),
                out_dim=self._output_dim,
                semantics=self.config.lazy_semantics,
                backend=self._backend,
                interpret=self.config.interpret,
                fused_softmax=self.config.fused_softmax,
                input_precision=self.config.input_precision,
                fast_posteriors=self.config.fast_posteriors,
                hidden_blocks=kw["hidden_blocks"],
                out_blocks=kw["out_blocks"],
                true_output_dim=net.true_output_dim,
                block_sparse=self.config.lazy_mode == "block_sparse",
                packed_int4=net.packed_int4,
            )
            self._gathered = None
            self._gather_capacity = 0
            return
        # Pin the posteriors' entry layout to row-major: with the unaligned
        # true senone count (e.g. 8000), XLA's layout assignment otherwise
        # picks a column-major program output and inserts a full transpose
        # copy of the result (~0.8 ms per 8192-frame batch on v5e).
        jit_kw = {}
        if self._backend == "pallas" and not self.config.interpret:
            try:
                import jax.experimental.layout as jl

                jit_kw["out_shardings"] = jl.Format(
                    jl.Layout(major_to_minor=(0, 1)),
                    jax.sharding.SingleDeviceSharding(jax.devices()[0]),
                )
            except Exception:  # pragma: no cover - layout API drift
                jit_kw = {}
        # (block_sparse preconditions were validated once at __init__ top)
        block_sparse = self.config.lazy_mode == "block_sparse"
        self._score = jax.jit(functools.partial(score_fn, **kw), **jit_kw)
        self._score_masked = jax.jit(
            functools.partial(
                score_masked_fn,
                semantics=self.config.lazy_semantics,
                block_sparse=block_sparse,
                **kw,
            ),
            **jit_kw,
        )
        self._hidden = jax.jit(
            functools.partial(
                hidden_forward,
                backend=self._backend,
                interpret=self.config.interpret,
                input_precision=self.config.input_precision,
                hstack=hstack,
                stack_max_frames=self.config.stack_hidden_max_frames,
                hidden_blocks=(self.config.block_frames, self.config.block_nodes_hidden),
            )
        )
        self._masked_from_acts = jax.jit(
            functools.partial(self._masked_from_acts_fn, **kw, semantics=self.config.lazy_semantics)
        )
        self._gather_capacity = min(
            aligned_size(max(int(self._output_dim * self.config.lazy_capacity), 1), 128),
            self._output_dim,
        )
        from . import lazy as _lazy

        self._gathered = jax.jit(
            functools.partial(
                _lazy.gathered_output_posteriors,
                out_dim=self._output_dim,
                semantics=self.config.lazy_semantics,
            )
        )

    @staticmethod
    def _masked_from_acts_fn(
        net,
        acts,
        masks,
        *,
        backend,
        interpret,
        semantics,
        out_dim,
        fused_softmax=False,
        input_precision="high",  # unused: acts are already computed
        fast_posteriors=False,  # plain-logits path stays f32
        hstack=None,  # unused: acts are already computed
        stack_max_frames=0,
        hidden_blocks=None,  # unused: acts are already computed
        out_blocks=None,
    ):
        n = acts.shape[0]
        if backend == "pallas" and n % 32:
            # pallas kernels need B % 32 == 0; LazyContext scores single rows
            pad = 32 - n % 32
            acts = jnp.pad(acts, ((0, pad), (0, 0)))
        logits = output_logits(net, acts, backend, interpret, out_blocks)[:n]
        if out_dim != logits.shape[-1]:
            logits = logits[:, :out_dim]
        mask_bool = masks != 0
        if semantics == "reference":
            return xops.masked_softmax_reference(logits, mask_bool)
        return xops.masked_softmax_active_only(logits, mask_bool)

    # -- helpers ------------------------------------------------------------

    @property
    def input_dim(self) -> int:
        return self._input_dim

    @property
    def output_dim(self) -> int:
        """True (unpadded) senone count."""
        return self._output_dim

    def _prepare(self, frames) -> tuple[jax.Array, int]:
        """Validate dims, pad feature dim with zeros and bucket the frame
        count to a compiled shape.  Returns (padded frames, true count)."""
        frames = jnp.asarray(frames, dtype=jnp.float32)
        if frames.ndim != 2:
            raise ValueError(f"frames must be [n, dim], got shape {frames.shape}")
        n, dim = frames.shape
        if dim > self.input_dim:
            raise ValueError(
                f"input vector size {dim} must be <= network input size {self.input_dim}"
            )
        if dim < self.net.input_dim:  # zero-pad like the x4 alignment path
            frames = jnp.pad(frames, ((0, 0), (0, self.net.input_dim - dim)))
        # under a mesh every data shard must still get a full jit bucket
        bucket = aligned_size(max(n, 1), self.config.frame_bucket * self._data_size)
        if bucket != n:
            frames = jnp.pad(frames, ((0, bucket - n), (0, 0)))
        return frames, n

    def _pad_masks(self, masks, pad_n: int) -> np.ndarray:
        """[n, output_dim] host masks -> the width the masked program wants
        (the padded output width under a mesh; extra columns are inactive
        and excluded from the softmax as MXU padding anyway)."""
        width = self.net.padded_output_dim if self.mesh is not None else self._output_dim
        out = np.zeros((pad_n, width), dtype=np.uint8)
        out[: masks.shape[0], : self._output_dim] = masks != 0
        return out

    def _finish(self, out, n: int) -> np.ndarray:
        """Device posteriors -> host [n, output_dim] f32 (slices away frame
        bucketing and, under a model-sharded mesh, MXU padding columns)."""
        arr = np.asarray(out[:n], dtype=np.float32)
        if arr.shape[1] != self._output_dim:
            arr = arr[:, : self._output_dim]
        return arr

    # -- public API ----------------------------------------------------------

    def score(self, frames) -> np.ndarray:
        """Posteriors f32 [n, out] for a frame batch."""
        frames = np.asarray(frames, dtype=np.float32)
        if frames.ndim == 2 and frames.shape[0] == 0:
            return np.zeros((0, self.output_dim), np.float32)
        padded, n = self._prepare(frames)
        out = self._score(self.net, padded)
        return self._finish(out, n)

    def score_device(self, frames: jax.Array) -> jax.Array:
        """Device-resident variant (no host transfers, no padding).

        Width caveat: on a model-sharded mesh (model > 1) the returned
        posteriors keep the MXU-padded output width ([B, padded_output_dim],
        padded columns exactly 0) — slicing to the true senone count would
        force a cross-shard reshard, defeating the no-transfer point of this
        API.  Single-device and model=1 programs return [B, output_dim].
        Host-side score()/score_masked() always slice via _finish().
        """
        return self._score(self.net, frames)

    def score_masked(self, frames, masks) -> np.ndarray:
        """Lazy path, whole utterance at once: masks [n, out] (nonzero=active).

        Strategy per config.lazy_mode: the dense masked matmul (measured
        optimal at every batch size/density on v5e — see config.lazy_mode)
        unless "gathered" is explicitly configured.
        """
        frames = np.asarray(frames, dtype=np.float32)
        masks = np.asarray(masks)
        if masks.shape != (frames.shape[0], self.output_dim):
            raise ValueError(
                f"masks must be [n={frames.shape[0]}, out={self.output_dim}], got {masks.shape}"
            )
        padded, n = self._prepare(frames)
        pad_n = padded.shape[0]
        masks_p = self._pad_masks(masks, pad_n)
        if self._use_gathered(n, masks_p):
            from .lazy import union_active_indices

            idx, _ = union_active_indices(masks_p, self._gather_capacity)
            acts = self._hidden(self.net, padded)
            out = self._gathered(self.net, acts, jnp.asarray(masks_p), jnp.asarray(idx))
        else:
            out = self._score_masked(self.net, padded, jnp.asarray(masks_p))
        return self._finish(out, n)

    def _use_gathered(self, n_frames: int, masks: np.ndarray) -> bool:
        mode = self.config.lazy_mode
        if mode != "gathered" or self.mesh is not None:
            # "auto" resolves to dense: measured on v5e, the dense masked
            # output wins at EVERY batch size and density (the gathered
            # path's column materialization costs more HBM traffic than
            # the full weight read it avoids — see config.lazy_mode and
            # BENCHMARKS.md).  Gathered runs only on explicit request.
            return False
        union = int(masks.any(axis=0).sum())
        if union > self._gather_capacity:
            raise ValueError(
                f"active union {union} exceeds gather capacity "
                f"{self._gather_capacity}; raise config.lazy_capacity or "
                "use lazy_mode='dense'"
            )
        return True

    def score_utterances(self, utterances):
        """Score many utterances in one device pass.

        Frames are independent (pure MLP over spliced features, SURVEY.md §5)
        so utterances are concatenated into a single frame batch — one padded
        shape, one jit call — and split back.  Accepts a dict {id: [n, dim]}
        or a list of [n, dim] arrays; returns the same container shape.
        """
        keys = None
        if isinstance(utterances, dict):
            keys = list(utterances.keys())
            mats = [np.asarray(utterances[k], np.float32) for k in keys]
        else:
            mats = [np.asarray(u, np.float32) for u in utterances]
        if not mats:
            return {} if keys is not None else []
        counts = [m.shape[0] for m in mats]
        out = self.score(np.concatenate(mats, axis=0))
        splits = np.split(out, np.cumsum(counts)[:-1])
        if keys is not None:
            return dict(zip(keys, splits))
        return list(splits)

    def _score_masked_from_acts(self, acts: jax.Array, masks: np.ndarray) -> np.ndarray:
        """Posteriors for a few rows of stored last-hidden activations.

        Pads rows to what the compiled program needs (B % 32 per shard for
        the Pallas kernels; divisible by the data axis under a mesh) and
        masks to the program's output width, then slices both back.
        """
        b = acts.shape[0]
        rows = aligned_size(b, 32 * self._data_size) if self.mesh is not None else b
        if acts.shape[0] != rows:
            acts = jnp.pad(acts, ((0, rows - b), (0, 0)))
        masks_p = self._pad_masks(np.asarray(masks), rows)
        out = self._masked_from_acts(self.net, acts, jnp.asarray(masks_p))
        return self._finish(out, b)

    def new_lazy_context(self, input_vector_count: int) -> "LazyContext":
        """API-parity with QuantizedDnn.getNewLazyContext
        (/root/reference/src/java/suskun/nn/QuantizedDnn.java:100-107)."""
        return LazyContext(self, input_vector_count)


class LazyContext:
    """Frame-by-frame lazy scoring, mirroring the reference LazyContext
    (/root/reference/src/java/suskun/nn/QuantizedDnn.java:72-98):
    `calculate_until_output(frames)` runs everything up to the last hidden
    layer once and retains the activations; each
    `calculate_for_output_nodes(mask)` scores one frame's active senones.

    For throughput prefer Scorer.score_masked — this shim pays one device
    call per frame, the same control-flow shape whose JNI version costs the
    reference its lazy win (README.md:45).
    """

    def __init__(self, scorer: Scorer, input_vector_count: int):
        self._scorer = scorer
        self.input_vector_count = input_vector_count
        self.current_vector_index = 0
        self._acts: Optional[jax.Array] = None

    def calculate_until_output(self, frames) -> None:
        frames = np.asarray(frames, dtype=np.float32)
        if frames.shape[0] != self.input_vector_count:
            raise ValueError(
                f"expected {self.input_vector_count} frames, got {frames.shape[0]}"
            )
        padded, _ = self._scorer._prepare(frames)
        self._acts = self._scorer._hidden(self._scorer.net, padded)
        self.current_vector_index = 0  # context is reusable across utterances

    def calculate_for_output_nodes(self, mask) -> np.ndarray:
        """Posteriors f32 [out] for the next frame given its active-node mask."""
        if self._acts is None:
            raise RuntimeError("call calculate_until_output first")
        i = self.current_vector_index
        if i >= self.input_vector_count:
            raise IndexError("all frames already consumed")
        mask = (np.asarray(mask).reshape(1, -1) != 0).astype(np.uint8)
        acts_i = jax.lax.dynamic_slice_in_dim(self._acts, i, 1, axis=0)
        if self._scorer._use_gathered(1, mask):
            from .lazy import union_active_indices

            idx, _ = union_active_indices(mask, self._scorer._gather_capacity)
            out = self._scorer._gathered(
                self._scorer.net, acts_i, jnp.asarray(mask), jnp.asarray(idx)
            )
            res = np.asarray(out[0])
        else:
            res = self._scorer._score_masked_from_acts(acts_i, mask)[0]
        self.current_vector_index += 1
        return res

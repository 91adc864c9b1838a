"""Engine configuration.

The reference scatters its knobs across hardcoded constants and method
defaults (SURVEY.md §5 "Config / flag system"):
  - weight cutoff 3.0   (/root/reference/src/java/suskun/nn/QuantizedDnn.java:68-70,
                         /root/reference/src/cpp/dnn.cc:60)
  - batch size 10 (calculate) / 8 (lazy, CLI)
                        (QuantizedDnn.java:149-151,100-102; dnn.cc:66)
  - alignment 4 (input) / 16 (hidden)  (README.md:22)
  - sigmoid LUT: 1280 entries at 0.01 resolution, activation scale 255
                        (/root/reference/src/cpp/dnn.h:23-26)
  - weight scale 127    (/root/reference/src/cpp/dnn.cc:98)

Here they are one frozen dataclass.  TPU-specific knobs (backend selection,
frame-bucket rounding, mask capacity) are added alongside.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

WEIGHT_SCALE = 127.0
ACTIVATION_SCALE = 255.0
SIGMOID_LOOKUP_SIZE = 1280
SIGMOID_HALF_LOOKUP_SIZE = SIGMOID_LOOKUP_SIZE // 2
SIGMOID_RESOLUTION = 100.0  # LUT index = round(x * 100)

DEFAULT_CUTOFF = 3.0
DEFAULT_INPUT_ALIGNMENT = 4
DEFAULT_HIDDEN_ALIGNMENT = 16


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache for CLI/server cold starts.

    First compile of the flagship kernels costs tens of seconds (more
    through a remote-TPU relay); JAX's persistent cache reuses compiled
    executables across processes, cutting restart latency to disk-read
    time.  Cache directory resolution:

      JAX_COMPILATION_CACHE_DIR set  -> leave it to jax (native env var)
      FASTDNN_COMPILE_CACHE=0 or ''  -> disabled
      FASTDNN_COMPILE_CACHE=<path>   -> that directory
      unset                          -> ~/.cache/fastdnn_tpu/jax

    Called by the CLIs; a failure to set up the cache never blocks scoring.
    """
    import os

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    val = os.environ.get("FASTDNN_COMPILE_CACHE")
    if val is not None and val in ("", "0"):
        return
    path = val or os.path.join(os.path.expanduser("~"), ".cache", "fastdnn_tpu", "jax")
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a requirement
        pass


def honor_jax_platforms_env() -> None:
    """Apply the JAX_PLATFORMS env var via jax.config.

    Some platform plugins force-register an accelerator over the env var
    at import time; the config update restores the documented env-var
    semantics.  Called by the CLIs (and examples) before first backend
    use; a no-op when the variable is unset.
    """
    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Knobs for the TPU scoring engine."""

    # Quantization ---------------------------------------------------------
    #: clamp |w| above this before per-layer linear quantization
    cutoff: float = DEFAULT_CUTOFF

    # Compute path ---------------------------------------------------------
    #: "pallas" = fused Pallas TPU kernels, "xla" = pure jnp/XLA ops,
    #: "auto" = pallas on TPU, xla elsewhere (tests run on CPU).
    backend: Literal["auto", "pallas", "xla"] = "auto"
    #: run Pallas kernels in interpreter mode (CPU debugging / tests)
    interpret: bool = False
    #: MXU precision for the float input layer (the only non-int8 matmul,
    #: /root/reference/src/cpp/dnn.cc:217-218).  "high" (3-pass bf16) is
    #: ~2x faster than "highest" (6-pass) on v5e with ~1e-6 relative error —
    #: far below the 0.01 sigmoid LUT resolution, so quantized activations
    #: are unchanged in practice.  "default" (1-pass bf16) can move linear
    #: activations by ~1e-2, i.e. flip a few sigmoid counts.
    input_precision: Literal["highest", "high", "default"] = "high"

    #: store an int4 hidden trunk as two-nibbles-per-byte int8 and unpack
    #: in-kernel (quant.quantize.pack_int4_trunk) instead of shipping
    #: jnp.int4 arrays to the compiler.  Bitwise-identical math and the
    #: same halved HBM weight stream, but zero reliance on native s4
    #: lowering — the contingency for toolchains where `jnp.dot(s8, s4)`
    #: fails on real Mosaic (VERDICT r3 #3).  No effect on int8 nets.
    #: Note: the packed trunk uses per-layer kernels (the whole-trunk
    #: stack kernel needs square weight matrices).
    int4_packed: bool = False

    # Batching -------------------------------------------------------------
    #: frame counts are padded up to a multiple of this before jit so that
    #: streams of utterances reuse a small set of compiled shapes.
    frame_bucket: int = 128
    #: consult the measured block-size registry (fastdnn_tpu/tuned.json,
    #: written by tools/autotune.py --commit) at Scorer construction: block
    #: knobs left at their hand defaults are replaced by the recorded best
    #: for this (net topology, device kind); explicitly-set knobs always
    #: win.  See fastdnn_tpu/tuning.py for the lookup policy.
    autotuned: bool = True
    #: typical per-call frame count, used ONLY as the registry-lookup hint:
    #: with several batches recorded for a (net, device kind), the entry
    #: with the nearest batch wins.  None = the largest-batch entry (the
    #: throughput regime the engine optimizes for); latency deployments
    #: scoring small fixed batches should set their batch here.
    tuned_batch: "int | None" = None
    #: Pallas block size over the frame axis (trace-tuned on v5e)
    block_frames: int = 1024
    #: Pallas node-axis block for hidden layers (trace-tuned on v5e:
    #: 1024x1024 blocks edge out the alternatives by a few percent; all
    #: choices sit within ~10% — the kernel is near its MXU ceiling).
    block_nodes_hidden: int = 1024
    #: Pallas frame block for the output layer (trace-tuned for the
    #: resident-softmax kernel: 256 beats 128/512 by ~10%)
    block_frames_out: int = 256
    #: Pallas node-axis block for the output layer (f32 logits + stats
    #: scratch cap the fused kernel's VMEM budget; 512 is the tuned sweet
    #: spot on v5e, 1024 overflows scoped VMEM with the stats scratch)
    block_nodes_out: int = 512
    #: use the fused in-kernel flash-softmax output kernel instead of
    #: logits + XLA softmax: the output matmul accumulates softmax (max,
    #: sum-of-exp) stats in a persistent VMEM scratch while weights stay
    #: blocked-resident, so normalization needs a single logits read.
    #: ~0.5 ms/8192-frame batch faster than logits + XLA softmax on v5e.
    #: Pallas backend only; batches beyond 8192 frames (the [B, 128] stats
    #: scratch's scoped-VMEM cap) run as row-chunked fused calls — softmax
    #: is per-row, so chunking is exact.
    fused_softmax: bool = True
    #: emit posteriors as bfloat16.  With the resident output kernel the
    #: posterior write already overlaps the matmul, so on-device time is
    #: unchanged — the win is halved device->host transfer and consumer
    #: bandwidth for decoders that accept bf16 scores.  (On the stats-kernel
    #: fallback it also halves the logits-buffer traffic.)  Error is bf16
    #: rounding concentrated away from the softmax mass; off by default for
    #: bit-parity.
    fast_posteriors: bool = False
    #: frame-count threshold at or below which ALL hidden layers run as one
    #: Pallas kernel (fused_hidden_stack): the weight stack streams per
    #: frame block and n-1 dispatches vanish.  Re-measured round 5 on v5e
    #: (tools/profile.py stack, device-traced in one session — table in
    #: BENCHMARKS.md): stacked 1.09x at B=512, 1.01x at 2048 AND 8192, so
    #: the threshold moved 2048 -> 8192 per the renderer's rule ("at or
    #: above the largest B where the stack still wins").  At B=128 the same
    #: session showed per-layer 0.93x FASTER — a 6 us/batch effect that
    #: contradicts the round-2 trace and is noise-level end-to-end, so the
    #: threshold stays a single upper bound rather than growing a lower
    #: one.  0 disables.
    stack_hidden_max_frames: int = 8192

    # Lazy / masked output -------------------------------------------------
    #: "reference" reproduces the reference softmax-over-zeros semantics for
    #: inactive senones (/root/reference/src/cpp/dnn.cc:369-389);
    #: "active_only" renormalizes over active senones instead.
    lazy_semantics: Literal["reference", "active_only"] = "reference"
    #: masked-output strategy: "dense" always runs the full output matmul
    #: with post-masking; "gathered" computes only the union of active
    #: senone columns; "auto" picks the measured-best strategy, which on
    #: v5e is DENSE at every batch size and density (the resident output
    #: kernel reads the weights once at HBM speed-of-light, while the
    #: gathered path materializes the gathered columns as a new matrix —
    #: extra traffic that exceeds the read it saves: 0.079 vs 0.12-0.28
    #: device-ms/call at B in {1,8,32}, densities 0.05/0.40; table in
    #: BENCHMARKS.md).  "gathered" remains for output layers so large the
    #: full read itself is the bottleneck (far beyond 8k senones).
    #: "block_sparse" (pallas + fused_softmax; single-device AND meshes —
    #: on model-sharded meshes each shard's per-shard stats kernel skips
    #: its own tiles) skips all-inactive (frame x node) MXU tiles inside
    #: the masked kernel — wins only when masks concentrate into blocks;
    #: pair with engine.cluster's senone-clustering permutation for real
    #: decoder masks (measured table in BENCHMARKS.md).
    lazy_mode: Literal["auto", "dense", "gathered", "block_sparse"] = "auto"
    #: capacity (fraction of output nodes) for the gathered lazy matmul;
    #: unions above it raise (explicit "gathered" mode only).
    lazy_capacity: float = 0.6

    def resolve_backend(self, platform: str) -> str:
        if self.backend != "auto":
            return self.backend
        return "pallas" if platform == "tpu" else "xla"

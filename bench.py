"""Headline benchmark: audio-seconds/s/chip on the flagship net.

Workload = the reference's largest validated config: 7x2048-hidden /
8000-senone net, 432-dim spliced features, 100 frames per audio-second
(/root/reference/README.md:49,64).  The reference's quantized SSE engine
processes 1 s of speech in 0.25-0.3 s per x86 core, i.e. ~3.65
audio-seconds/s/core (README.md:60-61, BASELINE.md) — that is vs_baseline=1.

Methodology: this environment reaches the TPU through a relay with ~25 ms of
per-call round-trip latency and millisecond-scale jitter, so per-call
timings measure the tunnel.  The engine is therefore timed as a *chained
repetition* inside one jit: score REPS_HI vs REPS_LO times (each iteration's
posteriors feed the next iteration's features), and

    frames/s = (REPS_HI - REPS_LO) * batch / (t_hi - t_lo)

cancels both the RTT and the single compile/dispatch overhead.  Liveness of
every output column differs by backend: the pallas engine's posteriors come
out of one opaque `pallas_call` whose full execution XLA cannot dead-code
or narrow, so feeding back a feature-sized slice keeps the whole engine
live (trace-verified: all kernels appear per repetition at full size and
the marginal equals the device-trace floor).  The XLA backend's graph IS
visible to DCE, so there a full-row posterior sum is additionally consumed
each iteration — a full f32 read of the posteriors that makes the XLA
numbers ~10% conservative.  The relay's throughput also drifts run to run
(observed up to ~40% between sessions), so the wide 4-vs-24 rep window and
min-of-7 timing keep a single run self-consistent.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-s/s/chip", "vs_baseline": N, ...}
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

FRAMES_PER_AUDIO_SECOND = 100.0
REFERENCE_AUDIO_S_PER_S = 3.65  # quantized SSE engine, per core (README.md:60-61)


def synced_time(fn, iters: int) -> float:
    """Min wall time of fn(), where fn must force device completion."""
    fn()  # warmup / compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def chained_frames_per_s(
    score_once,
    frames: jax.Array,
    *,
    reps_lo: int = 4,
    reps_hi: int = 24,
    iters: int = 7,
    masks: jax.Array | None = None,
    opaque_output: bool = False,
) -> float:
    """Marginal throughput from two chained-repetition jits (see module doc).

    score_once(frames[, masks]) -> posteriors [b, out].
    opaque_output: posteriors are produced by an opaque pallas_call (XLA
    cannot dead-code columns inside it), so the slice feedback alone keeps
    the full engine live and no consume-sum is charged.
    """
    b, in_dim = frames.shape
    out_dim = jax.eval_shape(
        (lambda x, m: score_once(x, m)) if masks is not None else score_once,
        *((frames, masks) if masks is not None else (frames,)),
    ).shape[1]
    if out_dim < in_dim:
        raise ValueError(
            f"posterior width {out_dim} < feature dim {in_dim}: the feedback "
            "chain slices posteriors back into features, so the net's output "
            "must be at least as wide as its input"
        )

    def make(reps: int):
        @jax.jit
        def f(x):
            p = None
            for _ in range(reps):
                p = score_once(x, masks) if masks is not None else score_once(x)
                # feed posteriors back as features; for a DCE-visible (XLA)
                # graph additionally consume every column via a full-row sum
                x = p[:, :in_dim] * 50.0
                if not opaque_output:
                    x = x + jnp.sum(p, axis=1, keepdims=True)
            return p

        return lambda: np.asarray(f(frames)[0, 0])

    # the relay occasionally drops long remote compiles; degrade the rep
    # window rather than crash (the driver records whatever JSON we print)
    for lo, hi in ((reps_lo, reps_hi), (2, 12), (1, 4)):
        try:
            t_lo = synced_time(make(lo), iters)
            t_hi = synced_time(make(hi), iters)
        except Exception as e:  # compile/transport failure: shrink and retry
            print(f"# bench window {lo}/{hi} failed ({type(e).__name__}); retrying smaller",
                  file=sys.stderr)
            continue
        if t_hi > t_lo:
            return (hi - lo) * b / (t_hi - t_lo)
    return float("nan")


def run_config(name: str, backend: str, iters: int) -> dict:
    """BASELINE.json secondary configs (the headline is config 4 = main())."""
    from fastdnn_tpu.config import EngineConfig
    from fastdnn_tpu.engine.scorer import Scorer
    from fastdnn_tpu.formats.binary import read_features
    from fastdnn_tpu.models.feedforward import random_net
    from fastdnn_tpu.quant.quantize import quantize_net

    if name == "bundled-8khz":
        # config 1: bundled 8khz.aligned.bin features, full softmax output
        frames = read_features("/root/reference/data/8khz.aligned.bin")
        net = random_net(jax.random.PRNGKey(0), 432, [1024] * 5, 4000)
        scorer = Scorer(quantize_net(net), EngineConfig(backend=backend))
        call = lambda: np.asarray(scorer.score(frames)[0, 0])
        t = synced_time(call, iters)
        return {"config": name, "frames": int(frames.shape[0]),
                "wall_ms_incl_rtt": round(t * 1e3, 2)}

    if name == "bundled-16khz":
        # config 2: bundled 16khz features, transform fused, int8 forward
        frames = read_features("/root/reference/data/16khz.bin")
        net = random_net(jax.random.PRNGKey(0), 432, [2048] * 7, 8000)
        scorer = Scorer(quantize_net(net), EngineConfig(backend=backend))
        call = lambda: np.asarray(scorer.score(frames)[0, 0])
        t = synced_time(call, iters)
        return {"config": name, "frames": 100, "wall_ms_incl_rtt": round(t * 1e3, 2)}

    if name == "midsize-lazy":
        # config 3: 5x1024 / 4000-out net, lazy masks at 30-50% density
        b = 8192
        net = random_net(jax.random.PRNGKey(0), 432, [1024] * 5, 4000)
        scorer = Scorer(quantize_net(net), EngineConfig(backend=backend))
        out = {"config": name}

        @functools.partial(jax.jit, static_argnames=("density",))
        def gen_masks(key, density):
            return (jax.random.uniform(key, (b, 4000)) < density).astype(jnp.uint8)

        frames = jax.block_until_ready(
            jax.random.normal(jax.random.PRNGKey(0), (b, 432), jnp.float32)
        )
        from fastdnn_tpu.engine.scorer import uses_resident_output

        opaque = (
            scorer._backend == "pallas"
            and scorer.config.fused_softmax
            and uses_resident_output(scorer.net, scorer.config.block_frames_out)
        )
        for density in (0.3, 0.5):
            masks = jax.block_until_ready(gen_masks(jax.random.PRNGKey(1), density=density))
            score_once = lambda x, m: scorer._score_masked(scorer.net, x, m)
            fps = chained_frames_per_s(
                score_once, frames, masks=masks, iters=iters, opaque_output=opaque
            )
            out[f"lazy_frames_per_s_{int(density*100)}pct"] = round(fps)
        return out

    if name == "scaling":
        # config 5 analog: DP x TP scaling structure on a virtual device mesh.
        # Real multi-chip hardware is not present in this environment, so this
        # measures collective/partitioning overhead on N host-CPU devices
        # (ICI-free), NOT real-chip scaling; it validates that throughput
        # survives sharding and that DP/TP posteriors match 1-device output.
        import os

        import numpy as _np

        # force a virtual 8-device CPU mesh (must happen before first backend
        # use; the platform hook may force-register TPU over JAX_PLATFORMS)
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        jax.config.update("jax_platforms", "cpu")
        if len(jax.devices()) < 8:
            raise SystemExit(
                "scaling config needs >= 8 devices and must run before any "
                "other backend use in this process"
            )
        from fastdnn_tpu.models.feedforward import random_net
        from fastdnn_tpu.parallel.mesh import make_mesh, shard_frames, shard_qnet
        from fastdnn_tpu.parallel.sharded import make_gspmd_scorer
        from fastdnn_tpu.quant.quantize import quantize_net

        b = 1024
        net = random_net(jax.random.PRNGKey(0), 432, [512] * 3, 4096)
        qnet = quantize_net(net)
        frames = np.random.default_rng(0).standard_normal((b, 432)).astype(np.float32)
        out = {"config": name, "devices": len(jax.devices()),
               "note": "virtual CPU mesh: partition overhead only, no real ICI"}
        ref = None
        for dp, tp in ((1, 1), (8, 1), (1, 8), (4, 2)):
            mesh = make_mesh(model=tp, data=dp, devices=jax.devices()[: dp * tp])
            score, _ = make_gspmd_scorer(mesh, out_dim=qnet.output_dim)
            q = shard_qnet(qnet, mesh)
            x = shard_frames(jnp.asarray(frames), mesh)
            post = np.asarray(jax.block_until_ready(score(q, x)))
            if ref is None:
                ref = post
            else:
                _np.testing.assert_allclose(post, ref, atol=1e-5)
            t = synced_time(lambda: np.asarray(score(q, x)[0, 0]), iters)
            out[f"frames_per_s_dp{dp}_tp{tp}"] = round(b / t)
        return out

    raise SystemExit(f"unknown config {name}")


def _platform_or_die(timeout_s: float = 600.0, attempts: int = 2) -> str:
    """First backend touch, under a watchdog: a down TPU relay hangs
    jax.devices() indefinitely with no error (observed >7 h continuously),
    which would hang the whole benchmark run.

    Init exceptions are captured (not swallowed): a fast failure — bad
    driver, concurrent-tunnel ABORTED — is reported as "init raised" and
    RETRIED with a fresh call (concurrent TPU use aborts transiently and a
    retry fixes it, docs/performance.md); a genuine hang gets `attempts`
    full windows before giving up (a transient relay outage should delay,
    not erase, a round's bench artifact).  On final failure, emit ONE
    machine-readable JSON error line (the same one-line contract as the
    result) and exit non-zero so callers record a clean failure."""
    import sys
    import threading
    import time

    box: list = []
    errs: list = []

    def init():
        try:
            box.append(jax.devices())
        except BaseException as e:  # captured, reported, retried
            errs.append(e)

    t = threading.Thread(target=init, daemon=True)
    t.start()
    for attempt in range(1, attempts + 1):
        t.join(timeout_s)
        if box:
            return box[0][0].platform
        if t.is_alive():
            print(f"# accelerator init still pending after window {attempt}/"
                  f"{attempts} ({timeout_s:.0f}s each)", file=sys.stderr)
            continue  # hung init: give the same thread another window
        if attempt < attempts:  # init raised: fresh retry (ABORTED is transient)
            print(f"# accelerator init raised on attempt {attempt}: "
                  f"{errs[-1]!r}; retrying", file=sys.stderr)
            time.sleep(10.0)
            t = threading.Thread(target=init, daemon=True)
            t.start()
    reason = (
        f"accelerator init raised: {errs[-1]!r}" if errs and not t.is_alive()
        else f"accelerator init did not complete within {attempts} x "
             f"{timeout_s:.0f}s windows (TPU relay unreachable)"
    )
    print(json.dumps({
        "metric": "audio_seconds_per_second_per_chip", "value": None,
        "unit": "audio-s/s/chip", "vs_baseline": None, "error": reason,
    }))
    raise SystemExit(1)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--iters", type=int, default=7)
    p.add_argument("--backend", default="auto", choices=["auto", "xla", "pallas"])
    p.add_argument("--mask-density", type=float, default=0.4)
    p.add_argument("--quick", action="store_true")
    p.add_argument(
        "--config",
        default=None,
        choices=["bundled-8khz", "bundled-16khz", "midsize-lazy", "scaling"],
        help="run a BASELINE.json secondary config instead of the headline",
    )
    args = p.parse_args(argv)

    if args.config == "scaling":
        # the virtual 8-device CPU mesh must be configured BEFORE the first
        # backend touch — _platform_or_die() would pin the platform (TPU on
        # the real chip) and the scaling config could never see 8 devices.
        # No TPU is involved here at all, so skip the init watchdog too.
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        jax.config.update("jax_platforms", "cpu")
        print(json.dumps(run_config(args.config, args.backend, args.iters)))
        return 0

    platform = _platform_or_die()

    if args.config:
        print(json.dumps(run_config(args.config, args.backend, args.iters)))
        return 0

    from fastdnn_tpu.config import EngineConfig
    from fastdnn_tpu.engine.scorer import Scorer
    from fastdnn_tpu.models.feedforward import random_net
    from fastdnn_tpu.quant.quantize import quantize_net

    if args.quick:
        args.batch, args.iters = 2048, 3

    net = random_net(jax.random.PRNGKey(0), 432, [2048] * 7, 8000)
    qnet = quantize_net(net, cutoff=3.0)
    scorer = Scorer(qnet, EngineConfig(backend=args.backend))

    b = args.batch
    frames = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(0), (b, 432), jnp.float32)
    )

    def _r(x, nd=None):
        """round() that survives NaN (degraded-measurement fallback)."""
        if x != x:
            return None
        return round(x, nd) if nd is not None else round(x)

    # full (non-lazy) scoring; pallas + fused softmax emits posteriors from
    # one opaque pallas_call, so the slice feedback alone keeps it live.
    # Structurally gated on the RESIDENT kernel actually being selected:
    # the stats fallback's normalize epilogue is XLA-visible and could be
    # narrowed to the fed-back columns, under-charging posterior
    # materialization (uses_resident_output mirrors the kernel choice).
    from fastdnn_tpu.engine.scorer import uses_resident_output

    opaque = (
        scorer._backend == "pallas"
        and scorer.config.fused_softmax
        and uses_resident_output(scorer.net, scorer.config.block_frames_out)
    )
    fps = chained_frames_per_s(
        lambda x: scorer._score(scorer.net, x),
        frames,
        iters=args.iters,
        opaque_output=opaque,
    )
    audio_s_per_s = fps / FRAMES_PER_AUDIO_SECOND

    # lazy (masked) scoring at the typical ASR density (README.md:32)
    masks = jax.block_until_ready(
        (jax.random.uniform(jax.random.PRNGKey(1), (b, 8000)) < args.mask_density).astype(
            jnp.uint8
        )
    )
    try:
        lazy_fps = chained_frames_per_s(
            lambda x, m: scorer._score_masked(scorer.net, x, m),
            frames,
            masks=masks,
            iters=args.iters,
            opaque_output=opaque,
        )
    except Exception:  # lazy measurement must not cost us the headline
        lazy_fps = float("nan")

    result = {
        "metric": "audio_seconds_per_second_per_chip_7x2048x8000",
        "value": _r(audio_s_per_s, 1),
        "unit": "audio-s/s/chip",
        "vs_baseline": _r(audio_s_per_s / REFERENCE_AUDIO_S_PER_S, 1),
        "frames_per_s": _r(fps),
        "lazy_frames_per_s_40pct": _r(lazy_fps),
        "backend": scorer._backend,
        "platform": platform,
        "batch": b,
        "method": "chained-repetition marginal (cancels relay RTT"
        + ("; trace-verified full-liveness feedback)" if opaque else "; ~10% conservative)"),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Headline benchmark: audio-seconds/s/chip on the flagship net.

Workload = the reference's largest validated config: 7x2048-hidden /
8000-senone net, 432-dim spliced features, 100 frames per audio-second
(/root/reference/README.md:49,64).  The reference's quantized SSE engine
processes 1 s of speech in 0.25-0.3 s per x86 core, i.e. ~3.65
audio-seconds/s/core (README.md:60-61, BASELINE.md) — that is vs_baseline=1.

Methodology: this environment reaches the TPU through a relay with ~24 ms of
per-call round-trip latency, so single-call timings measure the tunnel, not
the chip.  Throughput is therefore measured *marginally*: synced wall time is
taken at two batch sizes and the per-frame cost is the slope
  frames/s = (b2 - b1) / (t(b2) - t(b1))
which cancels the constant RTT exactly.  Each t(b) is the min over several
iterations of a call whose output is fetched to host (forcing completion).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-s/s/chip", "vs_baseline": N, ...}
"""

from __future__ import annotations

import argparse
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


def marginal_frames_per_s(make_call, b1: int, b2: int, iters: int) -> float:
    t1 = synced_time(make_call(b1), iters)
    t2 = synced_time(make_call(b2), iters)
    if t2 <= t1:
        return float("nan")
    return (b2 - b1) / (t2 - t1)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--b1", type=int, default=8192)
    p.add_argument("--b2", type=int, default=24576)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--backend", default="auto", choices=["auto", "xla", "pallas"])
    p.add_argument("--mask-density", type=float, default=0.4)
    p.add_argument("--quick", action="store_true")
    args = p.parse_args(argv)

    from fastdnn_tpu.config import EngineConfig
    from fastdnn_tpu.engine.scorer import Scorer
    from fastdnn_tpu.models.feedforward import random_net
    from fastdnn_tpu.quant.quantize import quantize_net

    if args.quick:
        args.b1, args.b2, args.iters = 2048, 8192, 3

    platform = jax.devices()[0].platform
    net = random_net(jax.random.PRNGKey(0), 432, [2048] * 7, 8000)
    qnet = quantize_net(net, cutoff=3.0)
    scorer = Scorer(qnet, EngineConfig(backend=args.backend))
    rng = np.random.default_rng(0)

    import functools

    # inputs are generated on device: the relay makes large host->device
    # transfers minutes-slow and they are not part of the measured engine
    @functools.partial(jax.jit, static_argnames="b")
    def gen_frames(key, b):
        return jax.random.normal(key, (b, 432), jnp.float32)

    @functools.partial(jax.jit, static_argnames="b")
    def gen_masks(key, b):
        return (jax.random.uniform(key, (b, 8000)) < args.mask_density).astype(jnp.uint8)

    def make_full_call(b: int):
        frames = jax.block_until_ready(gen_frames(jax.random.PRNGKey(0), b=b))

        def call():
            np.asarray(scorer.score_device(frames)[0, 0])  # host fetch = sync

        return call

    fps = marginal_frames_per_s(make_full_call, args.b1, args.b2, args.iters)
    audio_s_per_s = fps / FRAMES_PER_AUDIO_SECOND

    # lazy (masked) scoring at the typical ASR density (README.md:32)
    def make_masked_call(b: int):
        frames = jax.block_until_ready(gen_frames(jax.random.PRNGKey(0), b=b))
        masks = jax.block_until_ready(gen_masks(jax.random.PRNGKey(1), b=b))

        def call():
            np.asarray(scorer._score_masked(scorer.net, frames, masks)[0, 0])

        return call

    lazy_fps = marginal_frames_per_s(make_masked_call, args.b1, args.b2, args.iters)

    result = {
        "metric": "audio_seconds_per_second_per_chip_7x2048x8000",
        "value": round(audio_s_per_s, 1),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(audio_s_per_s / REFERENCE_AUDIO_S_PER_S, 1),
        "frames_per_s": round(fps),
        "lazy_frames_per_s_40pct": round(lazy_fps),
        "backend": scorer._backend,
        "platform": platform,
        "batches": [args.b1, args.b2],
        "method": "marginal slope between batch sizes (cancels relay RTT)",
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

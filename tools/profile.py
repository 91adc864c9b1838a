"""On-device microbenchmarks for kernel tuning (run on the real TPU).

The TPU is reached through a relay with ~25 ms RTT and millisecond jitter,
and its effective throughput drifts between sessions (observed up to ~40%).
Rules that make numbers trustworthy here:

  * compare variants only WITHIN one invocation (one process, interleaved);
  * time long unrolled chains (the marginal between a 4-rep and a 24+-rep
    jit cancels RTT and dispatch);
  * treat `jax.lax.fori_loop` timings as biased — the loop carry defeats
    some XLA scheduling; use unrolled chains for absolute numbers.

Usage:
    python tools/profile.py trace      # GROUND TRUTH: device-trace the full
                                       # pass and print per-kernel times
    python tools/profile.py variants   # full-net: plain/fused/fast x precision
    python tools/profile.py stages     # per-stage: input / hidden / output
    python tools/profile.py dots       # raw s8xs8 vs bf16 matmul rate
    python tools/profile.py serving    # cheap-precision serving knobs: time+accuracy
    python tools/profile.py stack      # per-layer vs whole-trunk hidden kernels vs B

`trace` is the instrument of record: jax.profiler works through the relay
and its per-kernel device times are exact.  The wall-clock subcommands
remain for quick relative checks only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

#: FASTDNN_PROFILE_SMOKE=1 shrinks every measurement campaign to toy shapes
#: with interpret-mode kernels, so the suite can EXECUTE these code paths on
#: CPU.  The campaigns otherwise first run unattended inside a scarce TPU
#: relay window (the resumable evidence ladder) — a Python-level bug there
#: would forfeit the round's measurement, so the smoke test exists to make
#: that class of failure impossible.  Smoke timings are meaningless by
#: construction; only the code path is under test.
SMOKE = os.environ.get("FASTDNN_PROFILE_SMOKE") == "1"
B = 64 if SMOKE else 8192
#: flagship shape: (input dim, hidden width, hidden layers, senones)
NET_SHAPE = (432, 256, 2, 1024) if SMOKE else (432, 2048, 7, 8000)
REPS_LO, REPS_HI, ITERS = 4, 24, 7


def _random_flagship_net():
    from fastdnn_tpu.models.feedforward import random_net

    d_in, hidden, layers, out = NET_SHAPE
    return random_net(jax.random.PRNGKey(0), d_in, [hidden] * layers, out)


def _flagship():
    from fastdnn_tpu.quant.quantize import pad_qnet_for_tpu, quantize_net

    qnet = pad_qnet_for_tpu(quantize_net(_random_flagship_net(), cutoff=3.0))
    frames = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(0), (B, qnet.input_dim), jnp.float32)
    )
    return qnet, frames


def synced_time(fn, iters=ITERS):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def marginal(make):
    """make(reps) -> zero-arg callable forcing completion; returns s/rep."""
    t_lo = synced_time(make(REPS_LO))
    t_hi = synced_time(make(REPS_HI))
    return (t_hi - t_lo) / (REPS_HI - REPS_LO)


def cmd_variants():
    from fastdnn_tpu.engine.scorer import score_fn

    qnet, frames = _flagship()

    def chained(fused, prec, fast):
        def make(reps):
            @jax.jit
            def f(x):
                p = None
                for _ in range(reps):
                    p = score_fn(
                        qnet,
                        x,
                        backend="pallas",
                        out_dim=NET_SHAPE[3],
                        fused_softmax=fused,
                        input_precision=prec,
                        fast_posteriors=fast,
                        interpret=SMOKE,
                    ).astype(jnp.float32)
                    x = p[:, : qnet.input_dim] * 50.0 + jnp.sum(p, axis=1, keepdims=True)
                return p

            return lambda: np.asarray(f(frames)[0, 0])

        return marginal(make)

    for fused, prec, fast in [
        (False, "highest", False),
        (False, "high", False),
        (True, "high", False),
        (True, "high", True),
        (True, "default", False),
        (True, "default", True),
    ]:
        t = chained(fused, prec, fast)
        print(
            f"fused={int(fused)} prec={prec:8s} fast={int(fast)}  "
            f"{t*1e3:7.3f} ms/batch  audio-s/s {B/t/100:7.0f}",
            flush=True,
        )


def cmd_stages():
    from fastdnn_tpu.engine import pallas_backend as pb
    from fastdnn_tpu.ops.sigmoid import quantized_sigmoid_shifted_i8

    qnet, frames = _flagship()
    acts0 = jax.block_until_ready(
        jax.random.randint(jax.random.PRNGKey(2), (B, 2048), -100, 100).astype(jnp.int8)
    )
    K = qnet.input_w.shape[0]
    fl_in = 2 * B * K * 2048
    fl_h = 2 * B * 2048 * 2048
    fl_o = 2 * B * 2048 * qnet.weights[-1].shape[1]

    def mk_input(prec):
        def make(reps):
            @jax.jit
            def f(x):
                a = None
                for _ in range(reps):
                    lin = jnp.dot(x, qnet.input_w, precision=prec) + qnet.input_b
                    a = quantized_sigmoid_shifted_i8(lin)
                    x = x * 0.5 + a[:, : qnet.input_dim].astype(jnp.float32) * 0.01
                return a

            return lambda: np.asarray(f(frames)[0, 0])

        return make

    def mk_hidden(reps):
        @jax.jit
        def f(a):
            for _ in range(reps):
                a = pb.hidden_layer_step(
                    a, qnet.weights[0], qnet.colsum128[0], qnet.inv_scales[0], qnet.biases[0]
                )
            return a

        return lambda: np.asarray(f(acts0)[0, 0])

    def mk_out(reps):
        @jax.jit
        def f(a):
            p = None
            for _ in range(reps):
                p = pb.output_posteriors(
                    a,
                    qnet.weights[-1],
                    qnet.colsum128[-1],
                    qnet.inv_scales[-1],
                    qnet.biases[-1],
                    None,
                    out_dim=8000,
                )
                a = (p[:, :2048] * 100).astype(jnp.int8)
            return p

        return lambda: np.asarray(f(acts0)[0, 0])

    for prec in ("highest", "high"):
        t = marginal(mk_input(prec))
        print(f"input {prec:8s} {t*1e3:7.3f} ms  {fl_in/t/1e12:6.1f} T", flush=True)
    t = marginal(mk_hidden)
    print(f"hidden x1      {t*1e3:7.3f} ms  {fl_h/t/1e12:6.1f} T", flush=True)
    t = marginal(mk_out)
    print(f"output fused   {t*1e3:7.3f} ms  {fl_o/t/1e12:6.1f} T", flush=True)


def cmd_dots():
    key = jax.random.PRNGKey(0)
    w_i8 = jax.block_until_ready(jax.random.randint(key, (2048, 2048), -127, 127, jnp.int8))
    a_i8 = jax.block_until_ready(jax.random.randint(key, (B, 2048), -100, 100, jnp.int8))
    w_bf = jax.block_until_ready(w_i8.astype(jnp.bfloat16))
    a_bf = jax.block_until_ready(a_i8.astype(jnp.bfloat16))
    fl = 2 * B * 2048 * 2048

    def mk_i8(reps):
        @jax.jit
        def f(a):
            for _ in range(reps):
                acc = jax.lax.dot_general(
                    a, w_i8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
                )
                a = (acc & 0x7F).astype(jnp.int8)
            return a

        return lambda: np.asarray(f(a_i8)[0, 0])

    def mk_bf(reps):
        @jax.jit
        def f(a):
            for _ in range(reps):
                acc = jnp.dot(a, w_bf, preferred_element_type=jnp.float32)
                a = (acc * 1e-3).astype(jnp.bfloat16)
            return a

        return lambda: np.asarray(f(a_bf)[0, 0])

    t = marginal(mk_i8)
    print(f"xla s8xs8->s32 {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} T", flush=True)
    t = marginal(mk_bf)
    print(f"xla bf16->f32  {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} T", flush=True)


def _trace_scorer(sc, label: str, reps: int = 3):
    """Device-trace sc._score on a flagship batch, print per-kernel times."""
    import collections
    import glob
    import gzip
    import json
    import tempfile

    frames = np.random.default_rng(0).standard_normal((B, 432)).astype(np.float32)
    padded, _ = sc._prepare(frames)
    jax.block_until_ready(sc._score(sc.net, padded))  # compile
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(reps):
                jax.block_until_ready(sc._score(sc.net, padded))
        path = sorted(glob.glob(f"{td}/plugins/profile/*/*.trace.json.gz"))[-1]
        durs = collections.defaultdict(float)
        with gzip.open(path) as fh:
            for e in json.load(fh).get("traceEvents", []):
                if e.get("ph") == "X" and "dur" in e and not e["name"].startswith("$"):
                    durs[e["name"]] += e["dur"]
    total = None
    print(f"{label}, batch {B} (ms per call, device time):")
    for name, us in sorted(durs.items(), key=lambda kv: -kv[1]):
        ms = us / (reps * 1e3)
        if name.startswith("jit_"):
            total = ms
        if ms > 0.005 and not name.startswith(("PjitFunction", "PythonRef", "Parse")):
            print(f"  {ms:8.3f} ms  {name}")
    if total:
        fps = B / (total / 1e3)
        print(f"total {total:.3f} ms -> {fps:,.0f} frames/s = "
              f"{fps/100:,.0f} audio-s/s device-side")
    return durs


def _flagship_scorer(mesh=None):
    from fastdnn_tpu.config import EngineConfig
    from fastdnn_tpu.engine.scorer import Scorer
    from fastdnn_tpu.quant.quantize import quantize_net

    return Scorer(
        quantize_net(_random_flagship_net()),
        EngineConfig(backend="pallas", interpret=SMOKE),
        mesh=mesh,
    )


def _device_total_ms(thunk, reps: int = 5) -> float:
    """Sum of top-level jit_* device times per call (exact, via profiler)."""
    import collections
    import glob
    import gzip
    import json
    import tempfile

    jax.block_until_ready(thunk())  # compile
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(reps):
                jax.block_until_ready(thunk())
        path = sorted(glob.glob(f"{td}/plugins/profile/*/*.trace.json.gz"))[-1]
        durs = collections.defaultdict(float)
        with gzip.open(path) as fh:
            for e in json.load(fh).get("traceEvents", []):
                if e.get("ph") == "X" and "dur" in e and e["name"].startswith("jit_"):
                    durs[e["name"]] += e["dur"]
    return sum(durs.values()) / (reps * 1e3)


def cmd_gathered():
    """Gathered vs dense masked output at decoder batch sizes (B=1/8/32).

    Masks are EVOLVING (FuncTest-style churn, like a real beam) so the
    union across the block stays near the per-frame density — the regime
    engine/lazy.py exists for.  Device time only (host union-index build
    excluded; it overlaps the hidden pass in streaming use).
    """
    import numpy as np

    from fastdnn_tpu.cli.score import generate_masks
    from fastdnn_tpu.engine.lazy import union_active_indices

    sc = _flagship_scorer()
    frames_all = np.random.default_rng(0).standard_normal((32, 432)).astype(np.float32)
    print("flagship masked output (device ms/call):")
    print(f"{'dens':>5} {'B':>4} {'union':>6} {'dense':>9} {'gathered':>9} {'ratio':>6}")
    # 0.40 = the README's typical decoder density; 0.05 = the tight-beam
    # regime the beam_decoder example actually produced (density 0.03)
    cases = [(d, b) for d in (0.4, 0.05) for b in (1, 8, 32)]
    masks_by_d = {
        d: generate_masks(np.random.default_rng(1), 32, sc.output_dim, d, churn_frac=0.02)
        for d in (0.4, 0.05)
    }
    for d, b in cases:
        frames = frames_all[:b]
        masks = masks_by_d[d][:b]
        padded, n = sc._prepare(frames)
        masks_p = sc._pad_masks(masks, padded.shape[0])
        mp = jnp.asarray(masks_p)
        # measurement capacity sized to the union (the engine's auto mode
        # would fall back to dense when the union exceeds its capacity)
        union = int(masks_p.any(axis=0).sum())
        cap = -(-union // 128) * 128
        idx, count = union_active_indices(masks_p, cap)
        idxj = jnp.asarray(idx)

        dense_ms = _device_total_ms(lambda: sc._score_masked(sc.net, padded, mp))

        def gathered_call():
            acts = sc._hidden(sc.net, padded)
            return sc._gathered(sc.net, acts, mp, idxj)

        gath_ms = _device_total_ms(gathered_call)
        print(
            f"{d:>5.2f} {b:>4} {count:>6} {dense_ms:>9.3f} {gath_ms:>9.3f} "
            f"{dense_ms / gath_ms:>6.2f}x",
            flush=True,
        )


def cmd_blocksparse(batches=(32, 256, 8192), interpret=False):
    """Block-sparse vs dense masked output with REAL beam-decoder masks.

    Protocol (VERDICT r2 item 2): run the token-passing BeamDecoder over
    the flagship net to record a live mask trajectory (density lands in
    the 0.03-0.10 regime BENCHMARKS.md measured for real beams), then
    score it tiled to B in {32, 256, 8192} through three engines sharing
    one quantized net:

      dense  — the dense masked kernel (current default / champion);
      bs     — lazy_mode='block_sparse' on the raw senone ids;
      bs+cl  — block_sparse after the senone-clustering permutation
               (engine.cluster), with the permutation derived from the
               FIRST half of the trajectory and measured on the SECOND
               half (honest train/test split — deployment derives the
               permutation offline from sample traffic).

    Device times via the profiler (exact); skip%% is the fraction of
    (frame block x node block) tiles whose mask is all-zero — the upper
    bound on what tile-skipping can save of the output stage.
    """
    from fastdnn_tpu.config import EngineConfig
    from fastdnn_tpu.decoder import BeamDecoder, Lexicon, random_lexicon
    from fastdnn_tpu.engine.cluster import mask_cluster_permutation, permute_output_layer
    from fastdnn_tpu.engine.scorer import Scorer
    from fastdnn_tpu.quant.quantize import quantize_net

    interpret = interpret or SMOKE
    net = _random_flagship_net()
    senones = NET_SHAPE[3]
    qnet = quantize_net(net, cutoff=3.0)
    cfg_dense = EngineConfig(backend="pallas", interpret=interpret)
    cfg_bs = EngineConfig(backend="pallas", lazy_mode="block_sparse", interpret=interpret)
    sc = Scorer(qnet, cfg_dense)

    # Record a live trajectory: lexicon seeded from the net's own argmax
    # track (so the beam has signal to follow) + distractors, exactly the
    # examples/beam_decoder.py recipe, at flagship senone count.
    rng = np.random.default_rng(7)
    T = 64 if SMOKE else 512
    if SMOKE:
        batches = (16, 32)
    frames = rng.standard_normal((T, 432)).astype(np.float32)
    track = sc.score(frames).argmax(1)
    dedup = track[np.insert(np.diff(track) != 0, 0, True)]
    true_words = [
        tuple(int(s) for s in dedup[i : i + 4]) for i in range(0, len(dedup) - 3, 4)
    ][:40]
    # Lexicon sized so the live beam's mask density lands in the measured
    # real-decoder regime (0.03-0.10, BENCHMARKS.md): ~600 words x 4-8
    # states over 8000 senones, word_exit_beam wide enough to keep word
    # starts churning.
    lex = Lexicon(
        tuple(true_words)
        + random_lexicon(
            rng, 40 if SMOKE else 560, senones, min_states=4, max_states=8
        ).words
    )
    dec = BeamDecoder(lex, senones, beam_width=64 if SMOKE else 256,
                      word_exit_beam=32)
    res = dec.decode_dense(sc, frames)
    half = T // 2
    perm = mask_cluster_permutation(res.masks[:half])
    masks_t = res.masks[half:]
    frames_t = frames[half:]
    print(f"live beam trajectory: density {res.avg_density:.3f}, "
          f"churn {res.avg_churn:.4f}, eval frames {masks_t.shape[0]}")

    sc_bs = Scorer(qnet, cfg_bs)
    sc_cl = Scorer(permute_output_layer(qnet, perm), cfg_bs)

    def skip_frac(masks_p, n_pad):
        b, n = masks_p.shape
        bm = min(256, b)
        while b % bm:
            bm //= 2
        bn = min(512, n)
        while n % bn:
            bn //= 2
        blocks = (masks_p != 0).reshape(b // bm, bm, n // bn, bn).any(axis=(1, 3))
        return 1.0 - float(blocks.mean())

    print(f"{'B':>5} {'skip%':>6} {'skip%cl':>7} {'dense':>9} {'bs':>9} "
          f"{'bs+cl':>9} {'best vs dense':>13}")
    rows = []
    for b in batches:
        reps = -(-b // masks_t.shape[0])
        masks = np.tile(masks_t, (reps, 1))[:b]
        fr = np.tile(frames_t, (reps, 1))[:b]
        padded, _ = sc._prepare(fr)
        mp = sc._pad_masks(masks, padded.shape[0])
        mp_cl = sc._pad_masks(masks[:, perm], padded.shape[0])
        n_pad = sc.net.weights[-1].shape[1]
        sf, sf_cl = skip_frac(mp, n_pad), skip_frac(mp_cl, n_pad)
        mj, mj_cl = jnp.asarray(mp), jnp.asarray(mp_cl)
        d_ms = _device_total_ms(lambda: sc._score_masked(sc.net, padded, mj))
        b_ms = _device_total_ms(lambda: sc_bs._score_masked(sc_bs.net, padded, mj))
        c_ms = _device_total_ms(lambda: sc_cl._score_masked(sc_cl.net, padded, mj_cl))
        best = max(min(b_ms, c_ms), 1e-9)  # CPU smoke traces report 0
        rows.append(dict(B=b, skip=round(sf, 3), skip_cl=round(sf_cl, 3),
                         dense_ms=round(d_ms, 3), bs_ms=round(b_ms, 3),
                         bs_cluster_ms=round(c_ms, 3),
                         speedup=round(d_ms / best, 2)))
        print(f"{b:>5} {sf:>6.1%} {sf_cl:>7.1%} {d_ms:>9.3f} {b_ms:>9.3f} "
              f"{c_ms:>9.3f} {d_ms/best:>12.2f}x", flush=True)
    import json as _json

    print(_json.dumps({"blocksparse": rows, "density": round(res.avg_density, 4)}))


def cmd_int4(interpret=False):
    """int8 vs int4-trunk flagship: device time + the reference's own
    float-oracle accuracy gate (FuncTest.java:70-72, summed |d| per node
    over 100 frames <= 0.1), same process so relay drift cancels."""
    import json as _json

    from fastdnn_tpu.config import EngineConfig
    from fastdnn_tpu.engine.scorer import Scorer
    from fastdnn_tpu.models import feedforward as ff
    from fastdnn_tpu.quant.quantize import quantize_net

    interpret = interpret or SMOKE
    net = _random_flagship_net()
    cfg = EngineConfig(backend="pallas", interpret=interpret)
    q4 = quantize_net(net, cutoff=3.0, hidden_bits=4)
    # LAZY factories: Scorer construction itself can fail for native-s4
    # (device_put of an s4 net is where unsupported runtimes like axon die —
    # the round-5 first ladder lost all three variants to one shared crash)
    scorers = {
        "int8": lambda: Scorer(quantize_net(net, cutoff=3.0), cfg),
        # packed-nibble contingency: same s4 values, no jnp.int4 anywhere
        "int4_packed": lambda: Scorer(
            q4,
            EngineConfig(backend="pallas", interpret=interpret, int4_packed=True),
        ),
        # native jnp.int4 operands to the MXU dot — the hypothesis under
        # test.  LAST: on the axon runtime a failed s4 execution poisons the
        # process's TPU state (later executions die UNIMPLEMENTED —
        # artifacts/r5/verify2.log), so it must not precede a measurement
        "int4": lambda: Scorer(q4, cfg),
    }

    f100 = np.random.default_rng(3).standard_normal((100, 432)).astype(np.float32)
    fl = np.asarray(ff.forward(net, jnp.asarray(f100)))
    frames = np.random.default_rng(0).standard_normal((B, 432)).astype(np.float32)
    out = {"batch": B}
    # per-variant isolation: a native-s4 compile failure must not cost the
    # packed/int8 measurements (the whole point of running all three)
    for name, make in scorers.items():
        try:
            sc = make()
            summed = np.abs(sc.score(f100) - fl).sum(axis=0)
            gate = round(float(summed.max()), 4)
            padded, _ = sc._prepare(frames)
            ms = _device_total_ms(lambda: sc._score(sc.net, padded))
            out[name] = {"ms": round(ms, 3), "oracle_gate": gate}
            print(f"{name:12s} {ms:7.3f} ms/{B}  float-oracle max summed |d| "
                  f"= {gate} (reference gate: < 0.1)", flush=True)
        except Exception as e:
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}", flush=True)
    print(_json.dumps({"int4": out}))


def cmd_serving(interpret=False):
    """Serving-config verdict (VERDICT r3 #6): the two cheap-precision knobs
    (input_precision="default" 1-pass bf16 input dot, fast_posteriors=True
    bfloat16 posterior write) vs the parity default — device time AND
    accuracy in one process so relay drift cancels.  Accuracy is gated two
    ways: the reference's own float-oracle bound (FuncTest.java:70-72,
    summed |d| per node over 100 frames <= 0.1) and max |dp| / argmax
    agreement vs the parity config."""
    import json as _json

    from fastdnn_tpu.config import EngineConfig
    from fastdnn_tpu.engine.scorer import Scorer
    from fastdnn_tpu.models import feedforward as ff
    from fastdnn_tpu.quant.quantize import quantize_net

    interpret = interpret or SMOKE
    net = _random_flagship_net()
    qnet = quantize_net(net, cutoff=3.0)
    configs = {
        "parity": EngineConfig(backend="pallas", interpret=interpret),
        "fast_out": EngineConfig(
            backend="pallas", fast_posteriors=True, interpret=interpret
        ),
        "fast_in": EngineConfig(
            backend="pallas", input_precision="default", interpret=interpret
        ),
        "serving": EngineConfig(
            backend="pallas",
            input_precision="default",
            fast_posteriors=True,
            interpret=interpret,
        ),
    }
    scorers = {k: Scorer(qnet, c) for k, c in configs.items()}

    f100 = np.random.default_rng(3).standard_normal((100, 432)).astype(np.float32)
    fl = np.asarray(ff.forward(net, jnp.asarray(f100)))
    p_parity = np.asarray(scorers["parity"].score(f100), np.float32)
    acc = {}
    for k, sc in scorers.items():
        p = np.asarray(sc.score(f100), np.float32)
        acc[k] = {
            "oracle_gate": round(float(np.abs(p - fl).sum(axis=0).max()), 4),
            "max_dp_vs_parity": float(f"{np.abs(p - p_parity).max():.3e}"),
            "argmax_agree": float((p.argmax(1) == p_parity.argmax(1)).mean()),
        }

    frames = np.random.default_rng(0).standard_normal((B, 432)).astype(np.float32)
    out = {}
    for k, sc in scorers.items():
        padded, _ = sc._prepare(frames)
        ms = _device_total_ms(lambda sc=sc, x=padded: sc._score(sc.net, x))
        out[k] = {"ms": round(ms, 3), **acc[k]}
        print(
            f"{k:8s} {ms:7.3f} ms/{B}  oracle {acc[k]['oracle_gate']:.4f}  "
            f"max|dp| {acc[k]['max_dp_vs_parity']:.2e}  "
            f"argmax {acc[k]['argmax_agree']:.4f}",
            flush=True,
        )
    print(_json.dumps({"serving_config": {"batch": B, **out}}))


def cmd_stack(interpret=False):
    """Small-batch hidden-path verdict: per-layer kernels vs the whole-trunk
    fused_hidden_stack across B — re-measures the round-2 '31% faster hidden
    time at B=128' claim that set stack_hidden_max_frames=2048, so the
    routing threshold rests on a current-round measurement."""
    import json as _json

    from fastdnn_tpu.engine.scorer import build_hidden_stack, score_fn

    interpret = interpret or SMOKE
    qnet, _ = _flagship()
    out_dim = NET_SHAPE[3]
    hstack = build_hidden_stack(qnet)
    rows = {}
    for b in (32, 64) if SMOKE else (128, 512, 2048, 8192):
        frames = jax.block_until_ready(
            jax.random.normal(jax.random.PRNGKey(1), (b, qnet.input_dim), jnp.float32)
        )

        def run(stack, x=frames):
            f = jax.jit(
                lambda y: score_fn(
                    qnet,
                    y,
                    backend="pallas",
                    out_dim=out_dim,
                    fused_softmax=True,
                    interpret=interpret,
                    hstack=hstack if stack else None,
                    stack_max_frames=1 << 30 if stack else 0,
                )
            )
            return _device_total_ms(lambda: f(x))

        per_layer = run(False)
        try:
            stacked = run(True)
        except Exception as e:  # e.g. scoped-VMEM overflow at large B
            rows[b] = {"per_layer_ms": round(per_layer, 3),
                       "stack_error": type(e).__name__}
            print(f"B={b:5d}  per-layer {per_layer:7.3f} ms  stack FAILED "
                  f"({type(e).__name__})", flush=True)
            continue
        rows[b] = {"per_layer_ms": round(per_layer, 3), "stack_ms": round(stacked, 3)}
        print(
            f"B={b:5d}  per-layer {per_layer:7.3f} ms  stack {stacked:7.3f} ms  "
            f"({per_layer / max(stacked, 1e-9):.2f}x)",
            flush=True,
        )
    print(_json.dumps({"hidden_stack": rows}))


def cmd_trace():
    _trace_scorer(_flagship_scorer(), "flagship full pass")


def cmd_trace_mesh():
    """Trace the mesh-wrapped engine on the single real chip (1x1 mesh) and
    diff its kernel inventory against the plain single-device program: the
    shard_map wrapper must add NO copies/transposes/collectives — proving
    the production sharded path runs the identical tuned kernel stack."""
    from fastdnn_tpu.parallel.mesh import make_mesh

    plain = _trace_scorer(_flagship_scorer(), "single-device")
    mesh = _trace_scorer(
        _flagship_scorer(make_mesh(data=1, model=1)), "mesh(1,1) shard_map"
    )

    def kernels(durs):
        return {
            n for n, us in durs.items()
            if us > 10 and not n.startswith(("jit_", "PjitFunction", "PythonRef",
                                             "Parse", "buffer", "Transfer"))
        }

    extra = kernels(mesh) - kernels(plain)
    print("\nkernels only in the mesh-wrapped program:", sorted(extra) or "NONE")


if __name__ == "__main__":
    from fastdnn_tpu.config import honor_jax_platforms_env

    honor_jax_platforms_env()  # axon hook force-registers TPU over the env
    what = sys.argv[1] if len(sys.argv) > 1 else "trace"
    if len(sys.argv) > 2:  # optional batch override, e.g. `trace 128`
        B = int(sys.argv[2])
    {
        "trace": cmd_trace,
        "trace-mesh": cmd_trace_mesh,
        "variants": cmd_variants,
        "stages": cmd_stages,
        "dots": cmd_dots,
        "gathered": cmd_gathered,
        "blocksparse": cmd_blocksparse,
        "int4": cmd_int4,
        "serving": cmd_serving,
        "stack": cmd_stack,
    }[what]()

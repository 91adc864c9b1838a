"""On-device verification harness: ONE pass/fail JSON line per run.

The reference's whole validation discipline is "run the engine and diff"
(/root/reference/test/java/suskun/nn/FuncTest.java:59-74).  This repo's far
stronger gates (bitwise pallas==XLA, sigmoid LUT exactness, cross-engine
golden parity) run under pytest in interpret/CPU mode only — but the two
pinned sigmoid entries (k = +/-513, ops/sigmoid.py) prove compiled-vs-
interpret divergence is real, so a silent regression in the COMPILED
kernels could hide while the suite stays green.  This tool closes that gap:
on the actual accelerator it runs

  * the 1281-entry quantized-sigmoid exactness check for both backends,
    expected values derived from ops.sigmoid.build_reference_lut — the same
    oracle construction the CPU tests gate (one source of truth);
  * compiled-kernel equality vs the JITTED XLA oracle (CLAUDE.md: eager can
    round 1 ulp differently) for every kernel x variant:
      - fused_hidden_layer                       (bitwise int8)
      - fused_hidden_stack streaming + resident  (bitwise int8)
      - output_layer_logits                      (allclose, fp epilogue)
      - output_layer_posteriors_resident         (plain / masked-reference /
                                                  masked-active_only / fast)
      - output_layer_posteriors (flash-stats)    (same four variants)
      - output_layer_flash_stats + the TP pmax/psum combine algebra
        (parallel/sharded.py:154-155) reassembled across two column shards
  * the full-engine gate: Scorer(pallas) vs Scorer(xla) — hidden
    activations bitwise, posteriors within the suite's 3e-5 bound;
  * the golden cross-engine parity gate: posteriors vs the output of the
    ACTUAL compiled reference C++ engine (tests/golden/), at the repo's
    5x-tightened acceptance bound.

Usage:
    python tools/verify_tpu.py [--out VERIFY.json] [--batch 512]

Exit 0 = every check passed.  Run after ANY kernel change; the driver-style
artifact (VERIFY_r*.json) is committed per round like BENCH_r*.json.
Posterior tolerances follow CLAUDE.md: 3e-5 covers the in-kernel resident
softmax's reduction-order roundoff; the bf16 `fast` variants get 4e-3
(bf16 rounding concentrated away from the softmax mass).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

POSTERIOR_ATOL = 3e-5
FAST_ATOL = 4e-3
LOGIT_ATOL = 1e-4  # logits span ~[-40, 40]; fp epilogue contraction order


def _bitwise(name, got, want, detail):
    got, want = np.asarray(got), np.asarray(want)
    bad = int((got != want).sum())
    detail[name] = {"ok": bad == 0, "mismatches": bad, "n": int(got.size)}
    return bad == 0


def _close(name, got, want, atol, detail):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    d = float(np.abs(got - want).max()) if got.size else 0.0
    detail[name] = {"ok": d <= atol, "max_abs_diff": d, "atol": atol}
    return d <= atol


def check_sigmoid(detail) -> bool:
    """All 1281 representable LUT inputs, both backends, compiled."""
    from jax.experimental import pallas as pl

    from fastdnn_tpu.ops.pallas_kernels import _quantized_sigmoid_shifted
    from fastdnn_tpu.ops.sigmoid import (
        quantized_sigmoid_shifted_i8,
        reference_lut_lookup,
    )

    ks = np.arange(-640, 641, dtype=np.int64)
    lin = ks.astype(np.float32) / 100.0
    # expected via the test-gated oracle: the rebuilt reference LUT itself
    expected = (reference_lut_lookup(lin).astype(np.int16) - 128).astype(np.int8)

    pad = np.zeros(8 * 2048 - lin.size, np.float32)
    lin_mat = jnp.asarray(np.concatenate([lin, pad]).reshape(8, 2048))

    def kernel(lin_ref, out_ref):
        out_ref[:] = _quantized_sigmoid_shifted(lin_ref[:])

    interpret = jax.devices()[0].platform != "tpu"
    got_pallas = np.asarray(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(lin_mat.shape, jnp.int8),
            interpret=interpret,
        )(lin_mat)
    ).reshape(-1)[: ks.size]
    got_xla = np.asarray(jax.jit(quantized_sigmoid_shifted_i8)(lin_mat)).reshape(-1)[
        : ks.size
    ]
    ok = _bitwise("sigmoid_pallas_1281", got_pallas, expected, detail)
    ok &= _bitwise("sigmoid_xla_1281", got_xla, expected, detail)
    return ok


def _oracle_posteriors(qnet, acts, masks, out_dim, semantics):
    """Jitted XLA oracle: logits -> slice padding -> (masked) softmax,
    exactly the scorer's XLA path (engine/scorer.score_masked_fn)."""
    from fastdnn_tpu.ops import matmul as xops

    @jax.jit
    def f(acts, masks):
        logits = xops.output_logits(
            acts, qnet.weights[-1], qnet.colsum128[-1], qnet.inv_scales[-1],
            qnet.biases[-1],
        )[:, :out_dim]
        if masks is None:
            return jax.nn.softmax(logits, axis=-1)
        mb = masks[:, :out_dim] != 0
        if semantics == "reference":
            return xops.masked_softmax_reference(logits, mb)
        return xops.masked_softmax_active_only(logits, mb)

    return np.asarray(f(acts, masks), np.float32)


def check_kernels(detail, batch: int) -> bool:
    """Every Pallas kernel x variant vs the jitted XLA oracle, compiled."""
    from fastdnn_tpu.engine import pallas_backend as pb
    from fastdnn_tpu.models.feedforward import random_net
    from fastdnn_tpu.ops import matmul as xops
    from fastdnn_tpu.ops import pallas_kernels as pk
    from fastdnn_tpu.quant.quantize import pad_qnet_for_tpu, quantize_net

    interpret = jax.devices()[0].platform != "tpu"
    net = random_net(jax.random.PRNGKey(7), 432, [512, 512, 512], 1000)
    qnet = pad_qnet_for_tpu(quantize_net(net, cutoff=3.0))
    out_dim = qnet.output_dim
    n_pad = qnet.weights[-1].shape[1]

    rng = np.random.default_rng(7)
    frames = jnp.asarray(rng.standard_normal((batch, 432)), jnp.float32)
    frames = jnp.pad(frames, ((0, 0), (0, qnet.input_dim - 432)))
    acts0 = jax.jit(xops.input_layer_step, static_argnames=("precision",))(
        frames, qnet.input_w, qnet.input_b, "high"
    )
    masks = jnp.asarray(
        (rng.random((batch, n_pad)) < 0.35).astype(np.uint8)
    )
    # one fully-masked row exercises the uniform-row guard (active_only)
    masks = masks.at[1].set(0)

    ok = True

    # hidden layer: pallas vs jitted XLA, bitwise
    xla_hidden = jax.jit(xops.hidden_layer_step)
    acts = acts0
    want = acts0
    for i in range(len(qnet.weights) - 1):
        acts = pb.hidden_layer_step(
            acts, qnet.weights[i], qnet.colsum128[i], qnet.inv_scales[i],
            qnet.biases[i], interpret=interpret,
        )
        want = xla_hidden(
            want, qnet.weights[i], qnet.colsum128[i], qnet.inv_scales[i],
            qnet.biases[i],
        )
    ok &= _bitwise("hidden_layers_bitwise", acts, want, detail)
    want_acts = want

    # hidden stack, streaming + resident, bitwise vs the same oracle chain
    from fastdnn_tpu.engine.scorer import build_hidden_stack

    hstack = build_hidden_stack(qnet)
    for resident in (False, True):
        got = pb.hidden_stack_step(
            acts0, hstack, interpret=interpret, resident=resident
        )
        ok &= _bitwise(
            f"hidden_stack_{'resident' if resident else 'streaming'}_bitwise",
            got, want_acts, detail,
        )

    # output logits: fp epilogue -> allclose
    got_logits = pb.output_logits(
        acts, qnet.weights[-1], qnet.colsum128[-1], qnet.inv_scales[-1],
        qnet.biases[-1], interpret=interpret,
    )
    want_logits = jax.jit(xops.output_logits)(
        want_acts, qnet.weights[-1], qnet.colsum128[-1], qnet.inv_scales[-1],
        qnet.biases[-1],
    )
    ok &= _close("output_logits", got_logits, want_logits, LOGIT_ATOL, detail)

    # fused output kernels: resident + flash-stats, all mask/fast variants
    variants = [
        ("plain", None, "reference", False, POSTERIOR_ATOL),
        ("masked_ref", masks, "reference", False, POSTERIOR_ATOL),
        ("masked_active", masks, "active_only", False, POSTERIOR_ATOL),
        ("fast", None, "reference", True, FAST_ATOL),
    ]
    for vname, m, sem, fast, atol in variants:
        want_p = _oracle_posteriors(qnet, want_acts, m, out_dim, sem)
        got_res = pk.output_layer_posteriors_resident(
            acts, qnet.weights[-1], qnet.colsum128[-1], qnet.inv_scales[-1],
            qnet.biases[-1], m, out_dim=out_dim, semantics=sem,
            interpret=interpret, fast=fast,
        )
        ok &= _close(f"posteriors_resident_{vname}", got_res, want_p, atol, detail)
        got_st = pk.output_layer_posteriors(
            acts, qnet.weights[-1], qnet.colsum128[-1], qnet.inv_scales[-1],
            qnet.biases[-1], m, out_dim=out_dim, semantics=sem,
            interpret=interpret, fast=fast,
        )
        ok &= _close(f"posteriors_stats_{vname}", got_st, want_p, atol, detail)

    # block-sparse lazy kernels: tile-skipping must not change posteriors
    # (clustered masks so skipping actually happens; dead row included)
    bs_masks = np.zeros((batch, n_pad), np.uint8)
    for blk in range(batch // 32):
        lo = int(rng.integers(0, out_dim - 64))
        bs_masks[blk * 32 : (blk + 1) * 32, lo : lo + 64] = (
            rng.random((32, 64)) < 0.6
        )
    bs_masks[1] = 0
    bs_masks = jnp.asarray(bs_masks)
    for sem in ("reference", "active_only"):
        want_bs = _oracle_posteriors(qnet, want_acts, bs_masks, out_dim, sem)
        for vname, fn in (
            ("resident", pk.output_layer_posteriors_resident_block_sparse),
            ("stats", pk.output_layer_posteriors_block_sparse),
        ):
            got_bs = fn(
                acts, qnet.weights[-1], qnet.colsum128[-1], qnet.inv_scales[-1],
                qnet.biases[-1], bs_masks, out_dim=out_dim, semantics=sem,
                interpret=interpret,
            )
            ok &= _close(
                f"block_sparse_{vname}_{sem}", got_bs, want_bs,
                POSTERIOR_ATOL, detail,
            )

    # tensor-parallel kernel halves: per-column-shard stats kernels + the
    # pmax/psum combine algebra (parallel/sharded._sharded_fused_posteriors)
    half = n_pad // 2

    def tp_combine(stats_fn, masks_or_none, sem):
        """Split the output layer in two column shards, run the per-shard
        stats kernel, and reproduce the sharded softmax combine."""
        shards = []
        for lo, valid in ((0, half), (half, out_dim - half)):
            m_sl = None if masks_or_none is None else masks_or_none[:, lo : lo + half]
            z, m_l, s_l = stats_fn(
                acts,
                qnet.weights[-1][:, lo : lo + half],
                qnet.colsum128[-1][lo : lo + half],
                qnet.inv_scales[-1],
                qnet.biases[-1][lo : lo + half],
                m_sl,
                valid_count=jnp.int32(valid),
                semantics=sem,
                interpret=interpret,
            )
            shards.append((np.asarray(z), np.asarray(m_l), np.asarray(s_l)))
        m_g = np.maximum(shards[0][1], shards[1][1])
        s_g = sum(s * np.exp(m - m_g) for _, m, s in shards)
        p = np.concatenate(
            [np.exp(z - m_g) / np.maximum(s_g, np.finfo(np.float32).tiny)
             for z, _, _ in shards],
            axis=1,
        )[:, :out_dim]
        # fully-capped rows (fully-masked active_only) -> zeros, like
        # _sharded_fused_posteriors' final where()
        return np.where(m_g > -1e29, p, 0.0)

    p_tp = tp_combine(pb.output_flash_stats, None, "reference")
    want_p = _oracle_posteriors(qnet, want_acts, None, out_dim, "reference")
    ok &= _close("flash_stats_tp_combine", p_tp, want_p, POSTERIOR_ATOL, detail)

    # block-sparse TP half: per-shard tile-skipping stats kernel, clustered
    # masks split across the column shards, dead row included
    for sem in ("reference", "active_only"):
        p_bs = tp_combine(pb.output_flash_stats_block_sparse, bs_masks, sem)
        want_bs = _oracle_posteriors(qnet, want_acts, bs_masks, out_dim, sem)
        ok &= _close(
            f"flash_stats_block_sparse_tp_combine_{sem}", p_bs, want_bs,
            POSTERIOR_ATOL, detail,
        )
    return ok


def check_engine(detail, batch: int) -> bool:
    """Full engine: Scorer(pallas) vs Scorer(xla) on the same device."""
    from fastdnn_tpu.config import EngineConfig
    from fastdnn_tpu.engine.scorer import Scorer
    from fastdnn_tpu.models.feedforward import random_net
    from fastdnn_tpu.quant.quantize import quantize_net

    interpret = jax.devices()[0].platform != "tpu"
    net = random_net(jax.random.PRNGKey(3), 432, [512] * 4, 1000)
    qnet = quantize_net(net, cutoff=3.0)
    sc_p = Scorer(qnet, EngineConfig(backend="pallas", interpret=interpret))
    sc_x = Scorer(qnet, EngineConfig(backend="xla"))
    rng = np.random.default_rng(3)
    frames = rng.standard_normal((batch, 432)).astype(np.float32)

    ok = _close("engine_posteriors", sc_p.score(frames), sc_x.score(frames),
                POSTERIOR_ATOL, detail)
    masks = (rng.random((batch, 1000)) < 0.4).astype(np.uint8)
    ok &= _close("engine_posteriors_masked", sc_p.score_masked(frames, masks),
                 sc_x.score_masked(frames, masks), POSTERIOR_ATOL, detail)

    # hidden activations bitwise across the two engines (padded widths match
    # on the hidden trunk: 512 is already x128)
    pf, _ = sc_p._prepare(frames)
    xf, _ = sc_x._prepare(frames)
    acts_p = np.asarray(sc_p._hidden(sc_p.net, pf))
    acts_x = np.asarray(sc_x._hidden(sc_x.net, xf))
    ok &= _bitwise("engine_hidden_acts_bitwise", acts_p[: batch],
                   acts_x[: batch], detail)

    # int4 trunk checks in a SUBPROCESS (round-5b lesson, one step past the
    # round-5 per-variant isolation: a failed native-s4 EXECUTION poisons the
    # whole process's TPU state on the axon runtime — after the in-process s4
    # probe died UNIMPLEMENTED, check_golden died UNIMPLEMENTED too
    # (artifacts/r5/verify2.log).  The risky variants now never share a
    # process with the remaining checks; the child runs packed first and
    # native s4 LAST so the poisoning candidate cannot mask a measurement.)
    packed_ok, s4_ok = _run_int4_probes(detail, batch)
    ok &= packed_ok
    if not s4_ok:
        err = detail.get("int4_native_s4", {}).get("error", "")
        # a CRASH dispatching/lowering/executing s4 is the pre-committed
        # unsupported-toolchain outcome (BENCHMARKS.md int4 decision rule):
        # int4_packed is the supported int4 trunk there, so the gate passes
        # IF the packed contingency passed.  A numeric MISMATCH (s4 ran but
        # disagreed) still fails the gate.
        crashish = any(t in err for t in
                       ("RecursionError", "S4", "int4", "NotImplemented",
                        "Unsupported", "lower", "Unimplemented",
                        "UNIMPLEMENTED", "Mosaic", "INTERNAL"))
        if err and crashish and packed_ok:
            detail["int4_native_s4"] = {
                "ok": True, "verdict": "unsupported_toolchain", "error": err,
                "note": "native jnp.int4 dispatch fails on this runtime; "
                        "int4_packed is the documented int4 trunk "
                        "(pre-committed rule, BENCHMARKS.md)",
            }
        else:
            ok = False
    return ok


_INT4_PROBE_CHILD = r"""
import json
import sys

import numpy as np

batch, atol = int(sys.argv[1]), float(sys.argv[2])

from fastdnn_tpu.config import (EngineConfig, enable_compilation_cache,
                                honor_jax_platforms_env)

honor_jax_platforms_env()
enable_compilation_cache()
import jax
import jax.numpy as jnp

from fastdnn_tpu.engine.scorer import Scorer
from fastdnn_tpu.models.feedforward import forward, random_net
from fastdnn_tpu.quant.quantize import quantize_net

interpret = jax.devices()[0].platform != "tpu"
net = random_net(jax.random.PRNGKey(3), 432, [512] * 4, 1000)
q4 = quantize_net(net, cutoff=3.0, hidden_bits=4)  # host-numpy prep
frames = (np.random.default_rng(3).standard_normal((batch, 432))
          .astype(np.float32))[:128]
fl = np.asarray(forward(net, jnp.asarray(frames[:100])))


def emit(name, **kw):
    print("PROBE " + json.dumps(dict(name=name, **kw)), flush=True)


def probe(name, make_pallas, make_xla):
    try:
        sc_p, sc_x = make_pallas(), make_xla()
        d = float(np.abs(sc_p.score(frames) - sc_x.score(frames)).max())
        # float oracle at the reference's own bound (FuncTest.java:70-72)
        g = float(np.abs(sc_x.score(frames[:100]) - fl).sum(axis=0).max())
        emit(name, ok=bool(d <= atol and g < 0.1), max_abs_diff=d, atol=atol,
             float_oracle_sum_d_max=g, float_oracle_gate=0.1)
    except Exception as e:
        emit(name, ok=False, error=f"{type(e).__name__}: {str(e)[:400]}")


# packed first (the safe variant); native s4 LAST — on the axon runtime a
# failed s4 execution poisons this process's TPU state, which is exactly why
# this child exists
probe(
    "int4_packed_engine_posteriors",
    lambda: Scorer(q4, EngineConfig(backend="pallas", interpret=interpret,
                                    int4_packed=True)),
    lambda: Scorer(q4, EngineConfig(backend="xla", int4_packed=True)),
)
probe(
    "int4_native_s4",
    lambda: Scorer(q4, EngineConfig(backend="pallas", interpret=interpret)),
    lambda: Scorer(q4, EngineConfig(backend="xla")),
)
"""


def _run_int4_probes(detail, batch: int) -> tuple[bool, bool]:
    """Both int4-trunk variants in one fresh subprocess; returns
    (packed_ok, s4_ok) and records one detail entry per variant."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c", _INT4_PROBE_CHILD, str(batch),
             str(POSTERIOR_ATOL)],
            capture_output=True, text=True, timeout=900,
        )
    except subprocess.TimeoutExpired:
        detail["int4_probe_subprocess"] = {
            "ok": False, "error": "int4 probe subprocess timed out (900s)"
        }
        return False, False
    results = {}
    for line in proc.stdout.splitlines():
        if line.startswith("PROBE "):
            rec = json.loads(line[len("PROBE "):])
            results[rec.pop("name")] = rec
    if not results:
        tail = (proc.stderr or proc.stdout).strip().splitlines()
        detail["int4_probe_subprocess"] = {
            "ok": False,
            "error": f"rc={proc.returncode}: "
                     f"{tail[-1][:400] if tail else '<no output>'}",
        }
        return False, False
    for name in ("int4_packed_engine_posteriors", "int4_native_s4"):
        detail[name] = results.get(name) or {
            "ok": False,
            "error": f"probe died before this variant (rc={proc.returncode})",
        }
    return (bool(detail["int4_packed_engine_posteriors"].get("ok")),
            bool(detail["int4_native_s4"].get("ok")))


def check_golden(detail) -> bool:
    """Cross-engine parity vs the compiled reference's recorded output."""
    from fastdnn_tpu.config import EngineConfig
    from fastdnn_tpu.engine.scorer import Scorer
    from fastdnn_tpu.formats.binary import read_features, read_model
    from fastdnn_tpu.models.feedforward import from_raw
    from fastdnn_tpu.quant.quantize import quantize_net

    golden = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "golden")
    interpret = jax.devices()[0].platform != "tpu"
    raw = read_model(os.path.join(golden, "parity_model.bin"))
    ref = read_features(os.path.join(golden, "parity_ref_posteriors.bin"))
    frames = read_features("/root/reference/data/8khz.aligned.bin")
    qnet = quantize_net(from_raw(raw), cutoff=3.0)
    ours = Scorer(qnet, EngineConfig(backend="pallas", interpret=interpret)).score(frames)
    d = np.abs(ours - ref)
    sum_dp = float(d.sum(axis=0).max())
    # argmax agreement on frames whose reference top-2 margin is resolvable
    srt = np.sort(ref, axis=1)
    resolvable = (srt[:, -1] - srt[:, -2]) > 10 * d.max()
    agree = float((ours[resolvable].argmax(1) == ref[resolvable].argmax(1)).mean())
    ok = sum_dp < 0.02 and agree == 1.0  # 5x tighter than FuncTest.java:70-72
    detail["golden_parity"] = {
        "ok": ok, "sum_dp_max": sum_dp, "gate": 0.02,
        "argmax_agreement": agree, "resolvable_frames": int(resolvable.sum()),
    }

    # lazy golden: the compiled MASKED kernels vs the reference's ACTUAL
    # LazyOutputActivations output (softmax-over-zeros semantics; fixture
    # from tools/ref_lazy_harness.cc via make_reference_golden.py)
    masks = (read_features(os.path.join(golden, "lazy_masks.bin")) != 0).astype(
        np.uint8
    )
    ref_l = read_features(os.path.join(golden, "lazy_ref_posteriors.bin"))
    ours_l = Scorer(
        qnet, EngineConfig(backend="pallas", interpret=interpret)
    ).score_masked(frames[: masks.shape[0]], masks)
    sum_l = float(np.abs(ours_l - ref_l).sum(axis=0).max())
    agree_l = float((ours_l.argmax(1) == ref_l.argmax(1)).mean())
    ok_l = sum_l < 0.02 and agree_l == 1.0
    detail["golden_lazy_parity"] = {
        "ok": ok_l, "sum_dp_max": sum_l, "gate": 0.02,
        "argmax_agreement": agree_l,
    }
    return ok and ok_l


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512,
                   help="frame count for kernel/engine checks (x32)")
    p.add_argument("--out", default=None, help="also write the JSON to a file")
    args = p.parse_args(argv)

    from fastdnn_tpu.config import enable_compilation_cache, honor_jax_platforms_env

    honor_jax_platforms_env()  # the axon hook force-registers TPU over the env
    enable_compilation_cache()
    platform = jax.devices()[0].platform
    t0 = time.time()
    detail: dict = {}
    ok = True
    for fn in (lambda d: check_sigmoid(d),
               lambda d: check_kernels(d, args.batch),
               lambda d: check_engine(d, args.batch),
               lambda d: check_golden(d)):
        try:
            ok &= fn(detail)
        except Exception as e:  # a crash is a failure, not a skip
            ok = False
            detail[f"EXCEPTION_{fn.__code__.co_firstlineno}"] = {
                "ok": False, "error": f"{type(e).__name__}: {e}"}
    result = {
        "ok": bool(ok),
        "platform": platform,
        "compiled": platform == "tpu",
        "batch": args.batch,
        "checks_passed": sum(1 for v in detail.values() if v.get("ok")),
        "checks_total": len(detail),
        "wall_s": round(time.time() - t0, 1),
        "checks": detail,
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

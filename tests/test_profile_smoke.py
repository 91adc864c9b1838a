"""Measurement-campaign smoke test (FASTDNN_PROFILE_SMOKE=1).

The tools/profile.py verdict campaigns (blocksparse / int4 / serving /
stack) run UNATTENDED inside the evidence ladder's scarce TPU relay
windows; a Python-level bug there forfeits the round's measurement.  This
executes each campaign's full code path on CPU at toy shapes (timings are
0 by construction — only the control flow, mask plumbing, per-variant
isolation, and JSON verdict emission are under test).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: (subcommand, JSON verdict key expected in the last JSON line)
CAMPAIGNS = [
    ("blocksparse", "blocksparse"),
    ("int4", "int4"),
    ("serving", "serving_config"),
    ("stack", "hidden_stack"),
]


def _run(cmd: str) -> str:
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        FASTDNN_PROFILE_SMOKE="1",
        FASTDNN_COMPILE_CACHE="0",
        PYTHONPATH=REPO,
    )
    env.pop("XLA_FLAGS", None)  # single-device is the campaigns' contract
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "profile.py"), cmd],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"profile.py {cmd} exited {proc.returncode}:\n"
        f"{(proc.stdout + proc.stderr)[-3000:]}"
    )
    return proc.stdout


@pytest.mark.slow
@pytest.mark.parametrize("cmd,key", CAMPAIGNS)
def test_campaign_runs_and_emits_verdict_json(cmd, key):
    out = _run(cmd)
    json_lines = [
        ln for ln in out.splitlines()
        if ln.startswith("{") and ln.endswith("}")
    ]
    assert json_lines, f"profile.py {cmd} emitted no JSON verdict:\n{out[-2000:]}"
    record = json.loads(json_lines[-1])
    assert key in record, f"verdict key {key!r} missing from {record}"
    if cmd == "int4":
        # per-variant isolation must have produced all three rows, and the
        # accuracy gates run even in smoke mode (they're shape-independent)
        for variant in ("int8", "int4", "int4_packed"):
            row = record["int4"][variant]
            assert "error" not in row, row
            assert row["oracle_gate"] < 0.1  # FuncTest.java:70-72 gate
    if cmd == "serving":
        for k in ("parity", "fast_out", "fast_in", "serving"):
            assert record["serving_config"][k]["argmax_agree"] == 1.0

"""Autotune registry (fastdnn_tpu/tuning.py): measured block sizes become
engine defaults — the loop tools/autotune.py --commit closes (the
reference's one tuning knob is the hand-set batch_size cache-blocking
parameter, /root/reference/src/cpp/dnn.cc:301-317; here the measurement is
recorded and consulted automatically)."""

import dataclasses
import json

import jax
import pytest

from fastdnn_tpu.config import EngineConfig
from fastdnn_tpu.models.feedforward import random_net
from fastdnn_tpu.quant.quantize import quantize_net
from fastdnn_tpu import tuning


@pytest.fixture
def qnet():
    return quantize_net(random_net(jax.random.PRNGKey(0), 32, [64, 64], 48))


def _entry(net="32-2x64-48", kind="TPU test", batch=8192, **knobs):
    return {
        "net": net, "device_kind": kind, "batch": batch,
        "best_ms": 1.0, "knobs": knobs or {"block_frames": 512},
    }


def test_net_key_equal_and_unequal_hidden(qnet):
    assert tuning.net_key(qnet) == "32-2x64-48"
    uneq = quantize_net(random_net(jax.random.PRNGKey(0), 32, [64, 128], 48))
    assert tuning.net_key(uneq) == "32-64-128-48"


def test_lookup_prefers_largest_batch_then_nearest():
    reg = [
        _entry(batch=512, block_frames=256),
        _entry(batch=8192, block_frames=1024),
    ]
    assert tuning.lookup("32-2x64-48", "TPU test", registry=reg) == {
        "block_frames": 1024
    }
    assert tuning.lookup("32-2x64-48", "TPU test", batch=600, registry=reg) == {
        "block_frames": 256
    }
    assert tuning.lookup("32-2x64-48", "other chip", registry=reg) is None
    assert tuning.lookup("different-net", "TPU test", registry=reg) is None


def test_apply_tuned_fills_defaults_but_respects_explicit(qnet, tmp_path, monkeypatch):
    reg = tmp_path / "tuned.json"
    reg.write_text(json.dumps({"entries": [
        _entry(kind="TPU test", block_frames=512, block_nodes_hidden=2048),
    ]}))
    monkeypatch.setenv("FASTDNN_TUNED", str(reg))

    # defaults -> registry values win
    cfg = tuning.apply_tuned(EngineConfig(), qnet, "TPU test")
    assert cfg.block_frames == 512 and cfg.block_nodes_hidden == 2048
    # untouched knobs keep their hand defaults
    assert cfg.block_frames_out == EngineConfig().block_frames_out

    # explicit knob -> caller wins, other default still filled
    cfg = tuning.apply_tuned(
        EngineConfig(block_frames=256), qnet, "TPU test"
    )
    assert cfg.block_frames == 256 and cfg.block_nodes_hidden == 2048

    # autotuned=False -> registry ignored entirely
    cfg = tuning.apply_tuned(EngineConfig(autotuned=False), qnet, "TPU test")
    assert cfg == EngineConfig(autotuned=False)

    # no entry for this device kind -> unchanged
    cfg = tuning.apply_tuned(EngineConfig(), qnet, "unknown chip")
    assert cfg == EngineConfig()


def test_apply_tuned_honors_tuned_batch_hint(qnet, tmp_path, monkeypatch):
    """ADVICE r4: latency deployments scoring fixed small batches can key
    the registry lookup on their batch via EngineConfig.tuned_batch — the
    nearest recorded batch wins instead of the largest-batch entry."""
    reg = tmp_path / "tuned.json"
    reg.write_text(json.dumps({"entries": [
        _entry(batch=256, block_frames=256),
        _entry(batch=8192, block_frames=2048),
    ]}))
    monkeypatch.setenv("FASTDNN_TUNED", str(reg))

    assert tuning.apply_tuned(EngineConfig(), qnet, "TPU test").block_frames == 2048
    cfg = tuning.apply_tuned(EngineConfig(tuned_batch=300), qnet, "TPU test")
    assert cfg.block_frames == 256


def test_registry_user_state_fallback_and_merge(qnet, tmp_path, monkeypatch):
    """ADVICE r4: with a read-only package dir, --commit's write target
    falls back to the per-user state file; lookups merge package + user
    entries with user entries winning on key conflicts."""
    monkeypatch.delenv("FASTDNN_TUNED", raising=False)
    pkg_dir = tmp_path / "pkg"
    pkg_dir.mkdir()
    pkg = pkg_dir / "tuned.json"
    pkg.write_text(json.dumps({"entries": [
        _entry(batch=8192, block_frames=1024),          # shadowed by user
        _entry(batch=256, block_frames=512),            # package-only
    ]}))
    monkeypatch.setattr(tuning, "_package_registry_path", lambda: str(pkg))
    monkeypatch.setenv("XDG_STATE_HOME", str(tmp_path / "state"))

    # writable package dir -> write target is the package file
    assert tuning.registry_path() == str(pkg)

    # simulate a read-only site-packages install (chmod alone can't: the
    # suite runs as root, for whom os.access always grants W_OK)
    monkeypatch.setattr(
        tuning, "_dir_writable", lambda d: d != str(pkg_dir)
    )
    user = tuning._user_registry_path()
    assert tuning.registry_path() == user

    tuning.merge_entry(_entry(batch=8192, block_frames=2048))
    # user file holds ONLY the committed entry (no wholesale copy)
    assert len(tuning.load_registry(user)) == 1

    merged = tuning.load_registry()
    assert len(merged) == 2  # user entry replaced the package 8192 one
    assert tuning.lookup("32-2x64-48", "TPU test", registry=merged) == {
        "block_frames": 2048
    }
    assert tuning.lookup(
        "32-2x64-48", "TPU test", batch=256, registry=merged
    ) == {"block_frames": 512}


def test_registry_disabled_and_corrupt(tmp_path, monkeypatch):
    monkeypatch.setenv("FASTDNN_TUNED", "0")
    assert tuning.registry_path() is None
    assert tuning.load_registry() == []
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert tuning.load_registry(str(bad)) == []  # never blocks scoring


def test_merge_entry_replaces_same_key(tmp_path):
    path = str(tmp_path / "reg.json")
    tuning.merge_entry(_entry(batch=512, block_frames=256), path)
    tuning.merge_entry(_entry(batch=8192, block_frames=1024), path)
    # same (net, device, batch) key -> replaced, not duplicated
    tuning.merge_entry(_entry(batch=8192, block_frames=2048), path)
    entries = tuning.load_registry(path)
    assert len(entries) == 2
    assert tuning.lookup("32-2x64-48", "TPU test", registry=entries) == {
        "block_frames": 2048
    }


def test_scorer_consults_registry_on_pallas(qnet, tmp_path, monkeypatch):
    """End to end: a pallas Scorer built with default knobs picks up the
    registry entry for its (net, device kind); results stay identical (the
    block size is a pure scheduling knob)."""
    import numpy as np

    from fastdnn_tpu.engine.scorer import Scorer

    kind = jax.devices()[0].device_kind
    reg = tmp_path / "tuned.json"
    reg.write_text(json.dumps({"entries": [
        _entry(kind=kind, block_frames=512, block_nodes_hidden=64),
    ]}))
    monkeypatch.setenv("FASTDNN_TUNED", str(reg))

    sc = Scorer(qnet, EngineConfig(backend="pallas", interpret=True))
    assert sc.config.block_frames == 512
    assert sc.config.block_nodes_hidden == 64

    frames = np.random.default_rng(0).standard_normal((8, 32)).astype(np.float32)
    want = Scorer(
        qnet, EngineConfig(backend="pallas", interpret=True, autotuned=False)
    ).score(frames)
    np.testing.assert_array_equal(sc.score(frames), want)

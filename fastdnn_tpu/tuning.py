"""Measured block-size registry: autotune results become engine defaults.

The reference's one tuning knob is the batch_size cache-blocking parameter
(/root/reference/src/cpp/dnn.cc:301-317) — its whole point is matching the
loop nest to the memory hierarchy, by hand.  Here the equivalent knobs are
the Pallas grid block sizes (EngineConfig.block_*), and this module closes
the loop so they are chosen by RECORDED MEASUREMENT, not by hand:

    python tools/autotune.py --commit      # sweep on device, write registry
    Scorer(...)                            # consults the registry

Registry files: `fastdnn_tpu/tuned.json` (package data) merged with the
per-user state file `$XDG_STATE_HOME/fastdnn_tpu/tuned.json` (user entries
win; `--commit` writes there when the package dir is read-only, e.g.
site-packages installs).  Override both with FASTDNN_TUNED=<path>, disable
with FASTDNN_TUNED=0.  One entry per (net topology, device kind, batch)
triple:

    {"net": "432-7x2048-8000", "device_kind": "TPU v5 lite", "batch": 8192,
     "best_ms": 2.31, "knobs": {"block_frames": 1024, ...}}

Lookup policy (Scorer.__init__): a block knob the caller set EXPLICITLY
(different from the EngineConfig class default) always wins — the registry
fills in only knobs left at their hand defaults.  Without a matching
(net, device) entry the hand defaults stand, so CPU tests and unknown
topologies are unaffected.  With several batches recorded, the entry with
the largest batch wins by default (the throughput regime the engine
optimizes for); callers scoring fixed small batches set
EngineConfig(tuned_batch=N) and the nearest recorded batch wins instead.
Set EngineConfig(autotuned=False) to ignore the registry entirely.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

#: EngineConfig fields the registry may override
BLOCK_KEYS = (
    "block_frames",
    "block_nodes_hidden",
    "block_frames_out",
    "block_nodes_out",
)


def _package_registry_path() -> str:
    return os.path.join(os.path.dirname(__file__), "tuned.json")


def _user_registry_path() -> str:
    """Per-user state file: where `autotune --commit` lands when the package
    directory is read-only (site-packages installs, ADVICE r4)."""
    base = os.environ.get("XDG_STATE_HOME") or os.path.join(
        os.path.expanduser("~"), ".local", "state"
    )
    return os.path.join(base, "fastdnn_tpu", "tuned.json")


def registry_paths() -> list:
    """Registry files to READ, in precedence order (later entries win on key
    conflicts): package file first, user state file second.  FASTDNN_TUNED
    overrides both with a single explicit path; =0/'' disables."""
    env = os.environ.get("FASTDNN_TUNED")
    if env == "0" or env == "":
        return []
    if env:
        return [env]
    return [_package_registry_path(), _user_registry_path()]


def registry_path() -> Optional[str]:
    """The registry file to WRITE (merge_entry/save_registry target), or
    None when disabled.  The package file when its directory is writable
    (dev checkouts — the file should be committed to git), the per-user
    state file otherwise."""
    env = os.environ.get("FASTDNN_TUNED")
    if env == "0" or env == "":
        return None
    if env:
        return env
    pkg = _package_registry_path()
    if _dir_writable(os.path.dirname(pkg)):
        return pkg
    return _user_registry_path()


def _dir_writable(d: str) -> bool:
    return os.access(d, os.W_OK)


def _read_entries(path: str) -> list:
    if not os.path.exists(path):
        return []
    try:
        with open(path) as f:
            data = json.load(f)
        return list(data.get("entries", []))
    except Exception:  # a corrupt registry must never block scoring
        return []


def load_registry(path: Optional[str] = None) -> list:
    """Entries visible to lookup; [] when absent/disabled/unreadable.

    With an explicit `path`, just that file.  Default: the package file
    merged with the user state file, user entries replacing package entries
    with the same (net, device_kind, batch) key.
    """
    if path is not None:
        return _read_entries(path)
    merged: dict = {}
    for p in registry_paths():
        for e in _read_entries(p):
            merged[(e.get("net"), e.get("device_kind"), e.get("batch"))] = e
    return list(merged.values())


def save_registry(entries: list, path: Optional[str] = None) -> None:
    path = path or registry_path()
    if not path:
        raise ValueError("registry disabled (FASTDNN_TUNED=0)")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"entries": entries}, f, indent=1, sort_keys=True)
        f.write("\n")


def merge_entry(entry: dict, path: Optional[str] = None) -> list:
    """Insert/replace the entry with the same (net, device_kind, batch) key.

    Reads and rewrites ONLY the write-target file (registry_path()), so a
    read-only package registry never gets copied wholesale into the user
    state file — lookups merge the two at read time instead.
    """
    path = path or registry_path()
    if not path:
        raise ValueError("registry disabled (FASTDNN_TUNED=0)")
    key = (entry["net"], entry["device_kind"], entry["batch"])
    entries = [
        e
        for e in _read_entries(path)
        if (e.get("net"), e.get("device_kind"), e.get("batch")) != key
    ]
    entries.append(entry)
    entries.sort(key=lambda e: (e["net"], e["device_kind"], e["batch"]))
    save_registry(entries, path)
    return entries


def net_key(qnet) -> str:
    """Canonical topology string for a (Quantized)Net, e.g. 432-7x2048-8000.

    Uses dims as loaded (input already x4-aligned by the model file), BEFORE
    MXU padding — Scorer consults the registry before pad_qnet_for_tpu.
    Unequal hidden widths fall back to the full dash-joined dim list.
    """
    dims = [qnet.input_dim] + qnet.layer_dims()
    hidden, out = dims[1:-1], dims[-1]
    if hidden and all(h == hidden[0] for h in hidden):
        return f"{dims[0]}-{len(hidden)}x{hidden[0]}-{out}"
    return "-".join(str(d) for d in dims)


def lookup(
    net: str,
    device_kind: str,
    batch: Optional[int] = None,
    registry: Optional[list] = None,
) -> Optional[dict]:
    """Tuned knobs for (net, device_kind), or None.

    batch=None returns the largest-batch entry (throughput regime);
    otherwise the entry with the nearest recorded batch.
    """
    entries = [
        e
        for e in (registry if registry is not None else load_registry())
        if e.get("net") == net and e.get("device_kind") == device_kind
    ]
    if not entries:
        return None
    if batch is None:
        best = max(entries, key=lambda e: e.get("batch", 0))
    else:
        best = min(entries, key=lambda e: abs(e.get("batch", 0) - batch))
    return dict(best.get("knobs", {}))


def apply_tuned(config, qnet, device_kind: str):
    """EngineConfig with registry knobs filled into hand-default fields.

    Explicitly-set knobs (field != class default) always win; returns the
    config unchanged when autotuning is off, no entry matches, or every
    block knob was explicit.
    """
    if not getattr(config, "autotuned", True):
        return config
    knobs = lookup(
        net_key(qnet), device_kind,
        batch=getattr(config, "tuned_batch", None),
    )
    if not knobs:
        return config
    defaults = {
        f.name: f.default for f in dataclasses.fields(type(config))
        if f.name in BLOCK_KEYS
    }
    updates = {
        k: v
        for k, v in knobs.items()
        if k in BLOCK_KEYS and getattr(config, k) == defaults[k]
        and v != defaults[k]
    }
    if not updates:
        return config
    return dataclasses.replace(config, **updates)

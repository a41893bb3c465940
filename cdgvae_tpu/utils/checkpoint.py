"""Checkpointing: params + optimizer state + step + config metadata.

The reference saves only a final ``state_dict`` with the config riding along
as wandb artifact metadata (reference main.py:233-240, inference.py:71-76).
Here checkpoints carry params + optimizer state + step AND the config is
embedded IN the checkpoint directory, so eval scripts can rebuild the exact
model from the file alone — preserving the reference's "config travels with
the checkpoint" contract (wandb artifact metadata) without the wandb
dependency. Storage is a host-side pickle + config.json: these models are
KB-to-MB scale, where sharded/async checkpointing (orbax) would be overhead
with no benefit.
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Any

import jax
import numpy as np


def _to_host(tree):
    # jax.device_get, NOT a per-leaf np.asarray tree_map: device_get
    # stages copy_to_host_async for EVERY leaf before gathering, so the
    # transfer is one pipelined burst. Per-leaf np.asarray serializes one
    # device->host round trip per leaf — measured 40-60 s per save for
    # the ~3k-leaf CelebA params+Adam tree through the axon tunnel
    # (~25-65 ms RTT each), which dominated long-run wall time at the
    # every-10-epoch checkpoint cadence (docs/PERF.md round 4).
    return jax.device_get(tree)


def save_checkpoint(path: str, params, opt_state=None, step: int = 0,
                    config: dict | None = None,
                    extras: dict | None = None):
    """Write a self-describing checkpoint directory.

    ``extras``: auxiliary state trees keyed by name (e.g. the InfoMax
    discriminator's params/optimizer state) — restored verbatim by
    load_checkpoint; absent in older checkpoints (loads as None).
    """
    os.makedirs(path, exist_ok=True)
    payload = {
        "params": _to_host(params),
        "opt_state": _to_host(opt_state) if opt_state is not None else None,
        "step": step,
    }
    if extras is not None:
        payload["extras"] = {k: _to_host(v) for k, v in extras.items()}
    # atomic replace: mid-run checkpoints overwrite the same files, so a
    # crash during the write must not destroy the previous good checkpoint
    # (the whole point of --resume). Write-to-temp + os.replace keeps the
    # old state.pkl intact until the new one is fully on disk.
    atomic_write(os.path.join(path, "state.pkl"), "wb",
                 lambda f: pickle.dump(payload, f))
    if config is not None:
        atomic_write(os.path.join(path, "config.json"), "w",
                     lambda f: json.dump(_jsonable(config), f, indent=2,
                                         sort_keys=True))


def atomic_write(dest: str, mode: str, write):
    tmp = dest + ".tmp"
    with open(tmp, mode) as f:
        write(f)
    os.replace(tmp, dest)


def load_checkpoint(path: str) -> dict[str, Any]:
    """Returns {'params', 'opt_state', 'step', 'config', 'extras'}."""
    with open(os.path.join(path, "state.pkl"), "rb") as f:
        payload = pickle.load(f)
    cfg_path = os.path.join(path, "config.json")
    payload["config"] = None
    payload.setdefault("extras", None)  # pre-extras checkpoints
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            payload["config"] = json.load(f)
    return payload


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj

"""Checkpointing: params + optimizer state + step + config metadata.

The reference saves only a final ``state_dict`` with the config riding along
as wandb artifact metadata (reference main.py:233-240, inference.py:71-76).
Here checkpoints carry params + optimizer state + step AND the config is
embedded IN the checkpoint directory, so eval scripts can rebuild the exact
model from the file alone — preserving the reference's "config travels with
the checkpoint" contract (wandb artifact metadata) without the wandb
dependency. Storage is a host-side pickle + config.json (no orbax: the
trees are MB-to-sub-GB scale and unsharded). For trees big enough that the
device->host pull matters (CelebA: 590 MB ≈ 25 s through the device
tunnel), :class:`AsyncCheckpointer` overlaps the pull with training while
writing the SAME canonical layout.
"""
from __future__ import annotations

import json
import os
import pickle
import threading
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _to_host(tree):
    # Chunked device_get (NOT per-leaf np.asarray, NOT one monolithic
    # device_get): per-leaf serializes ~3k tunnel round trips (40-60 s,
    # the round-4 finding); one whole-tree device_get pipelines but was
    # measured pathological on the tunnel transport for the 591 MB
    # CelebA tree (156 s vs 28 s chunked, round-5 probe, docs/PERF.md).
    # ~8 MB batches keep each transaction sub-second and pipelined.
    return _to_host_chunked(tree)


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


# one-dispatch device-side tree copy. jnp.copy (copy_p) guarantees the
# outputs are FRESH buffers (jit without donation never aliases outputs
# onto inputs, and copy_p defeats the return-input-unchanged shortcut),
# so the snapshot stays valid even after the caller's buffers are donated
# into the next training dispatch. Cost: one HBM round trip of the tree
# (~1 ms for the 590 MB CelebA params+Adam tree at HBM bandwidth) —
# vs ~25 s for the synchronous device->host pull it makes overlappable.
_snapshot = jax.jit(lambda t: jax.tree.map(jnp.copy, t))


def _to_host_chunked(tree, byte_budget: int = 8 << 20):
    """device_get in ~byte_budget-sized leaf batches.

    One monolithic ``jax.device_get`` of the 590 MB CelebA tree occupies
    the device tunnel for ~20 s, and the tunnel serializes requests — so
    a background pull HEAD-OF-LINE-BLOCKS the train loop's next dispatch
    and "async" saves barely overlap (measured: async ≈ sync − pickle
    only, docs/PERF.md round 5). Pulling in small batches keeps each
    tunnel transaction ~sub-second, letting dispatch messages interleave;
    total transfer time is unchanged (bandwidth-bound) but it now rides
    UNDER compute instead of in front of it.
    """
    leaves, treedef = jax.tree.flatten(tree)
    out, batch, size = [], [], 0
    for leaf in leaves:
        batch.append(leaf)
        size += getattr(leaf, "nbytes", 0)
        if size >= byte_budget:
            out.extend(jax.device_get(batch))
            batch, size = [], 0
    if batch:
        out.extend(jax.device_get(batch))
    return jax.tree.unflatten(treedef, out)


class AsyncCheckpointer:
    """Overlap checkpoint saves with continued training.

    ``save_checkpoint`` blocks the train loop for the full device->host
    pull (~25 s for the CelebA-scale tree through the device tunnel,
    docs/PERF.md round 4). This class makes the save asynchronous in two
    steps: (1) SNAPSHOT the state tree on device (one jitted copy, ~ms,
    see ``_snapshot``) so the caller may immediately donate its buffers
    into the next dispatch; (2) pull + pickle the snapshot in a
    background thread via the ordinary :func:`save_checkpoint` (same
    canonical on-disk layout — sync and async saves are byte-equivalent
    and load identically).

    At most ONE save is in flight: a second :meth:`save` blocks until
    the first lands (double-buffered, bounded memory — one extra copy of
    the tree on device + one on host). Thread failures are re-raised on
    the next :meth:`save`/:meth:`wait`. Call :meth:`wait` before the
    final synchronous save / process exit.
    """

    def __init__(self):
        self._thread: threading.Thread | None = None
        self._err: BaseException | None = None

    def save(self, path: str, params, opt_state=None, step: int = 0,
             config: dict | None = None, extras: dict | None = None):
        self.wait()  # one save in flight; surface earlier failures
        snap_p, snap_o, snap_x = _snapshot((params, opt_state, extras))

        def _work():
            try:
                # chunked pull: sub-second tunnel transactions so the
                # train loop's dispatches interleave (see _to_host_chunked)
                h_p, h_o, h_x = _to_host_chunked((snap_p, snap_o, snap_x))
                save_checkpoint(path, h_p, opt_state=h_o, step=step,
                                config=config, extras=h_x)
            except BaseException as e:  # surfaced by the next save/wait
                self._err = e

        self._thread = threading.Thread(target=_work, daemon=True,
                                        name="async-ckpt")
        self._thread.start()

    def wait(self):
        """Block until the in-flight save (if any) lands; raise if it
        failed."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("async checkpoint save failed") from err


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

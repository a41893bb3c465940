"""AsyncCheckpointer: overlapped saves must be indistinguishable on disk
from synchronous ones (round-5 ask: overlap the 590 MB CelebA device->host
pull with training; utils/checkpoint.py::AsyncCheckpointer)."""
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cdgvae_tpu.utils import checkpoint as ck
from cdgvae_tpu.utils.checkpoint import (AsyncCheckpointer, load_checkpoint,
                                         save_checkpoint)


def _tree(seed=0):
    r = np.random.default_rng(seed)
    params = {"w": jnp.asarray(r.normal(size=(4, 3)), jnp.float32),
              "b": jnp.asarray(r.normal(size=(3,)), jnp.float32)}
    opt = {"mu": jax.tree.map(jnp.zeros_like, params),
           "count": jnp.asarray(7, jnp.int32)}
    return params, opt


def _assert_tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_async_save_bytes_equal_sync(tmp_path):
    """Async and sync saves of the same state load identically (same
    canonical layout — the resume contract is layout-neutral)."""
    params, opt = _tree()
    cfg = {"seed": 1, "lambda": 5.0}
    extras = {"d_params": {"v": jnp.arange(3.0)}}
    save_checkpoint(str(tmp_path / "sync"), params, opt_state=opt,
                    step=11, config=cfg, extras=extras)
    s = AsyncCheckpointer()
    s.save(str(tmp_path / "async"), params, opt_state=opt,
           step=11, config=cfg, extras=extras)
    s.wait()
    a, b = (load_checkpoint(str(tmp_path / d)) for d in ("sync", "async"))
    _assert_tree_equal(a["params"], b["params"])
    _assert_tree_equal(a["opt_state"], b["opt_state"])
    _assert_tree_equal(a["extras"], b["extras"])
    assert a["step"] == b["step"] == 11
    assert a["config"] == b["config"] == cfg


def test_async_save_snapshot_survives_donation(tmp_path):
    """The checkpoint must hold the values AT save() time even when the
    caller immediately donates its buffers into the next training dispatch
    (the scanned trainer donates post_epoch state, train/loop.py:131)."""
    params, opt = _tree()
    want = jax.device_get(params)
    s = AsyncCheckpointer()
    s.save(str(tmp_path / "ck"), params, opt_state=opt, step=1)
    # donate the caller's buffers into an update that overwrites them
    upd = jax.jit(lambda t: jax.tree.map(lambda x: x * 0 - 1.0, t),
                  donate_argnums=(0,))
    params = upd(params)
    s.wait()
    got = load_checkpoint(str(tmp_path / "ck"))["params"]
    _assert_tree_equal(got, want)
    # and the donated update really did produce different values
    assert float(np.asarray(params["b"])[0]) == -1.0


def test_async_single_flight_blocks(tmp_path, monkeypatch):
    """A second save() must block until the first lands: bounded memory,
    no unordered writes."""
    active = []
    max_conc = []
    real = save_checkpoint

    def slow_save(*a, **kw):
        active.append(1)
        max_conc.append(len(active))
        time.sleep(0.15)
        real(*a, **kw)
        active.pop()

    monkeypatch.setattr(ck, "save_checkpoint", slow_save)
    params, opt = _tree()
    s = AsyncCheckpointer()
    t0 = time.time()
    s.save(str(tmp_path / "ck"), params, opt_state=opt, step=1)
    s.save(str(tmp_path / "ck"), params, opt_state=opt, step=2)  # blocks
    assert time.time() - t0 >= 0.15
    s.wait()
    assert max(max_conc) == 1
    assert load_checkpoint(str(tmp_path / "ck"))["step"] == 2


def test_async_error_propagates(tmp_path, monkeypatch):
    """A failed background save must raise on the next wait()/save(), not
    vanish (a silent save failure would surface as an unresumable run)."""
    def boom(*a, **kw):
        raise OSError("disk full")

    monkeypatch.setattr(ck, "save_checkpoint", boom)
    params, opt = _tree()
    s = AsyncCheckpointer()
    s.save(str(tmp_path / "ck"), params, opt_state=opt, step=1)
    with pytest.raises(RuntimeError, match="async checkpoint"):
        s.wait()
    # the error is consumed: the saver is reusable afterwards
    monkeypatch.setattr(ck, "save_checkpoint", save_checkpoint)
    s.save(str(tmp_path / "ck"), params, opt_state=opt, step=3)
    s.wait()
    assert load_checkpoint(str(tmp_path / "ck"))["step"] == 3


def test_async_save_overlaps_main_thread(tmp_path, monkeypatch):
    """save() returns while the pull/pickle is still running (the whole
    point: the train loop keeps dispatching during the ~25 s transfer)."""
    landed = threading.Event()
    real = save_checkpoint

    def slow_save(*a, **kw):
        time.sleep(0.2)
        real(*a, **kw)
        landed.set()

    monkeypatch.setattr(ck, "save_checkpoint", slow_save)
    params, opt = _tree()
    s = AsyncCheckpointer()
    t0 = time.time()
    s.save(str(tmp_path / "ck"), params, opt_state=opt, step=1)
    assert time.time() - t0 < 0.15  # returned before the save landed
    assert not landed.is_set()
    s.wait()
    assert landed.is_set()

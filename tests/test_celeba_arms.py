"""scripts/celeba_arms.py worker logic: argv construction, done-marker
skip, final-checkpoint recovery — CPU-only (celeba_main is stubbed)."""
import argparse
import json
import os

import numpy as np

from scripts import celeba_arms as ca


def test_arm_argv_defaults_and_overrides():
    argv = ca._arm_argv({"tag": "_t", "lam": 50.0, "align_warmup": 300,
                         "epochs": 400,
                         "extra_args": ["--async_ckpt", "False"]},
                        "/c", "/a", 128, platform="cpu")
    s = " ".join(argv)
    assert "--lambda 50.0" in s and "--align_warmup 300" in s
    assert "--epochs 400" in s and "--platform cpu" in s
    assert "--async_ckpt False" in s
    assert "--ckpt_every 50" in s  # ARM_DEFAULTS
    assert "--torch_weights" not in s  # empty default omitted


def test_worker_skips_done_and_recovers_final_checkpoint(tmp_path,
                                                         monkeypatch):
    calls = []
    # celeba_arms.worker does `from cdgvae_tpu.cli import celeba_main`
    # inside the function: patch BOTH resolution paths (sys.modules for a
    # fresh import, the package attribute if it was already imported)
    import sys
    import types
    fake = types.ModuleType("fake_celeba_main")
    fake.main = lambda argv: calls.append(argv)
    monkeypatch.setitem(sys.modules, "cdgvae_tpu.cli.celeba_main", fake)
    import cdgvae_tpu.cli as cli_pkg
    monkeypatch.setattr(cli_pkg, "celeba_main", fake, raising=False)

    wd = str(tmp_path)
    args = argparse.Namespace(workdir=wd, corpus=os.path.join(wd, "c"),
                              img_size=32, platform="")
    arms = [{"tag": "_done", "epochs": 4},
            {"tag": "_recov", "epochs": 4},
            {"tag": "_fresh", "epochs": 4}]
    # arm 1: done marker -> skipped entirely
    with open(os.path.join(wd, "done_done.json"), "w") as f:
        json.dump({"tag": "_done"}, f)
    # arm 2: checkpoint already at its final epoch (marker write was
    # lost) -> marker recovered, no retraining
    from cdgvae_tpu.utils.checkpoint import save_checkpoint
    _, ckpt2, _ = ca.arm_paths(wd, arms[1])
    save_checkpoint(ckpt2, {"w": np.ones(2)}, step=4)

    ca.worker(args, arms)

    assert len(calls) == 1  # only _fresh trained
    assert "--epochs 4" in " ".join(calls[0])
    with open(os.path.join(wd, "done_recov.json")) as f:
        assert json.load(f)["recovered"] is True
    with open(os.path.join(wd, "done_fresh.json")) as f:
        mk = json.load(f)
    assert mk["resumed"] is False and mk["wall_s"] is not None

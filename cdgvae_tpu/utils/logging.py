"""Pluggable metric logging.

The reference hard-wires wandb into every entry point (main.py:36-50).
Here logging is a small pluggable sink: console always; wandb only if
installed AND requested; JSONL file sink for offline runs. Log keys are kept
byte-identical to the reference ('loss', 'recon', 'KL', 'alignment',
'MutualInfo', 'posterior_variance{i}', 'active') for curve parity.
"""
from __future__ import annotations

import json
import os
import time


class MetricLogger:
    def __init__(self, logdir: str | None = None, use_wandb: bool = False,
                 project: str = "CausalDisentangled", tags=(), config=None):
        self.logdir = logdir
        self._file = None
        if logdir:
            os.makedirs(logdir, exist_ok=True)
            self._file = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
            except ImportError:
                wandb = None  # silent fallback: wandb simply not installed
            if wandb is not None:
                try:
                    self._wandb = wandb.init(project=project,
                                             tags=list(tags), config=config)
                except Exception as e:
                    # auth/network/config failures must not kill training,
                    # but silently logging nothing would hide them
                    import sys
                    print(f"[MetricLogger] wandb.init failed, continuing "
                          f"without wandb: {e!r}", file=sys.stderr)

    def log(self, metrics: dict, step: int | None = None):
        if self._file:
            rec = {"time": time.time(), "step": step, **metrics}
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_image(self, key: str, path: str):
        if self._wandb is not None:
            import wandb
            self._wandb.log({key: wandb.Image(path)})

    def log_artifact(self, name: str, ckpt_dir: str,
                     metadata: dict | None = None, sources=()):
        """Publish a trained model as a wandb Artifact (reference
        main.py:233-240: the saved state dict plus the entry-point and
        model source files, config as metadata). No-op without wandb —
        the checkpoint directory itself already embeds the config
        (utils/checkpoint.py), which is the part eval depends on."""
        if self._wandb is None:
            return
        import wandb
        art = wandb.Artifact(name, type="model", metadata=metadata)
        art.add_dir(ckpt_dir)
        for src in sources:
            if src and os.path.exists(src):
                art.add_file(src)
        self._wandb.log_artifact(art)

    def finish(self):
        if self._file:
            self._file.close()
        if self._wandb is not None:
            self._wandb.finish()

"""Persistent XLA compilation cache.

Cold compiles on the TPU backend here run 30-450s for the larger programs;
enabling JAX's persistent compilation cache makes every subsequent process
reuse them. Called by the CLI entry points and bench.py.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get(
        "CDGVAE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "cdgvae_tpu",
                     "xla_cache"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the flags
    return path

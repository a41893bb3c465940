"""Device mesh construction and sharding helpers.

The reference has no parallelism of any kind (single cuda:0 device,
reference main.py:118; see SURVEY.md §2.7). In this framework data
parallelism is a first-class TPU citizen: a 1-D ``dp`` mesh over all local
chips, batches sharded over the mesh with ``NamedSharding``, parameters
replicated, and the fused jit train step auto-partitioned by XLA (GSPMD) so
the gradient all-reduce rides the ICI as a compiler-inserted psum.

The models here are far too small for tensor/pipeline parallelism — DP is the
only strategy that pays (SURVEY.md §2.7) — but the mesh helpers accept
arbitrary axis layouts for forward compatibility.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} devices are visible; for CPU testing set "
                "JAX_PLATFORMS=cpu and XLA_FLAGS="
                f"--xla_force_host_platform_device_count={n_devices}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, *arrays, axis: str = "dp"):
    """Place arrays batch-sharded over the mesh's dp axis."""
    sh = NamedSharding(mesh, P(axis))
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

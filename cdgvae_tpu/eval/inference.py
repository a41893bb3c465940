"""Counterfactual inference: latent ranges, diagnostics, do-intervention grids.

Library form of reference inference.py:161-334. All hot paths are jitted and
batched: the full-dataset deterministic encode is one vmapped pass, and the
do-intervention sweep — the reference's eager 4×7 Python loop with a
100-iteration flow inverse per cell (inference.py:298-327) — runs as a jitted
batch per node.
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.losses import clipped_bce_probs


@lru_cache(maxsize=32)
def _encode_fn(model):
    # jitted once per model (a fresh lambda per call would retrace)
    return jax.jit(lambda p, x: model.encode(p, x, deterministic=True))


def encode_dataset(model, params, x_data, batch_size: int = 512):
    """Deterministic encode of the whole dataset.

    Returns dict of host arrays: mean, logvar, epsilon (=mean), orig_latent,
    latent, logdet (reference inference.py:161-175; the reference's
    align_latent equals ``latent`` here because the encode is
    deterministic).
    """
    enc = _encode_fn(model)
    outs = []
    for i in range(0, len(x_data), batch_size):
        outs.append(jax.device_get(enc(params, x_data[i: i + batch_size])))
    mean, logvar, eps, orig, latent, logdet = (
        np.concatenate([o[k] for o in outs], axis=0) for k in range(6))
    return {
        "mean": mean, "logvar": logvar, "epsilon": eps,
        "orig_latent": orig, "latent": latent, "logdet": logdet,
    }


def latent_ranges(encoded: dict):
    """(orig_min, orig_max, latent_min, latent_max) per node
    (reference inference.py:183-191)."""
    return (encoded["orig_latent"].min(0), encoded["orig_latent"].max(0),
            encoded["latent"].min(0), encoded["latent"].max(0))


def _decode_image(model, params, latent):
    dec = model.decode(params, latent)
    return dec[1] if isinstance(dec, tuple) else dec


@lru_cache(maxsize=32)
def _sweep_fn(model):
    @partial(jax.jit, static_argnames=("do_index", "deterministic"))
    def sweep(params, x, values, rng, do_index, deterministic):
        _, _, eps, _, latent, _ = model.encode(
            params, x, rng=None if deterministic else rng,
            deterministic=deterministic)

        def one(v):
            z_do = model.graph.do_intervention(
                params["causal"], latent, eps, do_index, v)
            return _decode_image(model, params, z_do)[0]

        return jax.vmap(one)(values)

    return sweep


def do_sweep(model, params, x_sample, do_index: int, values,
             deterministic: bool = True, rng=None):
    """Counterfactual sweep: decode do(z_{do_index} := v) for each v.

    x_sample: [1, H, W, 3] (the reference sweeps a single image,
    inference.py:298-327). Returns [len(values), H, W, 3].
    ``deterministic=False`` sweeps from a posterior sample drawn with
    ``rng`` instead of the mean encode.
    """
    values = jnp.asarray(values, jnp.float32)
    rng = rng if rng is not None else jax.random.key(0)
    return np.asarray(_sweep_fn(model)(params, x_sample, values, rng,
                                       do_index, deterministic))


def do_grid(model, params, x_sample, latent_min, latent_max,
            n_values: int = 7):
    """Full do-intervention grid [node, n_values, H, W, 3]
    (reference inference.py:298-334). Sweep values are the dataset's
    transformed-latent min/max linspace, rounded to 1 decimal like the
    reference (inference.py:303)."""
    rows = []
    for do_index in range(model.node):
        vals = np.round(np.linspace(latent_min[do_index],
                                    latent_max[do_index], n_values), 1)
        rows.append(do_sweep(model, params, x_sample, do_index, vals))
    return np.stack(rows, axis=0)


def alignment_cross_entropy(encoded: dict, labels: np.ndarray) -> np.ndarray:
    """Per-node mean BCE of sigmoid(align latents) vs labels
    (reference inference.py:231-236). Returns [node]."""
    z = encoded["latent"]
    y = labels[:, : z.shape[1]]
    p = 1.0 / (1.0 + np.exp(-z))
    return np.asarray(clipped_bce_probs(p, y)).mean(axis=0)

"""Counterfactual inference: latent ranges, diagnostics, do-intervention grids.

Library form of reference inference.py:161-334. All hot paths are jitted and
batched: the full-dataset deterministic encode is one vmapped pass, and the
do-intervention sweep — the reference's eager 4×7 Python loop with a
100-iteration flow inverse per cell (inference.py:298-327) — runs as a jitted
batch per node.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def encode_dataset(model, params, x_data, batch_size: int = 512):
    """Deterministic encode of the whole dataset.

    Returns dict of host arrays: mean, logvar, epsilon (=mean), orig_latent,
    latent, align_latent (reference inference.py:161-175).
    """
    enc = jax.jit(lambda p, x: model.encode(p, x, deterministic=True))
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


def do_sweep(model, params, x_sample, do_index: int, values,
             deterministic: bool = True):
    """Counterfactual sweep: decode do(z_{do_index} := v) for each v.

    x_sample: [1, H, W, 3] (the reference sweeps a single image,
    inference.py:298-327). Returns [len(values), H, W, 3].
    """
    values = jnp.asarray(values, jnp.float32)

    @partial(jax.jit, static_argnames=())
    def sweep(params, x, values):
        _, _, eps, _, latent, _ = model.encode(params, x,
                                               deterministic=True)

        def one(v):
            z_do = model.graph.do_intervention(
                params["causal"], latent, eps, do_index, v)
            return _decode_image(model, params, z_do)[0]

        return jax.vmap(one)(values)

    return np.asarray(sweep(params, x_sample, values))


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
    p = np.clip(p, 1e-7, 1 - 1e-7)
    bce = -(y * np.log(p) + (1 - y) * np.log(1 - p))
    return bce.mean(axis=0)

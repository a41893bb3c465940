"""Auxiliary models: InfoMax discriminator, masked factor classifier (the CDM
metric's ground-truth probe), and the downstream classifier.

Functional re-designs of reference modules/model.py:191-206 (Discriminator),
:306-325 (Classifier), :327-343 (DownstreamClassifier). The per-node masked
classifier evaluates its ``node`` MLPs as one stacked batched matmul over a
leading node axis instead of a Python module loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import nn


class Discriminator:
    """InfoMax MI discriminator on concat(flatten(x), eps)
    (reference modules/model.py:191-206)."""

    def __init__(self, node: int, image_size: int = 64, hidden: int = 300,
                 dtype=jnp.float32):
        self.in_dim = 3 * image_size * image_size + node
        self.hidden = hidden
        self.dtype = dtype

    def init(self, key: jax.Array) -> dict:
        return {"net": nn.mlp_init(
            key, [self.in_dim, self.hidden, self.hidden, 1], self.dtype)}

    def __call__(self, params, x, z):
        h = jnp.concatenate([x.reshape(x.shape[0], -1), z], axis=1)
        return nn.mlp(params["net"], h)


class FactorClassifier:
    """Per-node MLP on the masked image x*m_j -> logit; the pretrained probe
    used by the CDM metric (reference modules/model.py:306-325,
    main_classifier.py)."""

    def __init__(self, masks, node: int, image_size: int = 64,
                 hidden: int = 300, dtype=jnp.float32):
        self.node = node
        self.image_size = image_size
        self.in_dim = 3 * image_size * image_size
        self.hidden = hidden
        self.masks = jnp.asarray(masks, dtype=dtype)  # [node, H, W, 3]
        assert self.masks.shape[0] == node
        self.dtype = dtype

    def init(self, key: jax.Array) -> dict:
        return {"classify": nn.stacked_mlp_init(
            key, self.node, [self.in_dim, self.hidden, self.hidden, 1],
            self.dtype)}

    def __call__(self, params, x):
        """x [batch, H, W, 3] -> logits [batch, node]."""
        masked = x[None] * self.masks[:, None]          # [node,batch,H,W,3]
        flat = masked.reshape(self.node, x.shape[0], -1)
        out = nn.stacked_mlp(params["classify"], flat)   # [node,batch,1]
        return jnp.transpose(out[..., 0])                # [batch,node]


class DownstreamClassifier:
    """node -> 2 -> 1 sigmoid MLP on latent means (reference
    modules/model.py:327-343); used by sample-efficiency and DR robustness."""

    def __init__(self, in_dim: int, dtype=jnp.float32):
        self.in_dim = in_dim
        self.dtype = dtype

    def init(self, key: jax.Array) -> dict:
        return {"classify": nn.mlp_init(key, [self.in_dim, 2, 1], self.dtype)}

    def __call__(self, params, x):
        return nn.mlp(params["classify"], x,
                      final_activation=jax.nn.sigmoid)

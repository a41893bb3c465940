"""Tabular-family models: VAE, CDG-VAE, CDG-TVAE
(reference tabular/modules/model.py:102-460).

These are tiny MLPs (widths 2-32) with dataset-conditional depths; each
decoder block can have a different output width (the ``mask`` list of output
column counts, tabular/main.py:189-196), so blocks are evaluated as a static
Python unroll — at these sizes XLA fuses the whole model into a few kernels
and a stacked-matmul would buy nothing.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from .. import nn
from ..ops.causal import CausalGraph
from .vae import VAEOutput


def _encoder_sizes(dataset: str, input_dim: int, node: int):
    if dataset == "covtype":
        return [input_dim, 4, 4, 4, node * 2]
    return [input_dim, 4, node * 2]


def _decoder_sizes(dataset: str, node: int, input_dim: int):
    if dataset == "loan":
        return [node, 4, input_dim]
    if dataset == "adult":
        return [node, 8, 8, 16, input_dim]
    if dataset == "covtype":
        return [node, 8, 8, 16, input_dim - 1 + 7]
    raise ValueError("Not supported dataset!")


class TabularVAE:
    """Single-decoder tabular VAE (tabular/modules/model.py:102-217)."""

    def __init__(self, graph: CausalGraph, dataset: str, input_dim: int,
                 dtype=jnp.float32):
        self.graph = graph
        self.node = graph.node
        self.dataset = dataset
        self.input_dim = input_dim
        self.dtype = dtype

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "encoder": nn.mlp_init(
                k1, _encoder_sizes(self.dataset, self.input_dim, self.node),
                self.dtype),
            "causal": self.graph.init(k2),
            "decoder": nn.mlp_init(
                k3, _decoder_sizes(self.dataset, self.node, self.input_dim),
                self.dtype),
        }

    def get_posterior(self, params, x):
        h = nn.mlp(params["encoder"], x)
        return h[:, : self.node], h[:, self.node:]

    def encode(self, params, x, rng=None, deterministic=False):
        mean, logvar = self.get_posterior(params, x)
        if deterministic or rng is None:
            epsilon = mean
        else:
            noise = jax.random.normal(rng, mean.shape, mean.dtype)
            epsilon = mean + jnp.exp(logvar / 2.0) * noise
        orig_latent, latent, logdet = self.graph.transform(
            params["causal"], epsilon)
        return mean, logvar, epsilon, orig_latent, latent, logdet

    def decode(self, params, latent):
        return nn.mlp(params["decoder"], latent)

    def __call__(self, params, x, rng=None, deterministic=False) -> VAEOutput:
        mean, logvar, epsilon, orig_latent, latent, logdet = self.encode(
            params, x, rng, deterministic)
        xhat = self.decode(params, latent)
        _, align_latent, _ = self.graph.transform(params["causal"], mean)
        return VAEOutput(mean, logvar, epsilon, orig_latent, latent, logdet,
                         align_latent, None, xhat)


class TabularCDGVAE:
    """Per-factor block decoders with per-block output widths; outputs
    concatenated, NOT spatially masked (tabular/modules/model.py:337-342)."""

    # per-dataset hidden sizes for a block decoder
    def _block_sizes(self, i: int, k: int, m: int):
        if self.dataset == "covtype":
            if i == self.K - 1:  # deeper last block (model.py:287-297)
                return [k, 4, 4, 8, m]
            return [k, 2, 2, m]
        return [k, 2, m]

    def __init__(self, graph: CausalGraph, dataset: str, input_dim: int,
                 factor: Sequence[int], mask: Sequence[int],
                 dtype=jnp.float32):
        assert sum(factor) == graph.node
        assert len(factor) == len(mask)
        self.graph = graph
        self.node = graph.node
        self.dataset = dataset
        self.input_dim = input_dim
        self.factor = tuple(factor)
        self.mask = tuple(mask)  # output column counts per block
        self.K = len(factor)
        self.dtype = dtype

    def init(self, key):
        keys = jax.random.split(key, self.K + 2)
        return {
            "encoder": nn.mlp_init(
                keys[0],
                _encoder_sizes(self.dataset, self.input_dim, self.node),
                self.dtype),
            "causal": self.graph.init(keys[1]),
            "decoder": {
                f"block{i}": nn.mlp_init(
                    keys[2 + i],
                    self._block_sizes(i, self.factor[i], self.mask[i]),
                    self.dtype)
                for i in range(self.K)
            },
        }

    get_posterior = TabularVAE.get_posterior
    encode = TabularVAE.encode

    def decode(self, params, latent):
        """Returns (xhat_separated list, xhat concat [batch, sum(mask)])."""
        start, outs = 0, []
        for i, k in enumerate(self.factor):
            z = latent[:, start: start + k]
            outs.append(nn.mlp(params["decoder"][f"block{i}"], z))
            start += k
        return outs, jnp.concatenate(outs, axis=1)

    def __call__(self, params, x, rng=None, deterministic=False) -> VAEOutput:
        mean, logvar, epsilon, orig_latent, latent, logdet = self.encode(
            params, x, rng, deterministic)
        xhat_separated, xhat = self.decode(params, latent)
        _, align_latent, _ = self.graph.transform(params["causal"], mean)
        return VAEOutput(mean, logvar, epsilon, orig_latent, latent, logdet,
                         align_latent, xhat_separated, xhat)


class TVAE:
    """CDG-TVAE: CTGAN-style tabular VAE over DataTransformer encodings with
    learnable per-column observation noise sigma
    (tabular/modules/model.py:360-460)."""

    def __init__(self, graph: CausalGraph, input_dim: int,
                 factor: Sequence[int], mask: Sequence[int],
                 dtype=jnp.float32):
        assert sum(factor) == graph.node
        assert len(factor) == len(mask)
        self.graph = graph
        self.node = graph.node
        self.input_dim = input_dim
        self.factor = tuple(factor)
        self.mask = tuple(mask)
        self.K = len(factor)
        self.dtype = dtype

    def init(self, key):
        keys = jax.random.split(key, self.K + 2)
        return {
            "encoder": nn.mlp_init(
                keys[0], [self.input_dim, 32, 16, 16, self.node * 2],
                self.dtype),
            "causal": self.graph.init(keys[1]),
            "decoder": {
                f"block{i}": nn.mlp_init(
                    keys[2 + i], [self.factor[i], 8, 8, 16, self.mask[i]],
                    self.dtype)
                for i in range(self.K)
            },
            "sigma": jnp.full((self.input_dim,), 0.1, self.dtype),
        }

    def get_posterior(self, params, x):
        h = nn.mlp(params["encoder"], x, activation=jax.nn.relu)
        return h[:, : self.node], h[:, self.node:]

    def encode(self, params, x, rng=None, deterministic=False):
        mean, logvar = self.get_posterior(params, x)
        if deterministic or rng is None:
            epsilon = mean
        else:
            noise = jax.random.normal(rng, mean.shape, mean.dtype)
            epsilon = mean + jnp.exp(logvar / 2.0) * noise
        orig_latent, latent, logdet = self.graph.transform(
            params["causal"], epsilon)
        return mean, logvar, epsilon, orig_latent, latent, logdet

    def decode(self, params, latent):
        start, outs = 0, []
        for i, k in enumerate(self.factor):
            z = latent[:, start: start + k]
            outs.append(nn.mlp(params["decoder"][f"block{i}"], z,
                               activation=jax.nn.relu))
            start += k
        return outs, jnp.concatenate(outs, axis=1)

    def __call__(self, params, x, rng=None, deterministic=False) -> VAEOutput:
        mean, logvar, epsilon, orig_latent, latent, logdet = self.encode(
            params, x, rng, deterministic)
        xhat_separated, xhat = self.decode(params, latent)
        _, align_latent, _ = self.graph.transform(params["causal"], mean)
        return VAEOutput(mean, logvar, epsilon, orig_latent, latent, logdet,
                         align_latent, xhat_separated, xhat)


class TabularDiscriminator:
    """InfoMax discriminator for tabular inputs
    (tabular/modules/model.py:219-232)."""

    def __init__(self, input_dim: int, node: int, dtype=jnp.float32):
        self.input_dim = input_dim
        self.node = node
        self.dtype = dtype

    def init(self, key):
        return {"net": nn.mlp_init(
            key, [self.input_dim + self.node, 4, 1], self.dtype)}

    def __call__(self, params, x, z):
        h = jnp.concatenate([x.reshape(x.shape[0], -1), z], axis=1)
        return nn.mlp(params["net"], h)

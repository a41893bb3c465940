"""Model factory: build models + causal graphs from a config dict.

Centralises what each reference entry point does inline (B construction
main.py:137-147, decoder masks main.py:167-179, model dispatch
main.py:149-185, DR deltas DR/main.py) so the four experiment families share
one code path.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .ops.causal import CausalGraph, scale_adjacency
from .models.vae import VAE, CDGVAE, pendulum_masks
from .models.classifier import Discriminator


def pendulum_B(node: int = 4, adjacency_scaling: bool = True) -> np.ndarray:
    """light->length, light->position, angle->length, angle->position
    (reference main.py:131-147). For the DR family (node=5) the 5th
    (spurious background) node is isolated (DR/main.py)."""
    B = np.zeros((node, node))
    B[0, 2] = B[0, 3] = B[1, 2] = B[1, 3] = 1.0
    if adjacency_scaling:
        B = scale_adjacency(B)
    return B


def build_graph(config: dict, B: np.ndarray) -> CausalGraph:
    return CausalGraph(
        B,
        scm=config["scm"],
        flow_num=config.get("flow_num", 1),
        inverse_loop=config.get("inverse_loop", 100),
    )


def build_pendulum_model(config: dict, spurious: bool = False):
    """Build the pendulum-family model named by config['model'].

    Returns (model, discriminator-or-None). ``spurious=True`` selects the DR
    wiring: node=5, spurious 5th latent concatenated into every decoder block
    (DR/modules/model.py:245, :283-288).
    """
    node = config["node"]
    image_size = config["image_size"]
    B = pendulum_B(node, config.get("adjacency_scaling", True))
    graph = build_graph(config, B)

    name = config["model"]
    if name in ("VAE", "InfoMax"):
        model = VAE(graph, image_size=image_size)
        disc = (Discriminator(node, image_size=image_size)
                if name == "InfoMax" else None)
        return model, disc

    if name in ("CDGVAE", "CDGVAEsemi"):
        factor = config["factor"]
        masks = pendulum_masks(image_size, k=len(factor))
        block_indices = None
        if spurious:
            # every block additionally sees the spurious latent (index node-1)
            start, block_indices = 0, []
            for k in factor:
                block_indices.append(list(range(start, start + k)) +
                                     [node - 1])
                start += k
        model = CDGVAE(graph, masks, factor, image_size=image_size,
                       block_indices=block_indices)
        return model, None

    raise ValueError("Not supported model!")

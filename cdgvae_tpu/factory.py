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


def tabular_B(dataset: str, adjacency_scaling: bool = True) -> np.ndarray:
    """Per-dataset causal adjacency (reference tabular/main.py:138-168):
    loan/adult: chain roots -> sink; covtype: the 6-node DAG."""
    if dataset in ("loan", "adult"):
        node = 3
        B = np.zeros((node, node))
        B[:-1, -1] = 1
    elif dataset == "covtype":
        node = 6
        B = np.zeros((node, node))
        B[[0, 3, 4, 5], 1] = 1
        B[[3, 4, 5], 2] = 1
        B[[0, 5], 3] = 1
    else:
        raise ValueError("Not supported dataset!")
    if adjacency_scaling:
        B = scale_adjacency(B)
    return B


def build_tabular_model(config: dict):
    """Build the tabular-family model named by config['model'] for
    config['dataset']. Returns (model, discriminator-or-None)."""
    from .models.tabular import (TabularVAE, TabularCDGVAE, TVAE,
                                 TabularDiscriminator)
    from .data.tabular.datasets import DATASET_SPECS

    dataset = config["dataset"]
    spec = DATASET_SPECS[dataset]
    node = spec["node"]
    config.setdefault("node", node)
    config.setdefault("factor", spec["factor"])
    B = tabular_B(dataset, config.get("adjacency_scaling", True))
    graph = build_graph(config, B)
    input_dim = config.get("input_dim", spec["input_dim"])

    name = config["model"]
    if name in ("VAE", "InfoMax"):
        model = TabularVAE(graph, dataset, input_dim)
        disc = (TabularDiscriminator(input_dim, node)
                if name == "InfoMax" else None)
        return model, disc
    if name == "CDGVAE":
        return TabularCDGVAE(graph, dataset, input_dim,
                             spec["factor"], spec["mask"]), None
    if name == "TVAE":
        # mask = per-block output dims grouped from the transformer spans
        # (reference tabular/main_tvae.py:174-196) — must be in config
        return TVAE(graph, input_dim, spec["factor"],
                    config["tvae_mask"]), None
    raise ValueError("Not supported model!")


def tvae_block_mask(dataset: str, output_info_list) -> list[int]:
    """Group the transformer's per-column output dims into per-block output
    widths (reference tabular/main_tvae.py:174-196)."""
    decoder_dims = [sum(s.dim for s in col) for col in output_info_list]
    groups = {"loan": [2, 2, 1], "adult": [1, 1, 3],
              "covtype": [1, 1, 2, 1, 1, 1 + 7]}[dataset]
    bounds = np.cumsum([0] + groups)
    return [int(sum(decoder_dims[bounds[j]: bounds[j + 1]]))
            for j in range(len(groups))]

"""CelebA-family CDG-VAE: dual-latent model with SAGAN GAM decoders
(reference celeba/module/model.py:106-218).

Structure: ResNet encoder emits 2·node (causal) + 2·latent_dim (style)
posterior params. The causal latents go through the SEM + flows; the style
epsilon2 bypasses them. Five SAGAN generators form the masked GAM decoder
with hand-wired parent groups (model.py:189-195):
    [z_smile, z_cheek], [z_smile, z_mouth], [z_smile, z_chubby],
    [z_smile, z_male, z_eyes], [epsilon2]
each masked by its segmentation channel, summed, tanh.

Masks are passed PER CALL from the batch's own segmentation channels
(x[..., 3:8]) — a deliberate deviation from the reference quirk of freezing
the masks of one arbitrary batch at init (celeba/main.py:111); pass
``masks`` captured from a fixed batch to replicate the quirk exactly.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.causal import CausalGraph
from .resnet import ResNetEncoder
from .sagan import Generator, StackedGenerator, stack_generator_params


class CelebAOutput(NamedTuple):
    mean1: jax.Array
    logvar1: jax.Array
    epsilon1: jax.Array
    orig_latent: jax.Array
    latent: jax.Array
    logdet: jax.Array
    mean2: jax.Array
    logvar2: jax.Array
    epsilon2: jax.Array
    align_latent: jax.Array
    xhat_separated: Optional[tuple]
    xhat: jax.Array


# decoder parent groups over the 6 causal latents (model.py:189-195)
BLOCK_GROUPS = ([0, 2], [0, 3], [0, 4], [0, 1, 5])


class CelebACDGVAE:
    def __init__(self, graph: CausalGraph, latent_dim: int = 6,
                 image_size: int = 128, conv_dim: int = 32,
                 freeze_trunk: bool = True, stacked: bool = False,
                 dtype=jnp.float32):
        assert graph.node == latent_dim, \
            "reference samples epsilon2 noise with node-sized draws " \
            "(model.py:185-187); node must equal latent_dim"
        self.graph = graph
        self.node = graph.node
        self.latent_dim = latent_dim
        self.image_size = image_size
        self.K = len(BLOCK_GROUPS) + 1
        self.encoder = ResNetEncoder(
            out_dim=graph.node * 2 + latent_dim * 2,
            freeze_trunk=freeze_trunk, dtype=dtype)
        self.generators = [
            Generator(len(g), conv_dim=conv_dim, image_size=image_size,
                      dtype=dtype) for g in BLOCK_GROUPS
        ] + [Generator(latent_dim, conv_dim=conv_dim,
                       image_size=image_size, dtype=dtype)]
        # one vmapped program over all 5 generators (sagan.py::
        # StackedGenerator). A/B'd SLOWER on the real chip at both batch
        # 16 and 64 (docs/PERF.md round-3: XLA lowers the vmapped convs to
        # feature-grouped convolutions whose TPU emitter is slower than 5
        # sequential convs, outweighing the 5x DMA-descriptor saving) —
        # default stays per-generator; ``decode`` dispatches on the params
        # format, so checkpoints from either era run on either setting
        self.stacked = stacked
        self.stacked_gen = StackedGenerator(
            [len(g) for g in BLOCK_GROUPS] + [latent_dim],
            conv_dim=conv_dim, image_size=image_size, dtype=dtype)
        self.dtype = dtype

    def init(self, key) -> dict:
        ks = jax.random.split(key, self.K + 2)
        if self.stacked:
            decoder = {"stacked": stack_generator_params(
                [g.init(ks[2 + i]) for i, g in enumerate(self.generators)],
                self.stacked_gen.zmax)}
        else:
            decoder = {f"gen{i}": g.init(ks[2 + i])
                       for i, g in enumerate(self.generators)}
        return {
            "encoder": self.encoder.init(ks[0]),
            "causal": self.graph.init(ks[1]),
            "decoder": decoder,
        }

    def stack_decoder(self, params: dict) -> dict:
        """Convert a per-generator-era checkpoint's params to the stacked
        decoder format (exact functional equivalence — sagan.py::
        _pad_gen_input)."""
        if "stacked" in params["decoder"]:
            return params
        dec = {"stacked": stack_generator_params(
            [params["decoder"][f"gen{i}"] for i in range(self.K)],
            self.stacked_gen.zmax)}
        return {**params, "decoder": dec}

    def get_posterior(self, params, x):
        """x [B, H, W, >=3]; uses RGB channels only (model.py:159)."""
        h = self.encoder(params["encoder"], x[..., :3])
        n, m = self.node, self.latent_dim
        mean1, logvar1 = h[:, :n], h[:, n: 2 * n]
        mean2, logvar2 = h[:, 2 * n: 2 * n + m], h[:, 2 * n + m:]
        return mean1, logvar1, mean2, logvar2

    def encode(self, params, x, rng=None, deterministic=False):
        mean1, logvar1, mean2, logvar2 = self.get_posterior(params, x)
        if deterministic or rng is None:
            eps1, eps2 = mean1, mean2
        else:
            r1, r2 = jax.random.split(rng)
            eps1 = mean1 + jnp.exp(logvar1 / 2.0) * jax.random.normal(
                r1, mean1.shape, mean1.dtype)
            eps2 = mean2 + jnp.exp(logvar2 / 2.0) * jax.random.normal(
                r2, mean2.shape, mean2.dtype)
        orig_latent, latent, logdet = self.graph.transform(
            params["causal"], eps1)
        return (mean1, logvar1, eps1, orig_latent, latent, logdet), \
            (mean2, logvar2, eps2)

    def decode(self, params, latent, epsilon2, masks, rng):
        """latent [B, node], epsilon2 [B, latent_dim],
        masks [B, H, W, 5] segmentation channels. Returns
        (xhat_separated tuple of [B,H,W,3], xhat [B,H,W,3])."""
        inputs = [latent[:, g] for g in BLOCK_GROUPS] + [epsilon2]
        rngs = jax.random.split(rng, self.K)
        if "stacked" in params["decoder"]:
            zmax = self.stacked_gen.zmax
            z = jnp.stack([
                jnp.pad(zi, ((0, 0), (0, zmax - zi.shape[1])))
                for zi in inputs])  # [K, B, zmax], zero-padded
            imgs = self.stacked_gen(params["decoder"]["stacked"], z, rngs)
            masks_k = jnp.moveaxis(masks[..., : self.K], -1, 0)[..., None]
            total = (imgs * masks_k).sum(axis=0)
            return tuple(imgs[i] for i in range(self.K)), jnp.tanh(total)
        seps, total = [], 0.0
        for i, (gen, z) in enumerate(zip(self.generators, inputs)):
            img = gen(params["decoder"][f"gen{i}"], z, rngs[i])
            seps.append(img)
            total = total + img * masks[..., i: i + 1]
        return tuple(seps), jnp.tanh(total)

    def __call__(self, params, x, rng=None,
                 deterministic=False) -> CelebAOutput:
        if rng is None:
            rng = jax.random.key(0)
        r_enc, r_dec = jax.random.split(rng)
        (mean1, logvar1, eps1, orig_latent, latent, logdet), \
            (mean2, logvar2, eps2) = self.encode(params, x, r_enc,
                                                 deterministic)
        masks = x[..., 3: 3 + self.K]
        xhat_separated, xhat = self.decode(params, latent, eps2, masks,
                                           r_dec)
        _, align_latent, _ = self.graph.transform(params["causal"], mean1)
        return CelebAOutput(mean1, logvar1, eps1, orig_latent, latent,
                            logdet, mean2, logvar2, eps2, align_latent,
                            xhat_separated, xhat)


def celeba_B(nodes, causal_structure: int = 0,
             adjacency_scaling: bool = True):
    """The two attribute DAG options (reference celeba/main.py:86-102)."""
    import numpy as np
    from ..ops.causal import scale_adjacency

    B = np.zeros((len(nodes), len(nodes)))
    if causal_structure == 0:
        edges = [("Smiling", "High_Cheekbones"),
                 ("Smiling", "Mouth_Slightly_Open"),
                 ("Smiling", "Chubby"), ("Smiling", "Narrow_Eyes"),
                 ("Male", "Narrow_Eyes")]
    elif causal_structure == 1:
        edges = [("Young", "Bags_Under_Eyes"), ("Young", "Chubby"),
                 ("Young", "Heavy_Makeup"), ("Young", "Receding_Hairline"),
                 ("Male", "Heavy_Makeup"), ("Male", "Receding_Hairline")]
    else:
        raise ValueError("Not supported causal structure!")
    for a, b in edges:
        B[nodes.index(a), nodes.index(b)] = 1
    return scale_adjacency(B) if adjacency_scaling else B


SMILE_NODES = ["Smiling", "Male", "High_Cheekbones", "Mouth_Slightly_Open",
               "Chubby", "Narrow_Eyes"]
ATTRACTIVE_NODES = ["Young", "Male", "Bags_Under_Eyes", "Chubby",
                    "Heavy_Makeup", "Receding_Hairline"]

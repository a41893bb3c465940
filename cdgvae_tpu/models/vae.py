"""Pendulum-family VAE models (baseline VAE and CDG-VAE with masked GAM decoder).

Functional re-designs of reference modules/model.py:102-304. Each model is a
static-config object exposing ``init(key) -> params`` and pure apply methods
(`get_posterior`, `encode`, `decode`, `__call__`) that mirror the reference's
method surface so eval code ports 1:1. Differences from the reference, all
semantics-preserving and TPU-motivated:

* The K per-factor GAM decoders run as ONE stacked batched matmul
  (`nn.stacked_mlp`) instead of a Python loop of separate modules
  (reference modules/model.py:243-250, :284) — one MXU-tiled dot instead of
  K small ones. Latent blocks are gathered by (static) per-block index lists,
  zero-padded to equal width; padded inputs are zeroed so padded weight rows
  are inert. Index lists also express the DR family's "spurious latent feeds
  every block" wiring (DR/modules/model.py:283-288) without a new model.
* The alignment branch re-uses the posterior mean already computed instead of
  re-running the encoder deterministically on the same input (reference
  modules/model.py:299-302 runs the encoder twice; the deterministic second
  pass is byte-identical math, so this halves encoder cost with no semantic
  change).
* Sampling noise comes from an explicit ``jax.random`` key (device-side,
  fold_in-able per step/shard) rather than a global RNG.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .. import nn
from ..ops.causal import CausalGraph


class VAEOutput(NamedTuple):
    """Parity with the reference forward tuple (modules/model.py:290-304)."""
    mean: jax.Array
    logvar: jax.Array
    epsilon: jax.Array
    orig_latent: jax.Array
    latent: jax.Array          # [batch, node] (reference: list of [batch,1])
    logdet: jax.Array          # [batch, node]
    align_latent: jax.Array    # [batch, node]
    xhat_separated: Optional[jax.Array]  # [K, batch, out] or None
    xhat: jax.Array            # [batch, H, W, 3]


def default_block_indices(factor: Sequence[int]) -> list[list[int]]:
    """Contiguous latent blocks from the ``factor`` split (reference
    modules/model.py:283: torch.split(latent, factor))."""
    out, start = [], 0
    for k in factor:
        out.append(list(range(start, start + k)))
        start += k
    return out


class VAE:
    """Baseline VAE: MLP encoder/decoder + causal latent layer
    (reference modules/model.py:102-189)."""

    def __init__(self, graph: CausalGraph, image_size: int = 64,
                 hidden: int = 300, dtype=jnp.float32):
        self.graph = graph
        self.node = graph.node
        self.image_size = image_size
        self.in_dim = 3 * image_size * image_size
        self.hidden = hidden
        self.dtype = dtype

    def init(self, key: jax.Array) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "encoder": nn.mlp_init(
                k1, [self.in_dim, self.hidden, self.hidden, self.node * 2],
                self.dtype),
            "causal": self.graph.init(k2),
            "decoder": nn.mlp_init(
                k3, [self.node, self.hidden, self.hidden, self.in_dim],
                self.dtype),
        }

    # -- reference method surface -------------------------------------------
    def get_posterior(self, params, x):
        h = nn.mlp(params["encoder"], x.reshape(x.shape[0], -1))
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
        xhat = nn.mlp(params["decoder"], latent,
                      final_activation=jnp.tanh)
        return xhat.reshape(-1, self.image_size, self.image_size, 3)

    def __call__(self, params, x, rng=None, deterministic=False) -> VAEOutput:
        mean, logvar, epsilon, orig_latent, latent, logdet = self.encode(
            params, x, rng, deterministic)
        xhat = self.decode(params, latent)
        # alignment branch: deterministic encode == transform of the mean
        _, align_latent, _ = self.graph.transform(params["causal"], mean)
        return VAEOutput(mean, logvar, epsilon, orig_latent, latent, logdet,
                         align_latent, None, xhat)


class CDGVAE:
    """CDG-VAE: shared encoder + K masked per-factor GAM decoders
    (reference modules/model.py:208-304).

    ``masks``: [K, H, W, 3] static spatial masks (reference main.py:167-179).
    ``block_indices``: which latent dims feed each decoder block; defaults to
    the contiguous ``factor`` split. The DR variant passes
    ``[[0,4],[1,4],[2,3,4]]`` to concatenate the spurious 5th latent into
    every block (DR/modules/model.py:283-288).
    """

    def __init__(self, graph: CausalGraph, masks, factor: Sequence[int],
                 image_size: int = 64, hidden: int = 300,
                 block_indices: Optional[list[list[int]]] = None,
                 dtype=jnp.float32):
        if block_indices is None:
            assert sum(factor) == graph.node
            block_indices = default_block_indices(factor)
        assert len(factor) == len(block_indices)
        masks = jnp.asarray(masks, dtype=dtype)
        assert masks.shape[0] == len(block_indices)

        self.graph = graph
        self.node = graph.node
        self.factor = tuple(factor)
        self.K = len(block_indices)
        self.image_size = image_size
        self.out_dim = 3 * image_size * image_size
        self.hidden = hidden
        self.masks = masks
        self.dtype = dtype

        self.kmax = max(len(b) for b in block_indices)
        # gather indices [K, kmax] (padded with 0) + validity mask [K, kmax]
        gather = np.zeros((self.K, self.kmax), dtype=np.int32)
        valid = np.zeros((self.K, self.kmax), dtype=np.float32)
        for i, blk in enumerate(block_indices):
            gather[i, : len(blk)] = blk
            valid[i, : len(blk)] = 1.0
        self.block_indices = [list(b) for b in block_indices]
        self._gather = jnp.asarray(gather)
        self._valid = jnp.asarray(valid, dtype=dtype)

        # Band-sliced decoder: when the masks are an exact row-band partition
        # (they are for the pendulum family, main.py:167-179), block k's
        # contribution outside its band is multiplied by zero — the reference
        # still COMPUTES those outputs AND stores/updates their weights (2/3
        # of the final layer; zero grad forever, frozen at init, yet Adam
        # reads+writes param/m/v for all of them every step — profiled at
        # >50% of the train step's time, it is the HBM-bandwidth hot spot).
        # We detect the bands and store ONLY each block's live output columns
        # of the final layer: identical math for every masked/user-visible
        # output; `xhat_separated` is exactly zero outside a block's band
        # (the reference holds untrained init noise there, multiplied by
        # zero downstream).
        self._bands = self._detect_row_bands(np.asarray(masks))

    @staticmethod
    def _detect_row_bands(masks: np.ndarray):
        """Returns per-block flat (start, end) output ranges if masks are a
        contiguous, ordered, exact row partition; else None."""
        k, H, W, C = masks.shape
        expect_start = 0
        bands = []
        for i in range(k):
            rows = np.where(masks[i].reshape(H, -1).any(axis=1))[0]
            if len(rows) == 0:
                return None
            r0, r1 = rows.min(), rows.max() + 1
            band = np.zeros_like(masks[i])
            band[r0:r1] = 1.0
            if not np.array_equal(band, masks[i]) or r0 != expect_start:
                return None
            expect_start = r1
            bands.append((int(r0 * W * C), int(r1 * W * C)))
        if expect_start != H:
            return None
        return bands

    def init(self, key: jax.Array) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        in_dim = 3 * self.image_size * self.image_size
        decoder = nn.stacked_mlp_init(
            k3, self.K, [self.kmax, self.hidden, self.hidden,
                         self.out_dim], self.dtype)
        if self._bands is not None:
            # Slice each block's live band out of the SAME stacked draw the
            # unsliced layout would use: bit-identical initialization (and
            # therefore bit-identical training) to the full layout — the
            # dead weights are simply never materialized as parameters.
            last = decoder.pop(f"layer{len(decoder) - 1}")
            out = {}
            for k, (c0, c1) in enumerate(self._bands):
                out[f"w{k}"] = last["w"][k, :, c0:c1]
                out[f"b{k}"] = last["b"][k, 0, c0:c1]
            decoder["out"] = out
        return {
            "encoder": nn.mlp_init(
                k1, [in_dim, self.hidden, self.hidden, self.node * 2],
                self.dtype),
            "causal": self.graph.init(k2),
            "decoder": decoder,
        }

    # -- reference method surface -------------------------------------------
    # identical encoder to the baseline VAE: share the implementations
    # (same idiom as models/tabular.py) so a change propagates to both
    get_posterior = VAE.get_posterior
    encode = VAE.encode

    def _decoder_hidden(self, params, latent):
        """[batch, node] -> [K, batch, hidden]: all hidden layers of the K
        decoders as one stacked batched matmul."""
        blocks = latent[:, self._gather]            # [batch, K, kmax]
        blocks = blocks * self._valid               # zero padded positions
        blocks = jnp.transpose(blocks, (1, 0, 2))   # [K, batch, kmax]
        n = sum(1 for k in params["decoder"] if k.startswith("layer"))
        n_hidden = n if "out" in params["decoder"] else n - 1
        h = blocks
        for i in range(n_hidden):
            h = nn.stacked_dense(params["decoder"][f"layer{i}"], h)
            h = jax.nn.elu(h)
        return h

    def _band_pieces(self, params, h):
        """[K, batch, hidden] -> per-band final-layer outputs
        ([batch, band_k width] each) from the sliced output params."""
        out = params["decoder"]["out"]
        return [h[k] @ out[f"w{k}"] + out[f"b{k}"]
                for k in range(self.K)]

    def decode(self, params, latent):
        """latent [batch, node] -> (xhat_separated [K,batch,out], xhat image).

        One stacked-MLP evaluation of all K GAM decoders; per-block spatial
        masking + sum + tanh (reference modules/model.py:281-288). With a
        band-sliced final layer the masked sum is a concatenation of the
        per-band outputs — identical xhat; xhat_separated is zero outside
        each block's band.
        """
        h = self._decoder_hidden(params, latent)
        if "out" in params["decoder"]:
            pieces = self._band_pieces(params, h)
            batch = h.shape[1]
            xhat_sep = jnp.zeros((self.K, batch, self.out_dim), h.dtype)
            for k, (c0, c1) in enumerate(self._bands):
                xhat_sep = xhat_sep.at[k, :, c0:c1].set(pieces[k])
            flat = jnp.concatenate(pieces, axis=1)
            xhat = jnp.tanh(flat.reshape(-1, self.image_size,
                                         self.image_size, 3))
            return xhat_sep, xhat
        last = params["decoder"][f"layer{len(params['decoder']) - 1}"]
        xhat_sep = nn.stacked_dense(last, h)        # [K, batch, out]
        imgs = xhat_sep.reshape(self.K, -1, self.image_size, self.image_size,
                                3)
        masked = imgs * self.masks[:, None]         # [K,batch,H,W,3]
        xhat = jnp.tanh(jnp.sum(masked, axis=0))
        return xhat_sep, xhat

    def decode_fast(self, params, latent):
        """Band-sliced decode: identical xhat to :meth:`decode`, skipping the
        [K,batch,out] scatter used only for GAM visualization. Falls back to
        the masked path when the masks are not a row partition."""
        if "out" not in params["decoder"]:
            return self.decode(params, latent)[1]
        h = self._decoder_hidden(params, latent)    # [K, batch, hidden]
        xhat = jnp.concatenate(self._band_pieces(params, h), axis=1)
        return jnp.tanh(xhat.reshape(-1, self.image_size, self.image_size,
                                     3))

    supports_fast_decode = True  # train/steps._forward keys on this

    def __call__(self, params, x, rng=None, deterministic=False,
                 fast: bool = False) -> VAEOutput:
        mean, logvar, epsilon, orig_latent, latent, logdet = self.encode(
            params, x, rng, deterministic)
        if fast:
            xhat_separated, xhat = None, self.decode_fast(params, latent)
        else:
            xhat_separated, xhat = self.decode(params, latent)
        _, align_latent, _ = self.graph.transform(params["causal"], mean)
        return VAEOutput(mean, logvar, epsilon, orig_latent, latent, logdet,
                         align_latent, xhat_separated, xhat)


def pendulum_masks(image_size: int = 64, k: int = 3) -> np.ndarray:
    """The fixed pendulum decoder masks: light rows [0:20), angle [20:51),
    shadow [51:) (reference main.py:167-179; rows are 64px-calibrated and
    scaled proportionally for other sizes)."""
    bounds = [0, 20, 51, image_size]
    if k != len(bounds) - 1:
        raise ValueError(
            f"pendulum defines exactly {len(bounds) - 1} decoder masks "
            f"(light/angle/shadow row bands); got a factor list of "
            f"length k={k} — use --factor with 3 blocks for this family")
    if image_size != 64:
        bounds = [int(round(b * image_size / 64)) for b in bounds]
    masks = np.zeros((k, image_size, image_size, 3), dtype=np.float32)
    for i in range(k):
        masks[i, bounds[i]: bounds[i + 1]] = 1.0
    return masks

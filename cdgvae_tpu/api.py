"""High-level user API: load a checkpoint, run inference.

The reference exposes its trained models only through eval scripts wired to
wandb artifacts. This module gives the framework a serving-style surface:

    from cdgvae_tpu.api import LoadedModel
    m = LoadedModel.load("assets/model_CDGVAE_linear")
    z = m.encode(images)                       # deterministic latents
    xr = m.reconstruct(images)
    xc = m.counterfactual(images, do_index=1, value=0.7)
    xs = m.sample(64, rng=jax.random.key(0))   # z ~ N(0,I) -> decode

All paths are jitted once and reused; shapes are static per batch size.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .factory import build_pendulum_model, build_tabular_model
from .utils.checkpoint import load_checkpoint


class LoadedModel:
    def __init__(self, model, params, config: dict):
        self.model = model
        self.params = params
        self.config = config
        self._encode = jax.jit(
            lambda p, x: model.encode(p, x, deterministic=True))
        self._fwd = jax.jit(
            lambda p, x: model(p, x, deterministic=True).xhat)

        # jit ONCE here, not per call: a jitted closure built inside a
        # method is a fresh function identity every call, so each
        # counterfactual()/sample() call would retrace AND recompile
        # (30-450 s cold on this backend) — fatal for a serving surface
        @partial(jax.jit, static_argnames=("do_index",))
        def _cf(params, x, do_index, value):
            _, _, eps, _, latent, _ = model.encode(
                params, x, deterministic=True)
            z_do = model.graph.do_intervention(
                params["causal"], latent, eps, do_index, value)
            dec = model.decode(params, z_do)
            return dec[1] if isinstance(dec, tuple) else dec

        @jax.jit
        def _gen(params, eps):
            _, latent, _ = model.graph.transform(params["causal"], eps)
            dec = model.decode(params, latent)
            return dec[1] if isinstance(dec, tuple) else dec

        self._cf = _cf
        self._gen = _gen

    @classmethod
    def load(cls, checkpoint_dir: str) -> "LoadedModel":
        ck = load_checkpoint(checkpoint_dir)
        config = ck["config"]
        if config is None:
            raise ValueError("checkpoint has no embedded config")
        if "dataset" in config:
            model, _ = build_tabular_model(dict(config))
        else:
            spurious = config.get("node", 4) == 5
            model, _ = build_pendulum_model(dict(config), spurious=spurious)
        return cls(model, jax.device_put(ck["params"]), config)

    # -- inference surface ---------------------------------------------------
    def encode(self, x) -> np.ndarray:
        """Deterministic causal latents [batch, node]."""
        _, _, _, _, latent, _ = self._encode(self.params, jnp.asarray(x))
        return np.asarray(latent)

    def reconstruct(self, x) -> np.ndarray:
        return np.asarray(self._fwd(self.params, jnp.asarray(x)))

    def counterfactual(self, x, do_index: int, value) -> np.ndarray:
        """Answer do(z_{do_index} := value) for each input: encode, apply
        the do-operator with ancestral re-propagation, decode."""
        return np.asarray(self._cf(self.params, jnp.asarray(x), do_index,
                                   float(value)))

    def sample(self, n: int, rng=None) -> np.ndarray:
        """Generative sampling: eps ~ N(0, I) -> SEM+flows -> decode."""
        rng = rng if rng is not None else jax.random.key(0)
        eps = jax.random.normal(rng, (n, self.model.node))
        return np.asarray(self._gen(self.params, eps))

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

import numpy as np
import jax
import jax.numpy as jnp

from .factory import build_pendulum_model, build_tabular_model
from .utils.checkpoint import load_checkpoint


class LoadedModel:
    def __init__(self, model, params, config: dict, mesh=None,
                 bucket_batches: bool = True, transformer=None):
        self.model = model
        self.config = config
        self._n_dev = 1 if mesh is None else int(mesh.devices.size)
        self._celeba = hasattr(model, "latent_dim")
        # CDG-TVAE: the decoder's raw concat is transformer-encoded space;
        # data space is tanh -> DataTransformer.inverse_transform with the
        # learned per-column sigmas (reference tabular/modules/train.py:275,
        # tabular/inference_tvae.py:286-310). The transformer rides in the
        # checkpoint dir (cli.tabular_main_tvae writes transformer.pkl).
        self._transformer = transformer
        if config.get("model") == "TVAE" and transformer is None:
            raise ValueError(
                "TVAE checkpoints need their DataTransformer to decode to "
                "data space — use LoadedModel.load(checkpoint_dir) so "
                "transformer.pkl is picked up alongside the params")
        # CelebA is NOT per-sample: its ResNet/SAGAN BatchNorms use batch
        # statistics (models/sagan.py docstring), so zero-pad rows would
        # shift the real rows' outputs — bucketing is forced off there
        self.bucket_batches = bucket_batches and not self._celeba

        # multi-chip serving: params replicated, batch axis sharded over
        # the dp mesh — XLA partitions every path, no collectives needed
        # (all ops are per-sample)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(mesh, P())
            bsh = NamedSharding(mesh, P("dp"))
            params = jax.device_put(params, rep)

            def jit2(f, extra=0):  # (params, batch, *scalars)
                return jax.jit(f, in_shardings=(rep, bsh) + (rep,) * extra)

            def jit2_static(f):
                return jax.jit(f, static_argnames=("do_index",),
                               in_shardings=(rep, bsh, rep))
        else:
            def jit2(f, extra=0):
                return jax.jit(f)

            def jit2_static(f):
                return jax.jit(f, static_argnames=("do_index",))

        self.params = params
        # device-side tail of the TVAE data-space decode; the host-side
        # DataTransformer inverse happens in _to_data on the way out
        post = jnp.tanh if transformer is not None else (lambda r: r)
        self._fwd = jit2(
            lambda p, x: post(model(p, x, deterministic=True).xhat))

        # jit ONCE here, not per call: a jitted closure built inside a
        # method is a fresh function identity every call, so each
        # counterfactual()/sample() call would retrace AND recompile
        # (30-450 s cold on this backend) — fatal for a serving surface
        if self._celeba:
            # dual-latent model: causal branch drives the do-operator,
            # style eps2 rides along, masks come from the input channels
            self._encode = jit2(
                lambda p, x: model.encode(p, x, deterministic=True)[0])

            @jit2_static
            def _cf(params, x, do_index, value):
                (_, _, eps1, _, latent, _), (_, _, eps2) = model.encode(
                    params, x, deterministic=True)
                z_do = model.graph.do_intervention(
                    params["causal"], latent, eps1, do_index, value)
                masks = x[..., 3: 3 + model.K]
                _, xhat = model.decode(params, z_do, eps2, masks,
                                       jax.random.key(0))
                return xhat

            self._cf = _cf
            self._gen = None  # sampling needs per-sample segmentation masks
        else:
            self._encode = jit2(
                lambda p, x: model.encode(p, x, deterministic=True))

            @jit2_static
            def _cf(params, x, do_index, value):
                _, _, eps, _, latent, _ = model.encode(
                    params, x, deterministic=True)
                z_do = model.graph.do_intervention(
                    params["causal"], latent, eps, do_index, value)
                dec = model.decode(params, z_do)
                return post(dec[1] if isinstance(dec, tuple) else dec)

            @jit2
            def _gen(params, eps):
                _, latent, _ = model.graph.transform(params["causal"], eps)
                dec = model.decode(params, latent)
                return post(dec[1] if isinstance(dec, tuple) else dec)

            self._cf = _cf
            self._gen = _gen

    @classmethod
    def load(cls, checkpoint_dir: str, mesh=None,
             bucket_batches: bool = True) -> "LoadedModel":
        """``mesh``: an optional 1-D ``dp`` mesh (parallel.mesh.make_mesh)
        — serving batches are sharded over it, params replicated.
        ``bucket_batches``: pad batches to the next power of two so ragged
        batch sizes reuse compiled programs (see _pad)."""
        ck = load_checkpoint(checkpoint_dir)
        config = ck["config"]
        if config is None:
            raise ValueError("checkpoint has no embedded config")
        transformer = None
        if "dataset" in config:
            model, _ = build_tabular_model(dict(config))
            if config.get("model") == "TVAE":
                import os
                import pickle
                with open(os.path.join(checkpoint_dir,
                                       "transformer.pkl"), "rb") as f:
                    transformer = pickle.load(f)
        elif "causal_structure" in config:  # celeba family
            from .models.celeba import (CelebACDGVAE, celeba_B,
                                        SMILE_NODES, ATTRACTIVE_NODES)
            from .ops.causal import CausalGraph
            nodes = (SMILE_NODES if config["causal_structure"] == 0
                     else ATTRACTIVE_NODES)
            B = celeba_B(nodes, config["causal_structure"],
                         config.get("adjacency_scaling", True))
            graph = CausalGraph(B, scm=config["scm"],
                                flow_num=config["flow_num"],
                                inverse_loop=config["inverse_loop"])
            model = CelebACDGVAE(
                graph, latent_dim=config["latent_dim"],
                image_size=config["img_size"],
                conv_dim=config["conv_dim"],
                freeze_trunk=not config.get("train_trunk", False))
        else:
            # the family marker is recorded at save time by the training
            # CLIs; the node==5 heuristic remains only for checkpoints
            # written before the marker existed
            spurious = bool(config.get("spurious",
                                       config.get("node", 4) == 5))
            model, _ = build_pendulum_model(dict(config), spurious=spurious)
        return cls(model, jax.device_put(ck["params"])
                   if mesh is None else ck["params"],
                   config, mesh=mesh, bucket_batches=bucket_batches,
                   transformer=transformer)

    # -- batch bucketing -----------------------------------------------------
    # Every distinct batch size would otherwise trace+compile a fresh
    # program (30-450 s cold on this backend). With bucketing (default on),
    # batches are zero-padded up to the next power of two and the output
    # sliced back — exact for these per-sample paths, and a serving client
    # with ragged batch sizes compiles O(log max_batch) programs instead of
    # one per size. Disable with bucket_batches=False for fixed-size
    # callers that want zero padding overhead.
    def _pad(self, x):
        n = len(x)
        if not self.bucket_batches:
            if self._n_dev > 1 and n % self._n_dev:
                raise ValueError(
                    f"batch {n} does not divide over the {self._n_dev} "
                    "mesh devices, and pad-bucketing is unavailable here "
                    "(celeba's batch-statistic BatchNorm makes padding "
                    "inexact) — use a device-divisible batch size")
            return x, n
        m = 1 << (n - 1).bit_length()  # next power of two
        if self._n_dev > 1 and m % self._n_dev:
            # mesh serving: the bucket must also split over the devices
            m += self._n_dev - m % self._n_dev
        if m == n:
            return x, n
        pad = jnp.zeros((m - n, *x.shape[1:]), x.dtype)
        return jnp.concatenate([x, pad]), n

    def _to_data(self, arr):
        """Model output -> data space. Identity for every family except
        TVAE, whose data space is the DataTransformer inverse with the
        learned sigmas (returns a DataFrame in the original columns)."""
        if self._transformer is None:
            return np.asarray(arr)
        return self._transformer.inverse_transform(
            np.asarray(arr), sigmas=np.asarray(self.params["sigma"]))

    # -- inference surface ---------------------------------------------------
    def encode(self, x) -> np.ndarray:
        """Deterministic causal latents [batch, node]."""
        xp, n = self._pad(jnp.asarray(x))
        _, _, _, _, latent, _ = self._encode(self.params, xp)
        return np.asarray(latent[:n])

    def reconstruct(self, x):
        """Data-space reconstructions (ndarray; DataFrame for TVAE)."""
        xp, n = self._pad(jnp.asarray(x))
        return self._to_data(self._fwd(self.params, xp)[:n])

    def counterfactual(self, x, do_index: int, value):
        """Answer do(z_{do_index} := value) for each input: encode, apply
        the do-operator with ancestral re-propagation, decode."""
        xp, n = self._pad(jnp.asarray(x))
        return self._to_data(self._cf(self.params, xp, do_index,
                                      float(value))[:n])

    def sample(self, n: int, rng=None):
        """Generative sampling: eps ~ N(0, I) -> SEM+flows -> decode."""
        if self._gen is None:
            raise ValueError(
                "celeba generative sampling needs per-sample segmentation "
                "masks (the GAM decoder composes masked blocks); use "
                "reconstruct/counterfactual on real inputs instead")
        rng = rng if rng is not None else jax.random.key(0)
        eps = jax.random.normal(rng, (n, self.model.node))
        ep, n0 = self._pad(eps)
        return self._to_data(self._gen(self.params, ep)[:n0])

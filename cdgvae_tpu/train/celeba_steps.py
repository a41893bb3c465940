"""CelebA CDG-VAE train step (reference celeba/module/train.py):
L1 reconstruction against the RGB channels rescaled to [-1, 1], KL over both
latent groups, alignment BCE on the causal latents, and the 'active units'
diagnostic (fraction of latents with posterior variance < 0.1)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..ops import losses
from .steps import _jit_step


def make_celeba_loss_fn(model, beta: float, lam: float, compute_dtype=None,
                        align_only: bool = False, packer=None):
    """The CelebA dual-latent L1 ELBO+alignment loss as a pure
    ``loss_fn(params, x, y, rng) -> (loss, metrics)`` — shared by the
    scanned, sharded-scanned, and jitted step builders.

    ``compute_dtype=jnp.bfloat16`` runs the SAGAN/ResNet network in bf16
    (classic mixed precision: params/optimizer/losses stay f32). Unlike the
    pendulum MLPs (latency-bound, bf16 loses — docs/PERF.md), the CelebA
    family is conv/MXU-bound where bf16 doubles peak.

    ``align_only=True`` is the ALIGNMENT-FIRST WARMUP objective
    (loss = λ·align; recon/KL computed for the logs but not optimized) —
    an opt-in deviation motivated by the round-4 linear-probe oracle
    (docs/results/celeba_probe.json): the frozen trunk's 512-d features
    separate all 6 attributes linearly to acc ≈ 1.0, yet joint training
    plateaus at 4-5/6 — the recon term's 49152-pixel gradient drowns the
    6-term BCE before alignment forms. Warmup fits the head + causal
    flows to the labels first (the optimization the probe proves
    converges), then the standard objective takes over. Reference
    protocol (celeba/module/train.py) has no such phase — default off."""
    node, latent_dim = model.node, model.latent_dim

    def _upcast(out):
        return jax.tree.map(
            lambda t: t.astype(jnp.float32)
            if isinstance(t, jax.Array)
            and jnp.issubdtype(t.dtype, jnp.floating) else t, out)

    def loss_fn(params, x, y, rng):
        if packer is not None:
            # packed layout: cast BEFORE unpacking so the ~1000 small
            # leaves' mixed-precision casts collapse to one cast per flat
            # buffer (the per-leaf casts were the residual cost that made
            # packed bf16 neutral while packed f32 won — docs/PERF.md
            # round 4)
            if compute_dtype is not None:
                params = jax.tree.map(
                    lambda p: p.astype(compute_dtype)
                    if jnp.issubdtype(p.dtype, jnp.floating) else p,
                    params)
                x = x.astype(compute_dtype)
            out = model(packer.unpack(params), x, rng)
            if compute_dtype is not None:
                out = _upcast(out)
        elif compute_dtype is not None:
            from .steps import cast_compute
            cast, x_c = cast_compute(params, x, compute_dtype)
            out = _upcast(model(cast, x_c, rng))
        else:
            out = model(params, x, rng)
        x_rgb = x[..., :3] * 2.0 - 1.0  # (celeba/module/train.py:33)
        recon = losses.l1_recon(out.xhat, x_rgb)
        # KL2 subtracts node (not latent_dim) like the reference
        # (train.py:44-49); node == latent_dim so the constant agrees
        kl1 = losses.kl_std_normal(out.mean1, out.logvar1)
        kl2 = losses.kl_std_normal(out.mean2, out.logvar2)
        align = losses.alignment_bce(out.align_latent, y[:, :node])
        active = ((jnp.exp(out.logvar1).mean(axis=0) < 0.1).sum()
                  + (jnp.exp(out.logvar2).mean(axis=0) < 0.1).sum()) \
            / (node + latent_dim)
        if align_only:
            loss = lam * align
        else:
            loss = recon + beta * (kl1 + kl2) + lam * align
        metrics = {"loss": loss, "recon": recon, "KL": kl1 + kl2,
                   "alignment": align, "active": active.astype(jnp.float32)}
        return loss, metrics

    return loss_fn


def celeba_unjitted_step(model, optimizer: optax.GradientTransformation,
                         beta: float, lam: float, compute_dtype=None,
                         packer=None, align_only: bool = False):
    """The raw (unjitted) CelebA step — used directly inside
    train.scanned.make_scanned_epochs, or jitted via make_celeba_step.

    After each optimizer update the spectral-norm (u, v) state of every
    SAGAN SN site is advanced one power iteration from the new weights
    (models.sagan.sn_refresh — torch spectral_norm's stateful update,
    outside autodiff).

    With a ``packer`` (ops.packing.Packer built on the model's params
    template) the step operates on the PACKED params layout — the ~1000
    small leaves of the SAGAN/ResNet tree ride as one flat buffer per
    dtype, and the Adam state follows suit (docs/PERF.md round-4 DMA
    pass). Same math: the loss unpacks inside the program; the SN refresh
    runs through the unpacked view. ``opt_state`` must then be built on
    the packed params (``optimizer.init(packer.pack(params))``)."""
    from ..models.sagan import sn_refresh
    loss_fn = make_celeba_loss_fn(model, beta, lam, compute_dtype,
                                  align_only=align_only, packer=packer)

    def step(params, opt_state, x, y, rng):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x, y, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if packer is not None:
            return packer.map_unpacked(sn_refresh, params), opt_state, \
                metrics
        return sn_refresh(params), opt_state, metrics

    return step


def make_celeba_step(model, optimizer: optax.GradientTransformation,
                     beta: float, lam: float, mesh=None,
                     donate: bool = True, compute_dtype=None, packer=None,
                     align_only: bool = False):
    step = celeba_unjitted_step(model, optimizer, beta, lam, compute_dtype,
                                packer=packer, align_only=align_only)
    return _jit_step(step, mesh, donate, n_batch_args=2)

"""Fused train steps for the tabular family.

Dataset-specific reconstruction terms replicate reference
tabular/modules/train.py:199-208 exactly:
  loan   : 0.5·Σ(xhat - x[:, flatten_topology])², batch mean
  adult  : squared error on the non-income columns + BCE-with-logits on income
  covtype: squared error on the 7 continuous + NLL(log_softmax) on the 7-way
           Cover_Type head (labels are 1-based)
The CDG-TVAE step walks the DataTransformer's output spans: gaussian NLL with
learnable sigma for tanh spans, cross-entropy for softmax spans
(train.py:269-286), with the post-step sigma clamp (train.py:314).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax

from ..ops import losses
from .steps import _metrics, _jit_step


def make_recon_fn(dataset: str, flatten_topology: Sequence[int]) -> Callable:
    flat = tuple(flatten_topology)

    if dataset == "loan":
        def recon_fn(xhat, x):
            d = xhat - x[:, flat]
            return 0.5 * jnp.sum(d * d, axis=1).mean()
    elif dataset == "adult":
        def recon_fn(xhat, x):
            x_ = x[:, flat]
            d1 = xhat[:, :2] - x_[:, :2]
            d2 = xhat[:, 3:] - x_[:, 3:]
            r = 0.5 * jnp.sum(d1 * d1, axis=1).mean()
            r += 0.5 * jnp.sum(d2 * d2, axis=1).mean()
            return r + losses.stable_bce(xhat[:, 2], x_[:, 2]).mean()
    elif dataset == "covtype":
        def recon_fn(xhat, x):
            d = xhat[:, :7] - x[:, :7]
            r = 0.5 * jnp.sum(d * d, axis=1).mean()
            logp = jax.nn.log_softmax(xhat[:, 7:], axis=1)
            labels = (x[:, 7] - 1.0).astype(jnp.int32)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)
            return r + nll.mean()
    else:
        raise ValueError("Not supported dataset!")
    return recon_fn


def make_tabular_loss_fn(model, beta: float, lam: float,
                         recon_fn: Callable) -> Callable:
    """Supervised tabular loss (train.py:11-243). Alignment uses ALL label
    columns (tabular labels have exactly node columns). Shared by the jitted
    step and the sharded scanned trainer."""
    node = model.node

    def loss_fn(params, x, y, rng):
        out = model(params, x, rng)
        recon = recon_fn(out.xhat, x)
        kl = losses.kl_std_normal(out.mean, out.logvar)
        align = losses.alignment_bce(out.align_latent, y)
        loss = recon + beta * kl + lam * align
        return loss, _metrics(loss, recon, kl, align, out.logvar, node)

    return loss_fn


def make_tabular_step(model, optimizer: optax.GradientTransformation,
                      beta: float, lam: float, recon_fn: Callable,
                      mesh=None, donate: bool = True,
                      jit: bool = True) -> Callable:
    """Supervised tabular VAE/CDG-VAE step (train.py:11-243)."""
    loss_fn = make_tabular_loss_fn(model, beta, lam, recon_fn)

    def step(params, opt_state, x, y, rng):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x, y, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if not jit:
        return step
    return _jit_step(step, mesh, donate, n_batch_args=2)


def make_tabular_infomax_loss_fn(model, discriminator, beta: float,
                                 lam: float, gamma: float,
                                 recon_fn: Callable,
                                 marginal: str = "permutation") -> Callable:
    """Tabular InfoMax joint loss over ``both = (params, d_params)``
    (train.py:102-171); same (γ+1)·MI double-backward gradient flow as the
    pendulum family. ``marginal``: see steps.marginal_epsilon."""
    from .steps import marginal_epsilon

    node = model.node

    def loss_fn(both, x, y, rng):
        params, d_params = both
        r_enc, r_perm = jax.random.split(rng)
        out = model(params, x, r_enc)
        recon = recon_fn(out.xhat, x)
        kl = losses.kl_std_normal(out.mean, out.logvar)
        align = losses.alignment_bce(out.align_latent, y)
        d_joint = discriminator(d_params, x, out.epsilon)
        d_marginal = discriminator(
            d_params, x, marginal_epsilon(out.epsilon, r_perm, marginal))
        mi = losses.infomax_mi(d_joint, d_marginal)
        ref_loss = recon + beta * kl + lam * align + gamma * mi
        metrics = _metrics(ref_loss, recon, kl, align, out.logvar, node,
                           {"MutualInfo": mi})
        return ref_loss + mi, metrics

    return loss_fn


def make_tabular_infomax_step(model, discriminator,
                              optimizer, optimizer_d,
                              beta: float, lam: float, gamma: float,
                              recon_fn: Callable, mesh=None,
                              donate: bool = True,
                              jit: bool = True) -> Callable:
    """Tabular InfoMax step — see :func:`make_tabular_infomax_loss_fn`."""
    loss_fn = make_tabular_infomax_loss_fn(model, discriminator, beta, lam,
                                           gamma, recon_fn)

    def step(params, d_params, opt_state, opt_state_d, x, y, rng):
        (_, metrics), (g, g_d) = jax.value_and_grad(
            loss_fn, has_aux=True)((params, d_params), x, y, rng)
        updates, opt_state = optimizer.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        updates_d, opt_state_d = optimizer_d.update(g_d, opt_state_d,
                                                    d_params)
        d_params = optax.apply_updates(d_params, updates_d)
        return params, d_params, opt_state, opt_state_d, metrics

    if not jit:
        return step
    return _jit_step(step, mesh, donate, n_batch_args=2, n_state_args=4)


def flatten_spans(output_info_list):
    """DataTransformer spans -> static tuple of (start, dim, is_softmax)."""
    spans, start = [], 0
    for column_info in output_info_list:
        for span in column_info:
            spans.append((start, span.dim, span.activation_fn == "softmax"))
            start += span.dim
    return tuple(spans)


def make_tvae_loss_fn(model, lam: float, output_info_list) -> Callable:
    """CDG-TVAE loss (train.py:245-320): span-walking recon (gaussian NLL
    with learnable sigma for tanh spans, cross-entropy for softmax spans),
    KL weight 1."""
    node = model.node
    spans = flatten_spans(output_info_list)

    def loss_fn(params, x, y, rng):
        out = model(params, x, rng)
        xhat = out.xhat
        recon = 0.0
        for start, dim, is_softmax in spans:
            if is_softmax:
                logp = jax.nn.log_softmax(xhat[:, start: start + dim],
                                          axis=1)
                labels = jnp.argmax(x[:, start: start + dim], axis=1)
                recon += -jnp.take_along_axis(
                    logp, labels[:, None], axis=1).mean()
            else:
                std = params["sigma"][start]
                residual = x[:, start] - jnp.tanh(xhat[:, start])
                recon += (residual ** 2 / 2.0 / (std ** 2)).mean()
                recon += jnp.log(std)
        kl = losses.kl_std_normal(out.mean, out.logvar)
        align = losses.alignment_bce(out.align_latent, y)
        loss = recon + kl + lam * align
        return loss, _metrics(loss, recon, kl, align, out.logvar, node)

    return loss_fn


def make_sigma_clamp(sigma_range=(0.01, 0.1)) -> Callable:
    """Post-update params hook: the TVAE sigma clamp (train.py:314)."""

    def post_update(params):
        return dict(params, sigma=jnp.clip(
            params["sigma"], sigma_range[0], sigma_range[1]))

    return post_update


def make_tvae_step(model, optimizer: optax.GradientTransformation,
                   lam: float, output_info_list,
                   sigma_range=(0.01, 0.1), mesh=None,
                   donate: bool = True, jit: bool = True) -> Callable:
    """CDG-TVAE step (train.py:245-320): span-walking recon, KL weight 1,
    post-update sigma clamp."""
    loss_fn = make_tvae_loss_fn(model, lam, output_info_list)
    clamp = make_sigma_clamp(sigma_range)

    def step(params, opt_state, x, y, rng):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x, y, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = clamp(params)
        return params, opt_state, metrics

    if not jit:
        return step
    return _jit_step(step, mesh, donate, n_batch_args=2)

"""Fused, jit-compiled train steps for the pendulum families.

Each step fuses forward + loss + backward + optimizer update into ONE XLA
program (the reference runs eager per-op kernels with a host sync per batch,
modules/train.py:161-207). Metrics are returned as a device-side dict keyed
exactly like the reference's log dict ('loss', 'recon', 'KL', 'alignment',
'MutualInfo', 'posterior_variance{i}') so curves compare 1:1; the epoch
driver accumulates them on device and syncs once per epoch.

Data parallelism: steps are built with optional explicit shardings
(params/opt replicated, batch sharded over the ``dp`` mesh axis); XLA's GSPMD
partitioner inserts the gradient all-reduce over ICI. No hand-written
collectives are needed at these model sizes.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..ops import losses
from ..parallel.mesh import batch_sharding, replicated_sharding


def _forward(model, params, x, rng, compute_dtype=None):
    """Use the model's fast (band-sliced) decode path when it has one;
    optionally run the network in a lower compute dtype (params stay f32 in
    the optimizer — classic mixed precision; losses upcast to f32)."""
    if compute_dtype is not None:
        params, x = cast_compute(params, x, compute_dtype)
    # support detected by attribute, not try/except TypeError — a bare
    # except would also swallow genuine TypeErrors raised INSIDE the fast
    # decode and silently reroute to the slow path
    if getattr(model, "supports_fast_decode", False):
        return model(params, x, rng, fast=True)
    return model(params, x, rng)


def cast_compute(params, x, compute_dtype):
    """Mixed precision cast: float params + inputs to ``compute_dtype``
    (optimizer/losses stay f32 at the call sites). Shared by the pendulum
    and celeba step builders."""
    params = jax.tree.map(
        lambda p: p.astype(compute_dtype)
        if jnp.issubdtype(p.dtype, jnp.floating) else p, params)
    return params, x.astype(compute_dtype)


def _metrics(loss, recon, kl, align, logvar, node, extra=None):
    m = {"loss": loss, "recon": recon, "KL": kl, "alignment": align}
    if extra:
        m.update(extra)
    pv = losses.posterior_variance(logvar)
    for i in range(node):
        m[f"posterior_variance{i + 1}"] = pv[i]
    return m


def make_train_step(model, optimizer: optax.GradientTransformation,
                    beta: float, lam: float, mesh=None,
                    donate: bool = True, compute_dtype=None,
                    jit: bool = True, free_bits: float = 0.0) -> Callable:
    """Supervised VAE/CDG-VAE step (reference train_VAE / train_CDGVAE,
    modules/train.py:10-69, :150-209).

    Returns step(params, opt_state, x, y, rng) ->
        (params, opt_state, metrics). ``jit=False`` returns the raw step for
    use inside the scan-compiled trainer (train/scanned.py).
    ``free_bits > 0`` floors the per-dim KL (the opt-in posterior-collapse
    mitigation, losses.kl_std_normal_free_bits); 0 = reference objective.
    """
    node = model.node

    def loss_fn(params, x, y, rng):
        out = _forward(model, params, x, rng, compute_dtype)
        recon = losses.gaussian_recon(out.xhat, x)
        if free_bits > 0.0:
            kl = losses.kl_std_normal_free_bits(out.mean, out.logvar,
                                                free_bits)
        else:
            kl = losses.kl_std_normal(out.mean, out.logvar)
        align = losses.alignment_bce(out.align_latent, y[:, :node])
        loss = recon + beta * kl + lam * align
        return loss, _metrics(loss, recon, kl, align, out.logvar, node)

    def step(params, opt_state, x, y, rng):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x, y, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if not jit:
        return step
    return _jit_step(step, mesh, donate, n_batch_args=2)


def marginal_epsilon(epsilon, rng, mode: str = "permutation"):
    """Mismatch ε against x for the InfoMax marginal term.

    ``"permutation"`` — the reference's in-batch shuffle
    (modules/train.py:120). ``"roll"`` — a random cyclic shift by
    1..B-1 rows: unlike a permutation (identity with probability 1/B!,
    and fixed points in expectation), a roll NEVER pairs a sample with
    its own ε, so the marginal stays informative at the small
    per-device batches of the sharded trainer (batch_size/n_dev rows).
    """
    n = epsilon.shape[0]
    if mode == "roll":
        if n < 2:  # static shape: raises at trace time
            raise ValueError(
                "InfoMax marginal needs a local batch of >= 2 (got "
                f"{n}); raise batch_size or lower the device count")
        shift = jax.random.randint(rng, (), 1, n)
        return jnp.roll(epsilon, shift, axis=0)
    perm = jax.random.permutation(rng, n)
    return epsilon[perm]


def make_infomax_loss_fn(model, discriminator, beta: float, lam: float,
                         gamma: float,
                         marginal: str = "permutation") -> Callable:
    """InfoMax joint loss over ``both = (model_params, d_params)``
    (reference train_InfoMax, modules/train.py:71-148).

    Faithfully reproduces the reference's double-backward gradient flow:
    ``loss.backward(retain_graph=True)`` followed by ``MI.backward()`` means
    BOTH the model and the discriminator accumulate (gamma+1)·∂MI — so here a
    single joint grad of ``recon + β·KL + λ·align + (γ+1)·MI`` over
    (model, discriminator) params reproduces the exact update.

    ``marginal``: see :func:`marginal_epsilon` — use ``"roll"`` inside the
    sharded trainer where the loss sees only a per-device batch slice.
    """
    node = model.node

    def loss_fn(both, x, y, rng):
        params, d_params = both
        r_enc, r_perm = jax.random.split(rng)
        out = model(params, x, r_enc)
        recon = losses.gaussian_recon(out.xhat, x)
        kl = losses.kl_std_normal(out.mean, out.logvar)
        align = losses.alignment_bce(out.align_latent, y[:, :node])

        d_joint = discriminator(d_params, x, out.epsilon)
        d_marginal = discriminator(
            d_params, x, marginal_epsilon(out.epsilon, r_perm, marginal))
        mi = losses.infomax_mi(d_joint, d_marginal)

        ref_loss = recon + beta * kl + lam * align + gamma * mi
        grad_target = ref_loss + mi  # the extra MI.backward()
        metrics = _metrics(ref_loss, recon, kl, align, out.logvar, node,
                           {"MutualInfo": mi})
        return grad_target, metrics

    return loss_fn


def pair_infomax_optimizer(optimizer: optax.GradientTransformation,
                           optimizer_d: optax.GradientTransformation
                           ) -> optax.GradientTransformation:
    """Fuse the (model, discriminator) optimizers into ONE transformation
    over the pair pytree ``(params, d_params)`` — update-identical to
    applying them separately, which lets the InfoMax pair state ride any
    single-optimizer runner (e.g. the sharded scanned trainer). The fused
    state is the plain ``(opt_state, opt_state_d)`` tuple, so it
    interoperates with the 4-tuple step/checkpoint layout."""

    def init(both):
        return (optimizer.init(both[0]), optimizer_d.init(both[1]))

    def update(grads, state, params=None):
        g, g_d = grads
        op, od = state
        p, d = params if params is not None else (None, None)
        u, op = optimizer.update(g, op, p)
        u_d, od = optimizer_d.update(g_d, od, d)
        return (u, u_d), (op, od)

    return optax.GradientTransformation(init, update)


def make_infomax_step(model, discriminator,
                      optimizer: optax.GradientTransformation,
                      optimizer_d: optax.GradientTransformation,
                      beta: float, lam: float, gamma: float,
                      mesh=None, donate: bool = True,
                      jit: bool = True) -> Callable:
    """InfoMax step — see :func:`make_infomax_loss_fn` for the gradient-flow
    contract."""
    loss_fn = make_infomax_loss_fn(model, discriminator, beta, lam, gamma)

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


def pair_infomax_step(raw_infomax: Callable) -> Callable:
    """Adapt a raw 4-state InfoMax step to the (params, opt_state) pairing
    the scanned trainer expects: params := (model, discriminator) params,
    opt_state := (model, discriminator) optimizer states."""

    def step(pair_params, pair_opt, x, y, rng):
        (p, d), (op, od) = pair_params, pair_opt
        p, d, op, od, metrics = raw_infomax(p, d, op, od, x, y, rng)
        return (p, d), (op, od), metrics

    return step


def make_semi_loss_fn(model, beta: float, lam: float) -> Callable:
    """Semi-supervised loss: ELBO on an unlabeled batch + alignment on a
    separate labeled batch (reference train_CDGVAE_semi,
    modules/train.py:211-282), as a pure
    ``loss_fn(params, x_u, x_l, y_l, rng) -> (loss, metrics)`` shared by the
    jitted and sharded-scanned step builders."""
    node = model.node

    def loss_fn(params, x_u, x_l, y_l, rng):
        out = _forward(model, params, x_u, rng)
        recon = losses.gaussian_recon(out.xhat, x_u)
        kl = losses.kl_std_normal(out.mean, out.logvar)
        # supervised branch: deterministic encode of the labeled batch
        mean_l, _ = model.get_posterior(params, x_l)
        _, align_latent, _ = model.graph.transform(params["causal"], mean_l)
        align = losses.alignment_bce(align_latent, y_l[:, :node])
        loss = recon + beta * kl + lam * align
        return loss, _metrics(loss, recon, kl, align, out.logvar, node)

    return loss_fn


def make_semi_step(model, optimizer: optax.GradientTransformation,
                   beta: float, lam: float, mesh=None,
                   donate: bool = True, jit: bool = True) -> Callable:
    """Semi-supervised step (reference train_CDGVAE_semi,
    modules/train.py:211-282).

    step(params, opt_state, x_u, x_l, y_l, rng) -> (params, opt_state, metrics)
    """
    loss_fn = make_semi_loss_fn(model, beta, lam)

    def step(params, opt_state, x_u, x_l, y_l, rng):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x_u, x_l, y_l, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if not jit:
        return step
    return _jit_step(step, mesh, donate, n_batch_args=3)


def _jit_step(step, mesh, donate, n_batch_args, n_state_args=2):
    """jit a step function, optionally with explicit DP shardings.

    Argument layout: state args first (params/opt_state/...), then batch
    arrays, then the rng key (replicated).
    """
    if mesh is None:
        donate_argnums = tuple(range(n_state_args)) if donate else ()
        return jax.jit(step, donate_argnums=donate_argnums)
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    in_shardings = ((rep,) * n_state_args + (bsh,) * n_batch_args + (rep,))
    out_shardings = (rep,) * n_state_args + (rep,)
    return jax.jit(
        step,
        in_shardings=in_shardings,
        out_shardings=out_shardings,
        donate_argnums=tuple(range(n_state_args)) if donate else (),
    )

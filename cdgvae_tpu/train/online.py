"""Online (fresh-data-per-step) training for the pendulum family.

A capability the reference cannot express: its data pipeline is
matplotlib -> PNG files -> PIL -> RAM (modules/pendulum_real.py,
modules/datasets.py:24-28), so every run trains on one fixed 7.5k-image
draw. Here the pendulum_real DGP (reference pendulum_real.py:49-81) and
the scene rasterizer both run on device, so every training step can draw
a FRESH batch from the true data distribution inside the compiled scan —
infinite data, zero input pipeline, no epoch/shuffle machinery.

Label normalization constants are frozen from a reference-protocol draw
of the DGP (the centered min-max of modules/datasets.py:31-37 is a
dataset statistic; online batches use the same population constants so
the alignment targets match the fixed-dataset protocol).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..data.pendulum import (shadow_physics, sample_factors_real,
                             normalize_labels, _BETA)
from ..data.pendulum_dr import sample_factors_dr
from ..ops.renderer import render
from .scanned import make_supervised_loss_fn
from .steps import make_semi_loss_fn


def sample_factors_device(rng: jax.Array, n: int) -> jax.Array:
    """Device-side pendulum_real DGP (jnp twin of
    data/pendulum.py::sample_factors_real; reference
    pendulum_real.py:49-81): uniform light/pendulum angles, closed-form
    shadow physics, N(0, 0.1²) measurement error, 20% corruption
    (uniform shadow resample on every 5th sample), Bernoulli target with
    the -2·sin(logit) nonlinearity."""
    k = jax.random.split(rng, 6)
    light = jax.random.uniform(k[0], (n,), minval=math.pi / 4,
                               maxval=math.pi / 2)
    angle = jax.random.uniform(k[1], (n,), minval=0.0,
                               maxval=math.pi / 4)
    length, position = shadow_physics(light, angle, xp=jnp)
    length = length + 0.1 * jax.random.normal(k[2], (n,))
    position = position + 0.1 * jax.random.normal(k[3], (n,))

    corrupt = (jnp.arange(n) + 1) % 5 == 0
    u = jax.random.uniform(k[4], (n, 2), minval=0.0, maxval=12.0)
    length = jnp.where(corrupt, u[:, 0], length)
    position = jnp.where(corrupt, u[:, 1], position)

    logit = jnp.stack([light, angle, length, position], 1) @ \
        jnp.asarray(_BETA, jnp.float32)
    p = 1.0 / (1.0 + jnp.exp(-logit + 2.0 * jnp.sin(logit)))
    target = jax.random.bernoulli(k[5], p).astype(jnp.float32)
    return jnp.stack([light, angle, length, position, target], axis=1)


def label_norm_stats(seed: int = 1, n: int = 10000):
    """Freeze the reference protocol's label-normalization constants from
    a host draw of the DGP train split: y = (centered - min)/(max - min)
    with the dataset mean/min/max (modules/datasets.py:31-37)."""
    factors, is_test = sample_factors_real(seed, n)
    train = factors[~is_test]
    mu = train.mean(axis=0)
    centered = train - mu
    return (jnp.asarray(mu, jnp.float32),
            jnp.asarray(centered.min(axis=0), jnp.float32),
            jnp.asarray(centered.max(axis=0), jnp.float32))


def pendulum_batch_fn(batch_size: int, image_size: int = 64,
                      norm_seed: int = 1) -> Callable:
    """``sample_batch(rng) -> (x, y)`` for the root pendulum family:
    device DGP draw -> rasterize -> frozen-constant label normalization."""
    mu, mn, mx = label_norm_stats(norm_seed)

    def sample(rng):
        factors = sample_factors_device(rng, batch_size)
        x = render(factors[:, :4], size=image_size)
        y = ((factors - mu) - mn) / (mx - mn)
        return x, y
    return sample


def dr_label_norm_stats(seed: int = 1, n: int = 10000):
    """Frozen DR constants from a host draw: the train mean of the four
    physics factors (used BOTH to center the target logit, reference
    DR/modules/pendulum_DR.py-equivalent sample_factors_dr, and as the
    label centering of data/pendulum_dr.py:113-118) plus the centered
    min/max for normalization. Background/target columns are 0/1 and
    stay raw."""
    train, _ = sample_factors_dr(seed, n)
    mu4 = train[:, :4].mean(axis=0)
    centered = train[:, :4] - mu4
    return (jnp.asarray(mu4, jnp.float32),
            jnp.asarray(centered.min(axis=0), jnp.float32),
            jnp.asarray(centered.max(axis=0), jnp.float32))


def sample_factors_dr_device(rng: jax.Array, n: int, mu4: jax.Array,
                             p1: float = 0.8, p0: float = 0.2) -> jax.Array:
    """Device-side DR DGP (jnp twin of
    data/pendulum_dr.py::sample_factors_dr, train split): the pendulum
    physics + noise + corruption, target tau from the mean-centered
    logit, and the SPURIOUS background ~ Bernoulli(p1 if tau else p0)
    (train correlation 0.8/0.2; the test split's 0.5/0.5 stays a
    fixed-dataset eval). ``mu4`` is the frozen train mean
    (dr_label_norm_stats). Host rounding to 4 decimals is skipped —
    immaterial to the distribution. Returns [n, 6]:
    (light, angle, length, position, background, target)."""
    k = jax.random.split(rng, 7)
    light = jax.random.uniform(k[0], (n,), minval=math.pi / 4,
                               maxval=math.pi / 2)
    angle = jax.random.uniform(k[1], (n,), minval=0.0,
                               maxval=math.pi / 4)
    length, position = shadow_physics(light, angle, xp=jnp)
    length = length + 0.1 * jax.random.normal(k[2], (n,))
    position = position + 0.1 * jax.random.normal(k[3], (n,))
    corrupt = (jnp.arange(n) + 1) % 5 == 0
    u = jax.random.uniform(k[4], (n, 2), minval=0.0, maxval=12.0)
    length = jnp.where(corrupt, u[:, 0], length)
    position = jnp.where(corrupt, u[:, 1], position)

    f4 = jnp.stack([light, angle, length, position], axis=1)
    logit = (f4 - mu4) @ jnp.asarray(_BETA, jnp.float32)
    p = 1.0 / (1.0 + jnp.exp(-logit + 2.0 * jnp.sin(logit)))
    tau = jax.random.bernoulli(k[5], p).astype(jnp.float32)
    bg_p = jnp.where(tau == 1.0, p1, p0)
    background = jax.random.bernoulli(k[6], bg_p).astype(jnp.float32)
    return jnp.concatenate([f4, background[:, None], tau[:, None]], axis=1)


def dr_batch_fn(batch_size: int, image_size: int = 64,
                norm_seed: int = 1) -> Callable:
    """``sample_batch(rng) -> (x, y)`` for the DR family: device DGP ->
    blue-background rasterize -> frozen-constant normalization of the
    four physics labels (background/target stay 0/1,
    data/pendulum_dr.py:113-120)."""
    mu4, mn, mx = dr_label_norm_stats(norm_seed)

    def sample(rng):
        f = sample_factors_dr_device(rng, batch_size, mu4)
        x = render(f[:, :4], size=image_size, background=f[:, 4])
        y4 = ((f[:, :4] - mu4) - mn) / (mx - mn)
        return x, jnp.concatenate([y4, f[:, 4:]], axis=1)
    return sample


def make_online_scanned_steps_semi(model, optimizer, beta: float,
                                   lam: float, batch_size: int,
                                   batch_size_l: int, n_steps_per_call: int,
                                   image_size: int = 64, norm_seed: int = 1,
                                   sample_batch: Callable | None = None
                                   ) -> Callable:
    """Online SEMI-SUPERVISED training: the reference's semi-sup premise —
    labels are expensive, unlabeled data is cheap (main_semi.py,
    modules/train.py:211-282) — realized exactly: the unlabeled stream is
    INFINITE (a fresh device DGP+rasterizer draw every step, labels
    discarded) while the small labeled set stays fixed and device-resident,
    a random ``batch_size_l``-subset drawn per step (the reference cycles
    its labeled loader with reshuffle-on-exhaustion; per-step uniform
    subsampling is the scan-friendly equivalent — same stationary batch
    distribution, no cycle state).

    ``sample_batch(rng) -> (x, y)`` defaults to the root pendulum family;
    pass ``dr_batch_fn(batch_size, ...)`` for DR. Returns
    ``run(params, opt_state, x_l, y_l, rng, step0) ->
    (params, opt_state, metrics)``.
    """
    loss_fn = make_semi_loss_fn(model, beta, lam)
    if sample_batch is None:
        sample_batch = pendulum_batch_fn(batch_size, image_size, norm_seed)

    def body(x_l, y_l, carry, step_idx):
        params, opt_state, rng = carry
        k_data, k_lab, k_step = jax.random.split(
            jax.random.fold_in(rng, step_idx), 3)
        x_u, _ = sample_batch(k_data)
        idx = jax.random.choice(k_lab, x_l.shape[0], (batch_size_l,),
                                replace=False)
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x_u, x_l[idx], y_l[idx], k_step)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, rng), metrics

    @jax.jit
    def run(params, opt_state, x_l, y_l, rng, step0):
        steps = step0 + jnp.arange(n_steps_per_call)
        (params, opt_state, _), metrics = jax.lax.scan(
            partial(body, x_l, y_l), (params, opt_state, rng), steps)
        return params, opt_state, metrics

    return run


def make_sharded_online_scanned_steps_semi(
        model, optimizer, beta: float, lam: float, mesh, batch_size: int,
        batch_size_l: int, n_steps_per_call: int, image_size: int = 64,
        norm_seed: int = 1,
        sample_batch_builder: Callable[[int], Callable] | None = None
        ) -> Callable:
    """Multi-chip online semi-supervised training over the ``dp`` mesh:
    each device draws its OWN fresh unlabeled batch (DGP+rasterizer on
    device, keys folded per step and per device) and subsamples its OWN
    shard of the labeled set (per-shard labeled sampling, matching the
    sharded fixed-data semi trainer's per-shard deviation,
    scanned.make_sharded_scanned_epochs_semi_from_loss); one gradient
    pmean per step over ICI. Both batch sizes split D ways.

    Returns ``run(params, opt_state, x_l_sharded, y_l_sharded, rng, step0)``
    (params/opt replicated, labeled arrays sharded over ``dp``).
    """
    from jax.sharding import PartitionSpec as P
    from .scanned import _resolve_shard_map

    loss_fn = make_semi_loss_fn(model, beta, lam)
    shard_map = _resolve_shard_map()
    n_dev = mesh.devices.size
    for name, bs in (("batch_size", batch_size),
                     ("batch_sizeL", batch_size_l)):
        if bs % n_dev:
            raise ValueError(f"{name} {bs} not divisible by {n_dev} devices")
    local_bs_l = batch_size_l // n_dev
    if sample_batch_builder is None:
        def sample_batch_builder(bs):
            return pendulum_batch_fn(bs, image_size, norm_seed)
    sample_batch = sample_batch_builder(batch_size // n_dev)

    def device_body(params, opt_state, xl_loc, yl_loc, rng, step0):
        n_l = xl_loc.shape[0]
        if n_l < local_bs_l:
            raise ValueError(f"labeled shard ({n_l}) smaller than "
                             f"per-device labeled batch ({local_bs_l})")
        dev = jax.lax.axis_index("dp")

        def body(carry, step_idx):
            params, opt_state = carry
            k_data, k_lab, k_step = jax.random.split(jax.random.fold_in(
                jax.random.fold_in(rng, step_idx), dev), 3)
            x_u, _ = sample_batch(k_data)
            idx = jax.random.choice(k_lab, n_l, (local_bs_l,),
                                    replace=False)
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, x_u, xl_loc[idx],
                                       yl_loc[idx], k_step)
            grads = jax.lax.pmean(grads, "dp")
            metrics = jax.lax.pmean(metrics, "dp")
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), metrics

        steps = step0 + jnp.arange(n_steps_per_call)
        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), steps)
        return params, opt_state, metrics

    rep = P()
    sharded = P("dp")
    run = shard_map(device_body, mesh,
                    in_specs=(rep, rep, sharded, sharded, rep, rep),
                    out_specs=(rep, rep, rep))
    return jax.jit(run, donate_argnums=(0, 1))


def make_sharded_online_scanned_steps(
        model, optimizer, beta: float, lam: float, mesh, batch_size: int,
        n_steps_per_call: int, image_size: int = 64, norm_seed: int = 1,
        sample_batch_builder: Callable[[int], Callable] | None = None,
        compute_dtype=None) -> Callable:
    """Multi-chip online training: fresh-data-per-step over the ``dp``
    mesh with NO host data path at all. Each device runs its OWN copy of
    the DGP + rasterizer (keys folded per step AND per device, so the
    global batch is ``n_dev`` independent draws of ``batch_size / n_dev``
    samples each), computes local gradients, and the only communication
    is one ``pmean`` of gradients (and metrics) per step over ICI —
    data generation scales linearly with the mesh while the collective
    cost matches the fixed-dataset sharded trainer
    (scanned.make_sharded_scanned_epochs_from_loss).

    ``sample_batch_builder(local_batch_size) -> (rng -> (x, y))`` defaults
    to the root pendulum family (pendulum_batch_fn); pass
    ``lambda bs: dr_batch_fn(bs, image_size, norm_seed)`` for DR.

    Returns ``run(params, opt_state, rng, step0)`` with the same contract
    as :func:`make_online_scanned_steps` (params/opt replicated; per-step
    metrics are cross-device means).
    """
    from jax.sharding import PartitionSpec as P
    from .scanned import _resolve_shard_map

    loss_fn = make_supervised_loss_fn(model, beta, lam, compute_dtype)
    shard_map = _resolve_shard_map()
    n_dev = mesh.devices.size
    if batch_size % n_dev:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"{n_dev} devices")
    if sample_batch_builder is None:
        def sample_batch_builder(bs):
            return pendulum_batch_fn(bs, image_size, norm_seed)
    sample_batch = sample_batch_builder(batch_size // n_dev)

    def device_body(params, opt_state, rng, step0):
        dev = jax.lax.axis_index("dp")

        def body(carry, step_idx):
            params, opt_state = carry
            k_data, k_step = jax.random.split(jax.random.fold_in(
                jax.random.fold_in(rng, step_idx), dev))
            x, y = sample_batch(k_data)
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, x, y, k_step)
            # THE collective: gradient (+metric) mean over ICI
            grads = jax.lax.pmean(grads, "dp")
            metrics = jax.lax.pmean(metrics, "dp")
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), metrics

        steps = step0 + jnp.arange(n_steps_per_call)
        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), steps)
        return params, opt_state, metrics

    rep = P()
    run = shard_map(device_body, mesh, in_specs=(rep, rep, rep, rep),
                    out_specs=(rep, rep, rep))
    return jax.jit(run, donate_argnums=(0, 1))


def make_online_scanned_steps(model, optimizer, beta: float, lam: float,
                              batch_size: int, n_steps_per_call: int,
                              image_size: int = 64, norm_seed: int = 1,
                              sample_batch: Callable | None = None,
                              compute_dtype=None) -> Callable:
    """One XLA program running ``n_steps_per_call`` train steps, each on a
    freshly sampled+rendered batch: DGP draw -> rasterize -> fused
    fwd/loss/bwd/Adam, all inside one ``lax.scan``. ``sample_batch``
    (rng -> (x, y)) defaults to the root pendulum family
    (pendulum_batch_fn); pass dr_batch_fn(...) for the DR family. Returns
    ``run(params, opt_state, rng, step0) -> (params, opt_state, metrics)``
    with per-step metrics stacked along the leading axis."""
    loss_fn = make_supervised_loss_fn(model, beta, lam, compute_dtype)
    if sample_batch is None:
        sample_batch = pendulum_batch_fn(batch_size, image_size, norm_seed)

    def body(carry, step_idx):
        params, opt_state, rng = carry
        k_data, k_step = jax.random.split(jax.random.fold_in(rng, step_idx))
        x, y = sample_batch(k_data)
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x, y, k_step)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, rng), metrics

    @jax.jit
    def run(params, opt_state, rng, step0):
        steps = step0 + jnp.arange(n_steps_per_call)
        (params, opt_state, _), metrics = jax.lax.scan(
            body, (params, opt_state, rng), steps)
        return params, opt_state, metrics

    return run

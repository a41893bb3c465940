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

Four trainers share one scan core (:func:`make_online_run_from_loss`):
supervised / semi-supervised, each single-device or sharded over a
``dp`` mesh. The sharded variants run the DGP + rasterizer independently
on EVERY device (keys folded per step and per device) with one gradient
``pmean`` per step over ICI — multi-chip training with no host data path
at all. Because the reference DGP's 20% shadow corruption is POSITIONAL
(every 5th row, pendulum_real.py:74), the per-device draws take an
``index_offset`` so the corruption pattern is computed on GLOBAL row
indices — the global batch distribution is independent of the device
count (a local batch smaller than 5 would otherwise never corrupt).
"""
from __future__ import annotations

import math
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


def train_split_size(n: int) -> int:
    """Rows in the DGP's train split for an ``n``-sample draw — the 3:1
    ``(i+1) % 4 == 0`` test holdout shared by both families
    (data/pendulum.py:77, reference pendulum_real.py:109). Lets --online
    CLIs compute the reference protocol's steps-per-epoch without
    materializing a dataset."""
    return n - n // 4


def _physics_with_corruption(k, n: int, index_offset):
    """Shared device-side physics block of BOTH family DGPs: uniform
    light/pendulum angles, closed-form shadow physics, N(0, 0.1²)
    measurement error, and the positional every-5th corruption mask
    (offset to global row indices under a mesh — the bug class fixed in
    commit 25bcfff must stay fixed in ONE place). Consumes exactly keys
    ``k[0..4]``; callers draw their extra keys past that."""
    light = jax.random.uniform(k[0], (n,), minval=math.pi / 4,
                               maxval=math.pi / 2)
    angle = jax.random.uniform(k[1], (n,), minval=0.0,
                               maxval=math.pi / 4)
    length, position = shadow_physics(light, angle, xp=jnp)
    length = length + 0.1 * jax.random.normal(k[2], (n,))
    position = position + 0.1 * jax.random.normal(k[3], (n,))
    corrupt = (jnp.arange(n) + 1 + index_offset) % 5 == 0
    u = jax.random.uniform(k[4], (n, 2), minval=0.0, maxval=12.0)
    length = jnp.where(corrupt, u[:, 0], length)
    position = jnp.where(corrupt, u[:, 1], position)
    return light, angle, length, position


def sample_factors_device(rng: jax.Array, n: int,
                          index_offset=0) -> jax.Array:
    """Device-side pendulum_real DGP (jnp twin of
    data/pendulum.py::sample_factors_real; reference
    pendulum_real.py:49-81): uniform light/pendulum angles, closed-form
    shadow physics, N(0, 0.1²) measurement error, 20% corruption
    (uniform shadow resample on every 5th sample — positional, so
    ``index_offset`` shifts the row indices; sharded trainers pass the
    device's global row offset to keep the corruption fraction
    device-count-independent), Bernoulli target with the -2·sin(logit)
    nonlinearity."""
    k = jax.random.split(rng, 6)
    light, angle, length, position = _physics_with_corruption(
        k, n, index_offset)

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
                      norm_seed: int = 1, norm_n: int = 10000) -> Callable:
    """``sample_batch(rng, index_offset=0) -> (x, y)`` for the root
    pendulum family: device DGP draw -> rasterize -> frozen-constant
    label normalization. ``norm_seed``/``norm_n`` must match the
    fixed-dataset run's (seed, n_samples) for the alignment targets to
    match that protocol (the CLIs pass both)."""
    mu, mn, mx = label_norm_stats(norm_seed, norm_n)

    def sample(rng, index_offset=0):
        factors = sample_factors_device(rng, batch_size, index_offset)
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
                             p1: float = 0.8, p0: float = 0.2,
                             index_offset=0) -> jax.Array:
    """Device-side DR DGP (jnp twin of
    data/pendulum_dr.py::sample_factors_dr, train split): the pendulum
    physics + noise + corruption (positional — see
    :func:`sample_factors_device` on ``index_offset``), target tau from
    the mean-centered logit, and the SPURIOUS background ~
    Bernoulli(p1 if tau else p0) (train correlation 0.8/0.2; the test
    split's 0.5/0.5 stays a fixed-dataset eval). ``mu4`` is the frozen
    train mean (dr_label_norm_stats). Host rounding to 4 decimals is
    skipped — immaterial to the distribution. Returns [n, 6]:
    (light, angle, length, position, background, target)."""
    k = jax.random.split(rng, 7)
    light, angle, length, position = _physics_with_corruption(
        k, n, index_offset)

    f4 = jnp.stack([light, angle, length, position], axis=1)
    logit = (f4 - mu4) @ jnp.asarray(_BETA, jnp.float32)
    p = 1.0 / (1.0 + jnp.exp(-logit + 2.0 * jnp.sin(logit)))
    tau = jax.random.bernoulli(k[5], p).astype(jnp.float32)
    bg_p = jnp.where(tau == 1.0, p1, p0)
    background = jax.random.bernoulli(k[6], bg_p).astype(jnp.float32)
    return jnp.concatenate([f4, background[:, None], tau[:, None]], axis=1)


def dr_batch_fn(batch_size: int, image_size: int = 64,
                norm_seed: int = 1, norm_n: int = 10000) -> Callable:
    """``sample_batch(rng, index_offset=0) -> (x, y)`` for the DR family:
    device DGP -> blue-background rasterize -> frozen-constant
    normalization of the four physics labels (background/target stay
    0/1, data/pendulum_dr.py:113-120). ``norm_seed``/``norm_n`` must
    match the fixed-dataset run's (seed, n_samples) — see
    :func:`pendulum_batch_fn`."""
    mu4, mn, mx = dr_label_norm_stats(norm_seed, norm_n)

    def sample(rng, index_offset=0):
        f = sample_factors_dr_device(rng, batch_size, mu4,
                                     index_offset=index_offset)
        x = render(f[:, :4], size=image_size, background=f[:, 4])
        y4 = ((f[:, :4] - mu4) - mn) / (mx - mn)
        return x, jnp.concatenate([y4, f[:, 4:]], axis=1)
    return sample


def make_online_run_from_loss(loss_fn: Callable, optimizer, sample_batch: Callable,
                     n_steps_per_call: int, mesh=None,
                     batch_size_l: int | None = None,
                     local_bs: int = 0) -> Callable:
    """Online trainer for ANY supervised-shaped ``loss_fn(params, x, y, rng) -> (loss, metrics)`` (or the semi shape when ``batch_size_l`` is set) — the shared scan core of the four family makers below, public so other losses (e.g. the InfoMax pair loss over (model, discriminator) params with pair_infomax_optimizer) can ride online training too.

    Each step: fold the base key by step index (and, under a mesh, by
    device index) -> fresh DGP+rasterizer draw -> [semi: subsample the
    device-resident labeled set] -> fused grad -> [mesh: gradient+metric
    ``pmean`` over ``dp``] -> optimizer update; ``n_steps_per_call``
    steps per dispatch via ``lax.scan``. ``local_bs`` is each device's
    draw size, used to offset the DGP's positional corruption mask to
    global row indices under a mesh.

    Returns ``run(params, opt_state, [x_l, y_l,] rng, step0) ->
    (params, opt_state, per-step metrics)``; under a mesh params/opt are
    replicated, the labeled arrays sharded over ``dp``, and the inputs
    donated.
    """
    semi = batch_size_l is not None
    if mesh is not None and local_bs <= 0:
        raise ValueError(
            "local_bs (each device's draw size) is required under a mesh "
            "— without it the DGP's positional corruption mask would be "
            "offset by 0 on every device, silently changing the sampled "
            "distribution with the device count")

    def scan_steps(params, opt_state, x_l, y_l, rng, step0, dev):
        if semi and x_l.shape[0] < batch_size_l:
            raise ValueError(
                f"labeled set ({x_l.shape[0]}"
                f"{' per shard' if dev is not None else ''} rows) smaller "
                f"than the labeled batch ({batch_size_l}); lower "
                "batch_sizeL or use more labeled data")
        offset = 0 if dev is None else dev * local_bs

        def body(carry, step_idx):
            params, opt_state = carry
            k = jax.random.fold_in(rng, step_idx)
            if dev is not None:
                k = jax.random.fold_in(k, dev)
            if semi:
                k_data, k_lab, k_step = jax.random.split(k, 3)
                x_u, _ = sample_batch(k_data, offset)
                idx = jax.random.choice(k_lab, x_l.shape[0],
                                        (batch_size_l,), replace=False)
                largs = (x_u, x_l[idx], y_l[idx], k_step)
            else:
                k_data, k_step = jax.random.split(k)
                x, y = sample_batch(k_data, offset)
                largs = (x, y, k_step)
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, *largs)
            if dev is not None:
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

    if mesh is None:
        if semi:
            def run(params, opt_state, x_l, y_l, rng, step0):
                return scan_steps(params, opt_state, x_l, y_l, rng, step0,
                                  None)
        else:
            def run(params, opt_state, rng, step0):
                return scan_steps(params, opt_state, None, None, rng,
                                  step0, None)
        return jax.jit(run)

    from jax.sharding import PartitionSpec as P
    from .scanned import _resolve_shard_map

    shard_map = _resolve_shard_map()
    rep, sharded = P(), P("dp")
    if semi:
        def device_body(params, opt_state, xl_loc, yl_loc, rng, step0):
            return scan_steps(params, opt_state, xl_loc, yl_loc, rng,
                              step0, jax.lax.axis_index("dp"))
        body = shard_map(device_body, mesh,
                         in_specs=(rep, rep, sharded, sharded, rep, rep),
                         out_specs=(rep, rep, rep))
    else:
        def device_body(params, opt_state, rng, step0):
            return scan_steps(params, opt_state, None, None, rng, step0,
                              jax.lax.axis_index("dp"))
        body = shard_map(device_body, mesh,
                         in_specs=(rep, rep, rep, rep),
                         out_specs=(rep, rep, rep))
    return jax.jit(body, donate_argnums=(0, 1))


def split_batch(batch_size: int, mesh, name: str = "batch_size") -> int:
    """Per-device share of ``batch_size`` over the mesh; raises (naming
    the offending flag) when it does not divide evenly."""
    n_dev = mesh.devices.size
    if batch_size % n_dev:
        raise ValueError(f"{name} {batch_size} not divisible by "
                         f"{n_dev} devices")
    return batch_size // n_dev


def make_online_scanned_steps(model, optimizer, beta: float, lam: float,
                              batch_size: int, n_steps_per_call: int,
                              image_size: int = 64, norm_seed: int = 1,
                              sample_batch: Callable | None = None,
                              compute_dtype=None) -> Callable:
    """One XLA program running ``n_steps_per_call`` train steps, each on a
    freshly sampled+rendered batch: DGP draw -> rasterize -> fused
    fwd/loss/bwd/Adam, all inside one ``lax.scan``. ``sample_batch``
    (rng, index_offset=0 -> (x, y)) defaults to the root pendulum family
    (pendulum_batch_fn); pass dr_batch_fn(...) for the DR family. Returns
    ``run(params, opt_state, rng, step0) -> (params, opt_state, metrics)``
    with per-step metrics stacked along the leading axis."""
    loss_fn = make_supervised_loss_fn(model, beta, lam, compute_dtype)
    if sample_batch is None:
        sample_batch = pendulum_batch_fn(batch_size, image_size, norm_seed)
    return make_online_run_from_loss(loss_fn, optimizer, sample_batch,
                            n_steps_per_call)


def make_sharded_online_scanned_steps(
        model, optimizer, beta: float, lam: float, mesh, batch_size: int,
        n_steps_per_call: int, image_size: int = 64, norm_seed: int = 1,
        sample_batch_builder: Callable[[int], Callable] | None = None,
        compute_dtype=None) -> Callable:
    """Multi-chip online training: fresh-data-per-step over the ``dp``
    mesh with NO host data path at all. Each device runs its OWN copy of
    the DGP + rasterizer (keys folded per step AND per device, so the
    global batch is ``n_dev`` independent draws of ``batch_size / n_dev``
    samples each, with the positional corruption mask offset to global
    row indices), computes local gradients, and the only communication
    is one ``pmean`` of gradients (and metrics) per step over ICI —
    data generation scales linearly with the mesh while the collective
    cost matches the fixed-dataset sharded trainer
    (scanned.make_sharded_scanned_epochs_from_loss).

    ``sample_batch_builder(local_batch_size) -> (rng, index_offset=0 ->
    (x, y))`` defaults to the root pendulum family (pendulum_batch_fn);
    pass ``lambda bs: dr_batch_fn(bs, image_size, norm_seed)`` for DR.

    Returns ``run(params, opt_state, rng, step0)`` with the same contract
    as :func:`make_online_scanned_steps` (params/opt replicated AND
    donated; per-step metrics are cross-device means).
    """
    loss_fn = make_supervised_loss_fn(model, beta, lam, compute_dtype)
    local_bs = split_batch(batch_size, mesh)
    if sample_batch_builder is None:
        def sample_batch_builder(bs):
            return pendulum_batch_fn(bs, image_size, norm_seed)
    return make_online_run_from_loss(loss_fn, optimizer,
                            sample_batch_builder(local_bs),
                            n_steps_per_call, mesh=mesh, local_bs=local_bs)


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

    ``sample_batch(rng, index_offset=0) -> (x, y)`` defaults to the root
    pendulum family; pass ``dr_batch_fn(batch_size, ...)`` for DR.
    Returns ``run(params, opt_state, x_l, y_l, rng, step0) ->
    (params, opt_state, metrics)``.
    """
    loss_fn = make_semi_loss_fn(model, beta, lam)
    if sample_batch is None:
        sample_batch = pendulum_batch_fn(batch_size, image_size, norm_seed)
    return make_online_run_from_loss(loss_fn, optimizer, sample_batch,
                            n_steps_per_call, batch_size_l=batch_size_l)


def make_sharded_online_scanned_steps_semi(
        model, optimizer, beta: float, lam: float, mesh, batch_size: int,
        batch_size_l: int, n_steps_per_call: int, image_size: int = 64,
        norm_seed: int = 1,
        sample_batch_builder: Callable[[int], Callable] | None = None
        ) -> Callable:
    """Multi-chip online semi-supervised training over the ``dp`` mesh:
    each device draws its OWN fresh unlabeled batch (DGP+rasterizer on
    device, keys folded per step and per device, corruption mask on
    global row indices) and subsamples its OWN shard of the labeled set
    (per-shard labeled sampling, matching the sharded fixed-data semi
    trainer's per-shard deviation,
    scanned.make_sharded_scanned_epochs_semi_from_loss); one gradient
    pmean per step over ICI. Both batch sizes split D ways.

    Returns ``run(params, opt_state, x_l_sharded, y_l_sharded, rng, step0)``
    (params/opt replicated and donated, labeled arrays sharded over
    ``dp``).
    """
    loss_fn = make_semi_loss_fn(model, beta, lam)
    local_bs = split_batch(batch_size, mesh)
    n_dev = mesh.devices.size
    split_batch(batch_size_l, mesh, name="batch_sizeL")
    if sample_batch_builder is None:
        def sample_batch_builder(bs):
            return pendulum_batch_fn(bs, image_size, norm_seed)
    return make_online_run_from_loss(loss_fn, optimizer,
                            sample_batch_builder(local_bs),
                            n_steps_per_call, mesh=mesh,
                            batch_size_l=batch_size_l // n_dev,
                            local_bs=local_bs)

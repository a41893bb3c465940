"""Scan-compiled training: a whole epoch (or many) as ONE device program.

The per-batch Python loop in train/loop.py dispatches one jitted step per
batch; at these model sizes the step executes in ~100µs while dispatch costs
milliseconds, so the device starves. Here the epoch is rolled into a
``lax.scan`` over a pre-batched, pre-shuffled [steps, batch, ...] array — a
single dispatch per epoch (or per N epochs), keeping the TPU busy wall-to-wall.

Semantics vs the loop driver: identical math per step; the remainder batch
is dropped (fixed shapes are required under scan — the reference's final
partial batch contributes <2% of steps). Shuffling uses device-side
jax.random permutations folded per epoch.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def _flatten_items(x):
    """Flatten dataset items to 2-D for the epoch-shuffle gather, returning
    (x_flat [n, prod], item_shape). The per-step slice is reshaped back with
    :func:`_unflatten_item` — a row-major bitcast both ways, identical
    values. WHY: gathering image datasets in their item shape makes the
    scan operand a 5-D [steps, batch, H, W, C] array, and XLA's layout
    assignment inserts a whole-dataset layout-changing copy per epoch to
    re-tile it (profiled at ~0.9 ms/epoch on 64px pendulum — the single
    largest per-epoch op after the gather itself); a 3-D
    [steps, batch, prod] operand keeps the gather's natural row-major
    layout end to end. Measured +22% train throughput (515k -> 631k
    imgs/s/chip, bit-identical losses; docs/PERF.md)."""
    return x.reshape(x.shape[0], -1), x.shape[1:]


def _unflatten_item(xi, item_shape):
    """CONTRACT: uint8 means quantized image. Every scanned trainer treats
    a uint8 dataset as `quantize_images` storage and decodes it in-step to
    the reference's (u8 - 127.5)/127.5 range (modules/datasets.py:28).
    Discrete/one-hot tabular data must therefore be passed as float — a
    uint8 tabular array would be silently rescaled to [-1, 1)."""
    xi = xi.reshape(xi.shape[0], *item_shape)
    if xi.dtype == jnp.uint8:
        xi = (xi.astype(jnp.float32) - 127.5) / 127.5
    return xi


def quantize_images(x):
    """[-1,1] float images -> uint8 dataset storage (4x less device memory).

    Exactly the reference's own data representation: its datasets are uint8
    PNGs normalized ``(x - 127.5)/127.5`` at load (reference
    modules/datasets.py:28, png_io round-trip tested in test_png_io). Every
    scanned trainer decodes uint8 batches back to that float range inside
    the step (:func:`_unflatten_item`). For data that came from PNGs the
    round trip is EXACT; for the continuous device renderer it is a
    <=1/255-per-pixel quantization, i.e. training on the renderer's PNG
    export instead of its float output.

    This is a CAPACITY option, not a speed one: at pendulum scale it
    measured 15% SLOWER (631k -> 534k imgs/s/chip — the latency-bound step
    pays the per-step decode and the byte-granularity gather more than it
    saves in HBM traffic; docs/PERF.md). Use it when the dataset would not
    otherwise fit in HBM.

    Encode math is the device twin of ``png_io._to_uint8`` (numpy, host
    side); the two are asserted equal in test_scanned
    (test_quantize_matches_png_encoder) so they cannot drift.
    """
    return jnp.clip(jnp.round(x * 127.5 + 127.5), 0, 255).astype(jnp.uint8)


def make_scanned_epochs(step_fn: Callable, batch_size: int,
                        n_epochs_per_call: int = 1) -> Callable:
    """Wrap a (params, opt_state, x, y, rng) -> (params, opt_state, metrics)
    step into a jitted multi-epoch runner.

    uint8 ``x`` is decoded in-step as a quantized IMAGE (see
    :func:`_unflatten_item`); pass tabular/one-hot data as float.

    Returns run(params, opt_state, x, y, rng, epoch0) ->
        (params, opt_state, stacked-metrics dict averaged per epoch).
    """

    @partial(jax.jit, static_argnames=(), donate_argnums=(0, 1))
    def run(params, opt_state, x, y, rng, epoch0):
        n = x.shape[0]
        steps = n // batch_size
        if steps == 0:  # shapes are static: this raises at trace time
            raise ValueError(
                f"dataset ({n}) smaller than batch_size ({batch_size}); "
                "clamp the batch size (run_scanned_chunks does) or use the "
                "eager train_epoch driver")
        xf, item_shape = _flatten_items(x)

        def epoch_body(carry, epoch_idx):
            params, opt_state = carry
            ekey = jax.random.fold_in(rng, epoch0 + epoch_idx)
            perm = jax.random.permutation(ekey, n)[: steps * batch_size]
            # 2-D index gather: produces [steps, batch, ...] directly (one
            # gather, no separate reshape/layout pass over the dataset)
            perm = perm.reshape(steps, batch_size)
            xb, yb = xf[perm], y[perm]

            def step_body(carry, inp):
                params, opt_state = carry
                xi, yi, bi = inp
                xi = _unflatten_item(xi, item_shape)
                skey = jax.random.fold_in(ekey, bi)
                params, opt_state, metrics = step_fn(params, opt_state, xi,
                                                     yi, skey)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                step_body, (params, opt_state),
                (xb, yb, jnp.arange(steps)))
            epoch_metrics = jax.tree.map(lambda m: m.mean(), metrics)
            return (params, opt_state), epoch_metrics

        (params, opt_state), metrics = jax.lax.scan(
            epoch_body, (params, opt_state),
            jnp.arange(n_epochs_per_call))
        return params, opt_state, metrics

    return run


def make_scanned_epochs_semi(step_fn: Callable, batch_size: int,
                             batch_size_l: int,
                             n_epochs_per_call: int = 1) -> Callable:
    """Semi-supervised scanned trainer: the unlabeled stream drives the
    epoch; the labeled stream cycles with reshuffle-on-exhaustion in the
    spirit of the reference's ``next(iter_dataloaderL)`` restart
    (modules/train.py:225-231, reset per epoch). One device dispatch per
    ``n_epochs_per_call`` epochs.

    DEVIATIONS from the eager ``train_epoch_semi`` (fixed shapes under
    scan): the final partial unlabeled batch is dropped, and labeled batches
    are always exactly ``batch_size_l`` (the eager path can yield a short
    batch at each cycle boundary). Use ``--eager`` / train_epoch_semi for
    the reference's exact protocol.

    uint8 streams are decoded in-step as quantized IMAGES (see
    :func:`_unflatten_item`); pass tabular/one-hot data as float.

    step_fn: raw (params, opt_state, x_u, x_l, y_l, rng) step.
    Returns run(params, opt_state, x_u, x_l, y_l, rng, epoch0).
    """

    @partial(jax.jit, donate_argnums=(0, 1))
    def run(params, opt_state, x_u, x_l, y_l, rng, epoch0):
        n_u, n_l = x_u.shape[0], x_l.shape[0]
        steps = n_u // batch_size
        if steps == 0 or n_l < batch_size_l:
            raise ValueError(
                f"streams too small (unlabeled {n_u} vs batch {batch_size}; "
                f"labeled {n_l} vs batch {batch_size_l}); clamp the batch "
                "sizes or use the eager train_epoch_semi driver")
        need = steps * batch_size_l
        k_perms = -(-need // n_l)  # ceil: how many labeled reshuffles
        xf_u, item_shape = _flatten_items(x_u)
        xf_l, item_shape_l = _flatten_items(x_l)

        def epoch_body(carry, epoch_idx):
            params, opt_state = carry
            ekey = jax.random.fold_in(rng, epoch0 + epoch_idx)
            perm_u = jax.random.permutation(ekey, n_u)[: steps * batch_size]
            xb_u = xf_u[perm_u].reshape(steps, batch_size, -1)
            lkey = jax.random.fold_in(ekey, 2**20)
            perm_l = jnp.concatenate(
                [jax.random.permutation(jax.random.fold_in(lkey, k), n_l)
                 for k in range(k_perms)])[:need]
            xb_l = xf_l[perm_l].reshape(steps, batch_size_l, -1)
            yb_l = y_l[perm_l].reshape(steps, batch_size_l, *y_l.shape[1:])

            def step_body(carry, inp):
                params, opt_state = carry
                xu, xl, yl, bi = inp
                xu = _unflatten_item(xu, item_shape)
                xl = _unflatten_item(xl, item_shape_l)
                skey = jax.random.fold_in(ekey, bi)
                params, opt_state, metrics = step_fn(
                    params, opt_state, xu, xl, yl, skey)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                step_body, (params, opt_state),
                (xb_u, xb_l, yb_l, jnp.arange(steps)))
            return (params, opt_state), jax.tree.map(lambda m: m.mean(),
                                                     metrics)

        (params, opt_state), metrics = jax.lax.scan(
            epoch_body, (params, opt_state),
            jnp.arange(n_epochs_per_call))
        return params, opt_state, metrics

    return run


def _resolve_shard_map():
    """shard_map moved out of jax.experimental in newer jax."""
    try:
        from jax import shard_map as _shard_map

        def shard_map(f, mesh, in_specs, out_specs):
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _shard_map_old

        def shard_map(f, mesh, in_specs, out_specs):
            return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                                  out_specs=out_specs)
    return shard_map


def make_supervised_loss_fn(model, beta: float, lam: float,
                            compute_dtype=None,
                            free_bits: float = 0.0) -> Callable:
    """The supervised image-family ELBO+alignment loss (pendulum/DR;
    reference modules/train.py:174-199) as a pure
    ``loss_fn(params, x, y, rng) -> (loss, metrics)`` — shared by the
    scanned, sharded-scanned, and jitted step builders.

    ``free_bits > 0`` floors the per-dim KL (losses.kl_std_normal_free_
    bits) — the opt-in posterior-collapse mitigation; 0 is the exact
    reference objective."""
    from ..ops import losses
    from .steps import _metrics, _forward

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

    return loss_fn


def unjitted_step(model, optimizer, beta: float, lam: float,
                  compute_dtype=None, free_bits: float = 0.0) -> Callable:
    """The raw (unjitted) supervised step for use inside scans — same math
    as train.steps.make_train_step."""
    import optax

    loss_fn = make_supervised_loss_fn(model, beta, lam, compute_dtype,
                                      free_bits=free_bits)

    def step(params, opt_state, x, y, rng):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x, y, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def make_sharded_scanned_epochs(model, optimizer, beta: float, lam: float,
                                mesh, batch_size: int,
                                n_epochs_per_call: int = 1) -> Callable:
    """Multi-chip scanned trainer for the supervised image families
    (pendulum/DR): the standard ELBO+alignment loss over the ``dp`` mesh.
    Thin wrapper over :func:`make_sharded_scanned_epochs_from_loss` — see it
    for the layout/collective contract.

    Returns run(params, opt_state, x_sharded, y_sharded, rng, epoch0).
    """
    return make_sharded_scanned_epochs_from_loss(
        make_supervised_loss_fn(model, beta, lam), optimizer, mesh,
        batch_size, n_epochs_per_call=n_epochs_per_call)


def make_sharded_scanned_epochs_from_loss(
        loss_fn: Callable, optimizer, mesh, batch_size: int,
        n_epochs_per_call: int = 1,
        post_update: Callable | None = None) -> Callable:
    """Multi-chip scanned trainer: whole epochs as ONE program over the
    ``dp`` mesh via ``shard_map`` with explicit collectives, for ANY
    supervised ``loss_fn(params, x, y, rng) -> (loss, metrics)`` (pendulum,
    DR, tabular, TVAE — the family differences live entirely in the loss).

    Layout: params/opt state replicated; the dataset lives sharded over the
    batch axis (each device holds n/D rows). Each device shuffles and
    batches its OWN shard per epoch (standard data-parallel per-shard
    shuffling — a documented deviation from global shuffling; no
    cross-device gathers on the input side), computes local gradients, and
    the only communication is one ``psum``-mean of gradients (and metrics)
    per step over ICI. Global batch = ``batch_size`` (split D ways).

    ``post_update(params) -> params`` runs after each optimizer update on
    the replicated params (e.g. the TVAE sigma clamp,
    reference tabular/modules/train.py:314).

    uint8 ``x`` is decoded in-step as a quantized IMAGE (see
    :func:`_unflatten_item`) — when using this builder with tabular/TVAE
    losses, pass discrete/one-hot data as float, never uint8.

    Returns run(params, opt_state, x_sharded, y_sharded, rng, epoch0).
    """
    import optax
    from jax.sharding import PartitionSpec as P

    shard_map = _resolve_shard_map()
    n_dev = mesh.devices.size
    if batch_size % n_dev:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"{n_dev} devices")
    local_bs = batch_size // n_dev

    def device_body(params, opt_state, x_loc, y_loc, rng, epoch0):
        n_loc = x_loc.shape[0]
        steps = n_loc // local_bs
        if steps == 0:
            raise ValueError(
                f"local shard ({n_loc}) smaller than per-device batch "
                f"({local_bs})")
        dev = jax.lax.axis_index("dp")
        xf_loc, item_shape = _flatten_items(x_loc)

        def epoch_body(carry, epoch_idx):
            params, opt_state = carry
            ekey = jax.random.fold_in(
                jax.random.fold_in(rng, epoch0 + epoch_idx), dev)
            perm = jax.random.permutation(ekey, n_loc)[: steps * local_bs]
            xb = xf_loc[perm].reshape(steps, local_bs, -1)
            yb = y_loc[perm].reshape(steps, local_bs, *y_loc.shape[1:])

            def step_body(carry, inp):
                params, opt_state = carry
                xi, yi, bi = inp
                xi = _unflatten_item(xi, item_shape)
                skey = jax.random.fold_in(ekey, bi)
                (_, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, xi, yi, skey)
                # THE collective: gradient (+metric) mean over ICI
                grads = jax.lax.pmean(grads, "dp")
                metrics = jax.lax.pmean(metrics, "dp")
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
                if post_update is not None:
                    params = post_update(params)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                step_body, (params, opt_state),
                (xb, yb, jnp.arange(steps)))
            return (params, opt_state), jax.tree.map(lambda m: m.mean(),
                                                     metrics)

        (params, opt_state), metrics = jax.lax.scan(
            epoch_body, (params, opt_state),
            jnp.arange(n_epochs_per_call))
        return params, opt_state, metrics

    rep = P()
    sharded = P("dp")
    body = shard_map(device_body, mesh,
                     in_specs=(rep, rep, sharded, sharded, rep, rep),
                     out_specs=(rep, rep, rep))
    return jax.jit(body, donate_argnums=(0, 1))


def make_sharded_scanned_epochs_semi_from_loss(
        loss_fn: Callable, optimizer, mesh, batch_size: int,
        batch_size_l: int, n_epochs_per_call: int = 1) -> Callable:
    """Multi-chip semi-supervised scanned trainer: both streams (unlabeled
    drives the epoch; labeled cycles with reshuffle-on-exhaustion like the
    reference's ``next(iter_dataloaderL)`` restart, modules/train.py:225-231)
    sharded over the ``dp`` mesh via ``shard_map``.

    ``loss_fn(params, x_u, x_l, y_l, rng) -> (loss, metrics)``. Layout as in
    :func:`make_sharded_scanned_epochs_from_loss` — params/opt replicated,
    each device shuffles/batches/cycles its OWN shard of both streams
    (per-shard shuffling deviation), one gradient pmean per step over ICI.
    Both global batch sizes split D ways.

    uint8 streams are decoded in-step as quantized IMAGES (see
    :func:`_unflatten_item`); pass tabular/one-hot data as float.

    Returns run(params, opt_state, x_u_sharded, x_l_sharded, y_l_sharded,
    rng, epoch0).
    """
    import optax
    from jax.sharding import PartitionSpec as P

    shard_map = _resolve_shard_map()
    n_dev = mesh.devices.size
    for name, bs in (("batch_size", batch_size),
                     ("batch_sizeL", batch_size_l)):
        if bs % n_dev:
            raise ValueError(f"{name} {bs} not divisible by {n_dev} devices")
    local_bs = batch_size // n_dev
    local_bs_l = batch_size_l // n_dev

    def device_body(params, opt_state, xu_loc, xl_loc, yl_loc, rng, epoch0):
        n_u, n_l = xu_loc.shape[0], xl_loc.shape[0]
        steps = n_u // local_bs
        if steps == 0 or n_l < local_bs_l:
            raise ValueError(
                f"local shards too small (unlabeled {n_u} vs per-device "
                f"batch {local_bs}; labeled {n_l} vs {local_bs_l})")
        need = steps * local_bs_l
        k_perms = -(-need // n_l)  # ceil: labeled reshuffles per epoch
        dev = jax.lax.axis_index("dp")
        xf_u, item_shape = _flatten_items(xu_loc)
        xf_l, item_shape_l = _flatten_items(xl_loc)

        def epoch_body(carry, epoch_idx):
            params, opt_state = carry
            ekey = jax.random.fold_in(
                jax.random.fold_in(rng, epoch0 + epoch_idx), dev)
            perm_u = jax.random.permutation(ekey, n_u)[: steps * local_bs]
            xb_u = xf_u[perm_u].reshape(steps, local_bs, -1)
            lkey = jax.random.fold_in(ekey, 2**20)
            perm_l = jnp.concatenate(
                [jax.random.permutation(jax.random.fold_in(lkey, k), n_l)
                 for k in range(k_perms)])[:need]
            xb_l = xf_l[perm_l].reshape(steps, local_bs_l, -1)
            yb_l = yl_loc[perm_l].reshape(steps, local_bs_l,
                                          *yl_loc.shape[1:])

            def step_body(carry, inp):
                params, opt_state = carry
                xu, xl, yl, bi = inp
                xu = _unflatten_item(xu, item_shape)
                xl = _unflatten_item(xl, item_shape_l)
                skey = jax.random.fold_in(ekey, bi)
                (_, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, xu, xl, yl, skey)
                grads = jax.lax.pmean(grads, "dp")
                metrics = jax.lax.pmean(metrics, "dp")
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                step_body, (params, opt_state),
                (xb_u, xb_l, yb_l, jnp.arange(steps)))
            return (params, opt_state), jax.tree.map(lambda m: m.mean(),
                                                     metrics)

        (params, opt_state), metrics = jax.lax.scan(
            epoch_body, (params, opt_state),
            jnp.arange(n_epochs_per_call))
        return params, opt_state, metrics

    rep = P()
    sharded = P("dp")
    body = shard_map(device_body, mesh,
                     in_specs=(rep, rep, sharded, sharded, sharded, rep,
                               rep),
                     out_specs=(rep, rep, rep))
    return jax.jit(body, donate_argnums=(0, 1))

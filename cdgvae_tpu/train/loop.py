"""Epoch driver: shuffling, batching, device-side metric accumulation.

The reference's train loops sync every batch via ``.item()`` on every loss
term (modules/train.py:207). Here per-batch metric dicts stay ON DEVICE; the
epoch mean is computed in one stacked reduction and synced once per epoch —
the host never blocks inside the hot loop.
"""
from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import jax
import jax.numpy as jnp


class Averager:
    """Accumulates device-scalar metric dicts; one host sync on result()."""

    def __init__(self):
        self._acc = []

    def add(self, metrics: dict):
        self._acc.append(metrics)

    def result(self) -> dict:
        if not self._acc:
            return {}
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs).mean(), *self._acc)
        host = jax.device_get(stacked)
        return {k: float(v) for k, v in host.items()}


def batch_indices(n: int, batch_size: int, shuffle_rng: np.random.Generator,
                  drop_remainder: bool = False) -> Iterator[np.ndarray]:
    """Shuffled batch index iterator (reference: DataLoader(shuffle=True),
    drop_last=False — the final partial batch is kept unless dropping for a
    fixed-shape sharded step)."""
    perm = shuffle_rng.permutation(n)
    end = n - (n % batch_size) if drop_remainder else n
    for i in range(0, end, batch_size):
        yield perm[i: i + batch_size]


def train_epoch(step: Callable, state: tuple, x, y, batch_size: int,
                rng: jax.Array, epoch: int,
                shuffle_rng: np.random.Generator,
                drop_remainder: bool = False) -> tuple[tuple, dict]:
    """One epoch of the supervised step. ``state`` = (params, opt_state, ...)
    threaded through; returns (state, epoch-mean metric dict)."""
    n = len(x)
    if drop_remainder and n < batch_size:
        raise ValueError(
            f"dataset ({n}) smaller than batch_size ({batch_size}) with "
            "drop_remainder — every epoch would run zero steps and the "
            "final checkpoint would hold untrained params; lower "
            "batch_size")
    avg = Averager()
    for b, idx in enumerate(batch_indices(n, batch_size, shuffle_rng,
                                          drop_remainder)):
        step_rng = jax.random.fold_in(jax.random.fold_in(rng, epoch), b)
        *state, metrics = step(*state, x[idx], y[idx], step_rng)
        avg.add(metrics)
    return tuple(state), avg.result()


def train_epoch_semi(step: Callable, state: tuple, x_u, x_l, y_l,
                     batch_size: int, batch_size_l: int, rng: jax.Array,
                     epoch: int, shuffle_rng: np.random.Generator,
                     drop_remainder: bool = False) -> tuple[tuple, dict]:
    """Semi-supervised epoch: iterate the unlabeled loader, cycling the
    labeled loader with reshuffle-on-exhaustion (reference
    modules/train.py:222-231). ``drop_remainder`` applies to BOTH streams
    (a sharded step needs fixed per-device shapes; the reference keeps
    short batches — single-device default)."""
    if drop_remainder and len(x_l) < batch_size_l:
        raise ValueError(
            f"labeled stream ({len(x_l)}) smaller than batch_sizeL "
            f"({batch_size_l}) with drop_remainder; lower batch_sizeL")
    if drop_remainder and len(x_u) < batch_size:
        raise ValueError(
            f"unlabeled stream ({len(x_u)}) smaller than batch_size "
            f"({batch_size}) with drop_remainder — every epoch would run "
            "zero steps; lower batch_size")
    avg = Averager()
    labeled_iter = batch_indices(len(x_l), batch_size_l, shuffle_rng,
                                 drop_remainder)
    for b, idx_u in enumerate(batch_indices(len(x_u), batch_size,
                                            shuffle_rng, drop_remainder)):
        try:
            idx_l = next(labeled_iter)
        except StopIteration:
            labeled_iter = batch_indices(len(x_l), batch_size_l, shuffle_rng,
                                         drop_remainder)
            idx_l = next(labeled_iter)
        step_rng = jax.random.fold_in(jax.random.fold_in(rng, epoch), b)
        *state, metrics = step(*state, x_u[idx_u], x_l[idx_l], y_l[idx_l],
                               step_rng)
        avg.add(metrics)
    return tuple(state), avg.result()


def format_epoch(epoch: int, metrics: dict) -> str:
    """The reference's console line format (main.py:206-208)."""
    body = "".join(f", {k}: {v:.4f}" for k, v in metrics.items())
    return f"[epoch {epoch + 1:03d}]{body}"


def run_scanned_chunks(raw_step: Callable, state: tuple, x, y, rng,
                       *, epochs: int, batch_size: int, start_epoch: int = 0,
                       chunk: int = 5, on_epoch: Callable | None = None,
                       post_epoch: Callable | None = None,
                       post_epoch_pred: Callable | None = None,
                       make_runner: Callable | None = None,
                       batch_args: tuple | None = None) -> tuple:
    """Drive training with the scan-compiled trainer in chunked dispatches
    (train/scanned.py) — the shared fast path for every supervised family
    (pendulum/DR/tabular/TVAE/celeba; semi via ``make_runner``).

    raw_step: UNJITTED (params, opt_state, *batch, rng) -> (params,
    opt_state, metrics) step. ``on_epoch(epoch, metrics_dict)`` is called per
    epoch with host floats. ``post_epoch(state, epoch)`` is called at chunk
    boundaries with the exact post-``epoch`` state; chunks are split so
    every epoch where ``post_epoch_pred(epoch)`` is true ends a chunk, and
    when a predicate is given ONLY pred-true epochs invoke the callback
    (without one, every natural chunk end does).
    ``make_runner(n_epochs)`` overrides the runner construction (semi);
    ``batch_args`` overrides the (x, y) data args passed to the runner.
    Returns the final (params, opt_state).

    NOTE: the state handed to ``post_epoch`` is donated into the next
    chunk's dispatch — read/copy it inside the callback (save_checkpoint
    and viz forwards do); do not retain device references.
    """
    from .scanned import make_scanned_epochs

    if batch_args is None:
        batch_args = (x, y)
    n_data = len(batch_args[0])
    if batch_size > n_data:
        # smaller-than-batch datasets (smoke runs): one full-dataset step
        # per epoch instead of a zero-step scan
        batch_size = n_data
    if make_runner is None:
        def make_runner(n_epochs):
            return make_scanned_epochs(raw_step, batch_size=batch_size,
                                       n_epochs_per_call=n_epochs)

    def _chunk_len(epoch):
        n = min(chunk, epochs - epoch)
        if post_epoch_pred is not None:
            for i in range(n):
                if post_epoch_pred(epoch + i):
                    return i + 1
        return n

    runners = {}
    epoch = start_epoch
    while epoch < epochs:
        n_call = _chunk_len(epoch)
        if n_call not in runners:
            runners[n_call] = make_runner(n_call)
        p, o = state
        p, o, ms = runners[n_call](p, o, *batch_args, rng, epoch)
        state = (p, o)
        ms = {k: np.asarray(v) for k, v in ms.items()}
        for i in range(n_call):
            if on_epoch is not None:
                on_epoch(epoch + i, {k: float(v[i]) for k, v in ms.items()})
        epoch += n_call
        if post_epoch is not None and (post_epoch_pred is None
                                       or post_epoch_pred(epoch - 1)):
            # exact: state is the post-(epoch-1) state at a chunk boundary;
            # with a predicate, ONLY pred-true epochs fire (natural chunk
            # ends are dispatch granularity, not callback cadence — an
            # ungated callback like dr_main's viz would otherwise write
            # off-cadence artifacts at every chunk boundary)
            post_epoch(state, epoch - 1)
    return state


def run_scanned_chunks_pair(raw_step: Callable, state4: tuple, x, y, rng,
                            **kwargs) -> tuple:
    """InfoMax adapter for :func:`run_scanned_chunks`: packs the 4-tuple
    ``(params, d_params, opt_state, opt_state_d)`` into the
    ``((params, d_params), (opt, opt_d))`` pair layout the scanned runners
    expect, and unpacks the result. ``post_epoch`` (if given) receives the
    pair state — its [0][0] is the model params."""
    pair = ((state4[0], state4[1]), (state4[2], state4[3]))
    pair = run_scanned_chunks(raw_step, pair, x, y, rng, **kwargs)
    return (pair[0][0], pair[0][1], pair[1][0], pair[1][1])

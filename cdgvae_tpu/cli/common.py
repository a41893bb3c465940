"""Shared CLI plumbing: list-arg parsing, logging/output flags, mesh setup."""
from __future__ import annotations

import argparse
import ast

import jax

from ..parallel.mesh import make_mesh
from ..utils.cache import enable_compilation_cache as _enable_cache

# every CLI entry benefits from the persistent XLA compile cache (cold
# compiles on this backend run 30-450s)
_enable_cache()


def arg_as_list(s: str):
    """Parse a Python-literal list flag (reference main.py:55-59)."""
    v = ast.literal_eval(s)
    if type(v) is not list:
        raise argparse.ArgumentTypeError(f'Argument "{s}" is not a list')
    return v


def arg_as_bool(s):
    """Boolean flag parser. The reference uses ``type=bool``, under which
    every non-empty string — including 'False' — parses as True, so its
    False branches are unreachable from the CLI; this parser keeps the
    flag names/defaults but makes '--flag False' actually work
    (documented deviation)."""
    if isinstance(s, bool):
        return s
    v = s.strip().lower()
    if v in ("true", "1", "yes", "y"):
        return True
    if v in ("false", "0", "no", "n"):
        return False
    raise argparse.ArgumentTypeError(f'expected a boolean, got "{s}"')


def _platform_arg(s: str):
    """``--platform`` value hook: force the JAX backend for this process.

    Applied HERE, at parse time (argparse ``type`` hook), because the
    override must land before the first device touch and every entry
    point parses flags before touching devices. This jax build ignores
    the ``JAX_PLATFORMS`` env var once jax is imported (observed: env
    set, TPU still attached), so the in-process ``jax.config`` update —
    the same mechanism tests/conftest.py uses — is the only reliable
    override. Empty string (the default) is a no-op.
    """
    v = s.strip().lower()
    if v:
        jax.config.update("jax_platforms", v)
    return v


def add_platform_arg(parser: argparse.ArgumentParser):
    """--platform alone, for the eval/analysis CLIs whose parsers don't
    take the full training infra set (they still touch devices, so they
    need the backend override while the chip is busy or down)."""
    parser.add_argument("--platform", default="", type=_platform_arg,
                        help="force the JAX backend for this process "
                             "(e.g. 'cpu' for drives while the TPU is "
                             "busy or the tunnel is down); default: "
                             "jax's platform priority order")
    return parser


def add_infra_args(parser: argparse.ArgumentParser):
    """Framework-side flags that have no reference counterpart."""
    add_platform_arg(parser)
    parser.add_argument("--wandb", action="store_true",
                        help="enable wandb logging (optional here; the "
                             "reference hard-requires it)")
    parser.add_argument("--assets_dir", default="./assets", type=str,
                        help="output directory for figures and checkpoints")
    parser.add_argument("--dp", default=0, type=int,
                        help="number of devices for the data-parallel mesh "
                             "(0 = all local devices if batch divides evenly,"
                             " else single device)")
    parser.add_argument("--n_samples", default=10000, type=int,
                        help="DGP sample count for the synthetic datasets "
                             "(10000 = reference; smaller for smoke tests)")
    parser.add_argument("--eager", action="store_true",
                        help="per-batch eager epoch driver instead of the "
                             "scan-compiled trainer (the reference's exact "
                             "protocol incl. partial final batches; much "
                             "slower: one dispatch per batch)")
    parser.add_argument("--profile", default="", type=str, metavar="DIR",
                        help="write a jax.profiler (XLA op-level, "
                             "TensorBoard-loadable) trace of the training "
                             "drive to DIR (scanned/online paths; see "
                             "utils/profiling.py)")
    return parser


def add_resume_arg(parser: argparse.ArgumentParser):
    """--resume for the training CLIs (new scope: the reference saves once
    at the end of training and has no resume path at all, main.py:233)."""
    parser.add_argument("--resume", default="", type=str,
                        help="checkpoint directory to resume from (restores "
                             "params + optimizer state + epoch)")
    return parser


def apply_resume(config: dict, state: tuple):
    """Restore training state and the start epoch from --resume.

    Returns (state, start_epoch): ``(params, opt_state)`` for VAE/CDGVAE,
    or the 4-tuple ``(params, d_params, opt_state, opt_state_d)`` for
    InfoMax (the discriminator state rides in the checkpoint's extras;
    pre-extras InfoMax checkpoints cannot resume).
    """
    if not config.get("resume"):
        return state, 0
    from ..utils.checkpoint import load_checkpoint

    ck = load_checkpoint(config["resume"])
    start_epoch = int(ck["step"])
    if start_epoch >= config.get("epochs", float("inf")):
        raise ValueError(
            f"--resume checkpoint is at epoch {start_epoch}, which is "
            f"already >= --epochs {config['epochs']}; raising --epochs is "
            "required to continue (running on would retrain from scratch "
            "and overwrite the checkpoint's step metadata)")
    # keyed on the trainer's actual state arity, not the free-form --model
    # string (celeba/semi CLIs accept any --model name but train 2-tuples)
    if len(state) == 4:
        ex = ck["extras"] or {}
        if "d_params" not in ex or "opt_state_d" not in ex:
            raise ValueError(
                "--resume: this InfoMax checkpoint has no discriminator "
                "state (saved by an older version); cannot resume")
        state = (jax.device_put(ck["params"]),
                 jax.device_put(ex["d_params"]),
                 jax.device_put(ck["opt_state"]),
                 jax.device_put(ex["opt_state_d"]))
    else:
        state = (jax.device_put(ck["params"]),
                 jax.device_put(ck["opt_state"]))
    print(f"resumed from {config['resume']} at epoch {start_epoch}")
    return state, start_epoch


def add_png_data_dir_arg(parser: argparse.ArgumentParser):
    """--data_dir for the pendulum/DR image families: load a
    reference-format PNG tree (<dir>/{train,test}/a_*.png, labels in
    filenames — e.g. the reference's modules/causal_data/pendulum_real)
    instead of rendering the DGP on device. Generate one with
    cli.generate_data. (The tabular CLIs have their own --data_dir for
    CSVs, hence not part of add_infra_args.)"""
    parser.add_argument("--data_dir", default="", type=str,
                        help="reference-format PNG dataset tree "
                             "(default: render on device)")
    return parser


def resolve_mesh(config: dict, extra_batch_sizes=()):
    """Build the dp mesh per --dp; None means single-device execution.

    Every batch size the entry point trains with (``batch_size`` plus any
    in ``extra_batch_sizes``, e.g. the semi-supervised labeled stream's
    ``batch_sizeL``) must divide over the devices: with auto ``--dp 0``
    a non-divisible size falls back to single-device, with an explicit
    ``--dp N`` it raises.
    """
    n_dev = len(jax.devices())
    dp = config.get("dp", 0)
    if dp == 1 or (dp == 0 and n_dev == 1):
        return None
    n = dp if dp > 0 else n_dev
    for name, bs in [("batch_size", config["batch_size"])] + [
            ("extra batch size", b) for b in extra_batch_sizes]:
        if bs % n != 0:
            if dp > 0:
                raise ValueError(f"{name} {bs} not divisible by dp={n}")
            return None
    return make_mesh(n)


def _shard_over_dp(mesh, arrays):
    """Reshard device-resident arrays over the dp axis (rows not divisible
    by the device count are dropped) — a device-to-device reshard, no host
    round-trip."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.devices.size
    sh = NamedSharding(mesh, P("dp"))
    out = []
    for a in arrays:
        n = (len(a) // n_dev) * n_dev
        if n == 0:
            raise ValueError(
                f"dataset ({len(a)} rows) smaller than the device count "
                f"({n_dev}); use fewer devices (--dp) or more data")
        if n != len(a):
            print(f"[dp] dropping {len(a) - n} of {len(a)} rows to shard "
                  f"evenly over {n_dev} devices")
        out.append(jax.device_put(a[:n], sh))
    return out


def run_online_training(config, *, loss_fn, optimizer, state, k_train,
                        mesh, start_epoch, on_epoch, sample_batch_builder,
                        labeled=None, post_epoch=None,
                        post_epoch_pred=None):
    """Shared ``--online`` (fresh-data-per-step) training driver for the
    image-family CLIs (main, dr_main, main_semi, dr_main_semi): wires ANY
    loss onto ``train/online.py::make_online_run_from_loss`` for
    (single-device | dp mesh) and drives one dispatch per epoch-equivalent
    (the reference protocol's steps-per-epoch, derived from the DGP's
    train-split size — no dataset needs to be materialized).

    ``loss_fn(params, x, y, rng)`` for supervised losses (incl. the
    InfoMax pair loss over ``(params, d_params)`` with the fused
    ``pair_infomax_optimizer``); ``labeled=(x_l, y_l)`` switches to the
    semi-supervised shape ``loss_fn(params, x_u, x_l, y_l, rng)`` (arrays
    sharded over dp under a mesh; ``batch_sizeL`` clamped to the
    available rows). ``sample_batch_builder(batch_size) -> sample_batch``
    supplies the family's device DGP+rasterizer. Returns the final
    ``state`` (same pytree layout as passed in).
    """
    import numpy as np

    from ..parallel.mesh import replicate
    from ..train.online import (make_online_run_from_loss, split_batch,
                                train_split_size)

    bs = config["batch_size"]
    steps_per_epoch = max(train_split_size(config["n_samples"]) // bs, 1)
    semi = labeled is not None
    x_l = y_l = None
    kw = {}
    if mesh is not None:
        local_bs = split_batch(bs, mesh)
        state = replicate(mesh, state)
        if semi:
            x_l, y_l = _shard_over_dp(mesh, labeled)
            bs_l = min(config["batch_sizeL"], len(x_l))
            kw["batch_size_l"] = split_batch(bs_l, mesh,
                                             name="batch_sizeL")
        kw.update(mesh=mesh, local_bs=local_bs)
        sample_batch = sample_batch_builder(local_bs)
    else:
        if semi:
            x_l, y_l = labeled
            kw["batch_size_l"] = min(config["batch_sizeL"], len(x_l))
        sample_batch = sample_batch_builder(bs)
    run = make_online_run_from_loss(loss_fn, optimizer, sample_batch,
                                    steps_per_epoch, **kw)

    from ..utils.profiling import trace
    with trace(config.get("profile") or None):
        for epoch in range(start_epoch, config["epochs"]):
            extra = (x_l, y_l) if semi else ()
            p, o, ms = run(state[0], state[1], *extra, k_train,
                           epoch * steps_per_epoch)
            state = (p, o)
            on_epoch(epoch, {k: float(np.mean(np.asarray(v)))
                             for k, v in ms.items()})
            if post_epoch is not None and (post_epoch_pred is None
                                           or post_epoch_pred(epoch)):
                post_epoch(state, epoch)
    return state


def sharded_scan_setup(mesh, x_data, y_data, loss_fn, optimizer,
                       batch_size: int, post_update=None):
    """Wire a CLI onto the multi-chip shard_map scanned trainer: shard the
    dataset over the dp axis and build the ``make_runner`` hook for
    ``train.loop.run_scanned_chunks``. Per-shard shuffling and one gradient
    pmean per step over ICI (see train/scanned.py). ``batch_size`` is
    clamped to the (trimmed) dataset size for smaller-than-batch smoke runs,
    mirroring run_scanned_chunks' single-device clamp.

    NOTE: the returned sharded arrays are a second copy of the dataset —
    callers that keep the original device-resident arrays alive (e.g. for
    viz) should retain only the slice they need.

    Returns (x_sharded, y_sharded, make_runner).
    """
    from ..train.scanned import make_sharded_scanned_epochs_from_loss

    xd, yd = _shard_over_dp(mesh, (x_data, y_data))
    # both operands are multiples of n_dev, so the clamp stays divisible
    batch_size = min(batch_size, len(xd))

    def make_runner(n_epochs):
        return make_sharded_scanned_epochs_from_loss(
            loss_fn, optimizer, mesh, batch_size,
            n_epochs_per_call=n_epochs, post_update=post_update)

    return xd, yd, make_runner


def run_scanned_training(config, *, raw_step, state, data, k_train, mesh,
                         make_loss, optimizer, chunk=5, start_epoch=0,
                         on_epoch=None, post_epoch=None,
                         post_epoch_pred=None, post_update=None,
                         pair=False):
    """The scan-compiled training branch shared by every supervised /
    InfoMax training CLI (pendulum, DR, tabular, TVAE, CelebA): wires the
    single-device scanned runner, or — under a dp mesh — the shard_map
    scanned trainer, then drives chunked dispatches via
    ``train.loop.run_scanned_chunks`` (``_pair`` for InfoMax).

    ``data`` is a LIST ``[x, y]`` this function takes ownership of (it is
    cleared on entry): under a mesh the arrays are resharded over the dp
    axis, and a caller that also nulls its own locals thereby releases the
    unsharded copies (the 128px CelebA corpus is GBs — keep only a viz
    slice). ``make_loss()`` is invoked only when a mesh is active: the
    sharded runner is built from the bare loss fn + ``optimizer``, while
    single-device execution reuses ``raw_step`` (the unjitted fused step).
    ``pair=True`` runs the InfoMax (model, discriminator) 4-tuple adapter;
    ``optimizer`` must then be the fused pair optimizer
    (``train.steps.pair_infomax_optimizer``). Remaining kwargs forward to
    ``run_scanned_chunks``.
    """
    from ..train.loop import run_scanned_chunks, run_scanned_chunks_pair

    x, y = data
    data.clear()
    make_runner = None
    if mesh is not None:
        x, y, make_runner = sharded_scan_setup(
            mesh, x, y, make_loss(), optimizer, config["batch_size"],
            post_update=post_update)
    run = run_scanned_chunks_pair if pair else run_scanned_chunks
    from ..utils.profiling import trace
    with trace(config.get("profile") or None):
        return run(raw_step, state, x, y, k_train,
                   epochs=config["epochs"], start_epoch=start_epoch,
                   batch_size=config["batch_size"], chunk=chunk,
                   on_epoch=on_epoch, post_epoch=post_epoch,
                   post_epoch_pred=post_epoch_pred,
                   make_runner=make_runner)


def run_scanned_training_semi(config, *, raw_step, state, data, k_train,
                              mesh, make_loss, optimizer, chunk=10,
                              start_epoch=0, on_epoch=None):
    """Semi-supervised counterpart of :func:`run_scanned_training` for the
    (unlabeled, labeled, labels) two-stream trainers (cli.main_semi /
    cli.dr_main_semi). ``data`` is a list ``[x_u, x_l, y_l]`` taken by
    ownership; both streams shard over dp under a mesh (each device cycles
    its own labeled shard), batch sizes clamp to their stream sizes."""
    from ..train.loop import run_scanned_chunks
    from ..train.scanned import make_scanned_epochs_semi

    x_u, x_l, y_l = data
    data.clear()
    if mesh is not None:
        x_u, x_l, y_l, make_runner = sharded_scan_setup_semi(
            mesh, x_u, x_l, y_l, make_loss(), optimizer,
            config["batch_size"], config["batch_sizeL"])
        bs = min(config["batch_size"], len(x_u))
    else:
        bs = min(config["batch_size"], len(x_u))
        bs_l = min(config["batch_sizeL"], len(x_l))

        def make_runner(n):
            return make_scanned_epochs_semi(raw_step, bs, bs_l,
                                            n_epochs_per_call=n)

    from ..utils.profiling import trace
    with trace(config.get("profile") or None):
        return run_scanned_chunks(
            raw_step, state, x_u, y_l, k_train,
            epochs=config["epochs"], start_epoch=start_epoch,
            batch_size=bs, chunk=chunk, on_epoch=on_epoch,
            batch_args=(x_u, x_l, y_l), make_runner=make_runner)


def sharded_scan_setup_semi(mesh, x_u, x_l, y_l, loss_fn, optimizer,
                            batch_size: int, batch_size_l: int):
    """Semi-supervised variant of :func:`sharded_scan_setup`: shard both
    streams over the dp axis (each device cycles its own labeled shard) and
    build the ``make_runner`` hook. Both batch sizes are clamped to their
    (trimmed) stream sizes.

    Returns (x_u_sharded, x_l_sharded, y_l_sharded, make_runner).
    """
    from ..train.scanned import make_sharded_scanned_epochs_semi_from_loss

    xu, xl, yl = _shard_over_dp(mesh, (x_u, x_l, y_l))
    batch_size = min(batch_size, len(xu))
    batch_size_l = min(batch_size_l, len(xl))

    def make_runner(n_epochs):
        return make_sharded_scanned_epochs_semi_from_loss(
            loss_fn, optimizer, mesh, batch_size, batch_size_l,
            n_epochs_per_call=n_epochs)

    return xu, xl, yl, make_runner


def publish_model_artifact(logger, ckpt: str, config: dict, model=None,
                           entry_file: str | None = None):
    """Publish the saved checkpoint as a wandb Artifact (reference
    main.py:233-240 uploads the state dict + main.py + modules/model.py;
    here: the checkpoint directory + the entry-point source + the model
    class's source module). No-op when wandb is off/absent."""
    import os
    import sys
    sources = [entry_file]
    if model is not None:
        mod = sys.modules.get(type(model).__module__)
        sources.append(getattr(mod, "__file__", None))
    logger.log_artifact(os.path.basename(ckpt), ckpt, metadata=config,
                        sources=[s for s in sources if s])

"""Pendulum training entry point — flag parity with reference main.py:61-113.

Usage: python -m cdgvae_tpu.cli.main --model CDGVAE --scm linear ...
Trains VAE / InfoMax / CDG-VAE on the device-rendered pendulum_real dataset
and writes a self-describing checkpoint (params + opt state + config).
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import optax

from ..data.pendulum import PendulumDataset
from ..factory import build_pendulum_model
from ..train.steps import (make_train_step, make_infomax_step,
                           pair_infomax_step)
from ..train.loop import train_epoch, format_epoch
from ..utils.simulation import set_random_seed
from ..utils.checkpoint import save_checkpoint
from ..utils.logging import MetricLogger
from ..utils.viz import viz_recon_grid
from .common import (arg_as_bool,
                     arg_as_list, add_infra_args, add_png_data_dir_arg,
                     resolve_mesh, add_resume_arg)


def get_args(debug: bool = False, argv=None):
    parser = argparse.ArgumentParser("parameters")
    # flag-for-flag with reference main.py:61-113
    parser.add_argument("--seed", type=int, default=1,
                        help="seed for repeatable results")
    parser.add_argument("--model", type=str, default="CDGVAE",
                        help="VAE based model options: VAE, InfoMax, CDGVAE")
    parser.add_argument("--node", default=4, type=int,
                        help="the number of nodes")
    parser.add_argument("--scm", default="linear", type=str,
                        help="SCM structure options: linear or nonlinear")
    parser.add_argument("--flow_num", default=1, type=int,
                        help="the number of invertible NN flow")
    parser.add_argument("--inverse_loop", default=100, type=int,
                        help="the number of inverse loop")
    parser.add_argument("--factor", default=[1, 1, 2], type=arg_as_list,
                        help="Numbers of latents allocated to each factor")
    parser.add_argument("--labeled_ratio", default=1, type=float,
                        help="ratio of labeled dataset for semi-supervised")
    parser.add_argument("--label_normalization", default=True, type=arg_as_bool,
                        help="If True, normalize additional label data")
    parser.add_argument("--adjacency_scaling", default=True, type=arg_as_bool,
                        help="If True, scale adjacency matrix by in-degree")
    parser.add_argument("--image_size", default=64, type=int,
                        help="width and height of image")
    parser.add_argument("--epochs", default=100, type=int,
                        help="maximum iteration")
    parser.add_argument("--batch_size", default=128, type=int,
                        help="batch size")
    parser.add_argument("--lr", default=0.001, type=float,
                        help="learning rate")
    parser.add_argument("--lr_D", default=0.0001, type=float,
                        help="learning rate for discriminator in InfoMax")
    parser.add_argument("--beta", default=0.1, type=float,
                        help="observation noise")
    parser.add_argument("--lambda", default=5, type=float,
                        help="weight of label alignment loss")
    parser.add_argument("--free_bits", default=0.0, type=float,
                        help="opt-in posterior-collapse mitigation for "
                             "the supervised VAE/CDGVAE protocol: floor "
                             "the per-dim KL at this many nats (free "
                             "bits; ops/losses.py). 0 = the exact "
                             "reference objective (modules/train.py:"
                             "180-186). Round-4 A/B: docs/results/"
                             "cdm_seeds_freebits.json")
    parser.add_argument("--gamma", default=1, type=float,
                        help="weight of f-divergence (InfoMax)")
    parser.add_argument("--online", action="store_true",
                        help="fresh-data-per-step training: every step "
                             "draws a new batch from the pendulum_real DGP "
                             "and rasterizes it ON DEVICE inside the "
                             "compiled scan (train/online.py) — infinite "
                             "data, no input pipeline; a capability the "
                             "reference's PNG pipeline cannot express. "
                             "All models (incl. InfoMax via the pair "
                             "loss), scanned path; composes with --dp "
                             "(per-device DGP draws, one gradient pmean "
                             "per step)")
    add_png_data_dir_arg(parser)
    add_resume_arg(parser)
    add_infra_args(parser)
    if debug:
        return parser.parse_args(args=[])
    return parser.parse_args(argv)


def _make_viz_forward(model):
    # jitted once: an eager forward is one tunnel round trip PER OP on this
    # backend (docs/PERF.md); cache scoped to the caller so repeated main()
    # invocations don't accumulate executables
    fwd = jax.jit(lambda p, x, r: model(p, x, rng=r))

    def viz(params, x_data, batch_size, rng):
        n = min(batch_size, len(x_data))
        return fwd(params, x_data[:n], rng)

    return viz


def main(argv=None):
    config = vars(get_args(argv=argv))
    if config["free_bits"] and config["model"] == "InfoMax":
        raise SystemExit("--free_bits targets the supervised VAE/CDGVAE "
                         "objective; the InfoMax path does not wire it")
    config["spurious"] = False  # family marker for checkpoint loaders (api.py)
    set_random_seed(config["seed"])
    logger = MetricLogger(logdir=config["assets_dir"],
                          use_wandb=config["wandb"], tags=["VAEBased"],
                          config=config)

    if config["online"]:
        # no dataset at all: --online draws every batch from the device
        # DGP; the viz batch below comes from the same device draw
        # (no label_normalization=False / labeled_ratio<1 support — the
        # online stream's labels use the frozen normalization constants
        # and every step draws full fresh labels; same guard as dr_main)
        if config["eager"] or config.get("data_dir") or \
                config["labeled_ratio"] < 1 or \
                not config["label_normalization"]:
            raise SystemExit("--online supports the scanned path on the "
                             "synthetic DGP with full labels and "
                             "label_normalization only")
        x_data = y_data = None
    else:
        dataset = PendulumDataset(
            data_dir=config.get("data_dir") or None,
            image_size=config["image_size"], train=True,
            labeled_ratio=config["labeled_ratio"],
            label_normalization=config["label_normalization"],
            seed=config["seed"], n=config["n_samples"])
        x_data = jax.device_put(dataset.x_data)
        y_data = jax.device_put(dataset.y_data)

    model, discriminator = build_pendulum_model(config)
    key = jax.random.key(config["seed"])
    k_model, k_disc, k_train = jax.random.split(key, 3)
    params = model.init(k_model)

    mesh = resolve_mesh(config)
    optimizer = optax.adam(config["lr"])
    opt_state = optimizer.init(params)

    if config["model"] == "InfoMax":
        d_params = discriminator.init(k_disc)
        optimizer_d = optax.adam(config["lr_D"])
        opt_state_d = optimizer_d.init(d_params)
        step = make_infomax_step(model, discriminator, optimizer,
                                 optimizer_d, config["beta"],
                                 config["lambda"], config["gamma"], mesh=mesh)
        state = (params, d_params, opt_state, opt_state_d)
    else:
        step = make_train_step(model, optimizer, config["beta"],
                               config["lambda"], mesh=mesh,
                               free_bits=config["free_bits"])
        state = (params, opt_state)

    from .common import apply_resume
    state, start_epoch = apply_resume(config, state)

    shuffle_rng = np.random.default_rng(config["seed"] + start_epoch)
    os.makedirs(config["assets_dir"], exist_ok=True)

    _viz = _make_viz_forward(model)
    # fixed viz slice: lets the --dp paths release the full unsharded
    # dataset (the sharded copy is the training copy); same compiled shape
    # every call. Under --online there is no dataset — the viz batch is
    # one jitted draw from the same device DGP the trainer uses.
    if config["online"]:
        from ..train.online import pendulum_batch_fn
        _sample_builder = lambda bs: pendulum_batch_fn(  # noqa: E731
            bs, config["image_size"], norm_seed=config["seed"],
            norm_n=config["n_samples"])
        x_viz = jax.jit(_sample_builder(config["batch_size"]))(
            jax.random.fold_in(k_train, 2**29))[0]
    else:
        x_viz = x_data[:min(config["batch_size"], len(x_data))]

    def _ckpt_due(epoch):
        return (epoch + 1) % 25 == 0 and epoch + 1 < config["epochs"]

    def _viz_due(epoch):
        return epoch % 10 == 0

    def _post_epoch(state, epoch):
        # ``state`` here is always (model params, model opt state)
        if _ckpt_due(epoch) and config["model"] != "InfoMax":
            # mid-run checkpoint (the reference saves only once at the end,
            # main.py:233, with no resume path). InfoMax mid-run saves are
            # skipped — the pair state is not threaded through this hook;
            # its FINAL checkpoint carries the discriminator extras and
            # does resume.
            save_checkpoint(
                os.path.join(config["assets_dir"],
                             f"model_{config['model']}_{config['scm']}"),
                state[0], opt_state=state[-1], step=epoch + 1,
                config=config)
        if _viz_due(epoch):
            # forward on a training-batch-sized slice: reuses the same
            # compiled shape every time (cold compiles are minutes here)
            out = _viz(state[0], x_viz, config["batch_size"],
                       jax.random.fold_in(k_train, 2**31))
            viz_recon_grid(np.asarray(out.xhat[:9]),
                           f"{config['assets_dir']}/tmp_image_{epoch}.png")

    def _on_epoch(epoch, metrics):
        print(format_epoch(epoch, metrics))
        logger.log(metrics, step=epoch)

    pred = lambda e: _ckpt_due(e) or _viz_due(e)  # noqa: E731
    if config["online"]:
        # fresh-data-per-step: DGP draw + rasterization + train step all
        # inside one compiled scan (train/online.py) — one dispatch per
        # epoch-equivalent (reference-protocol step count); under --dp
        # every device runs its own DGP with one gradient pmean per step
        from ..train.scanned import make_supervised_loss_fn
        from .common import run_online_training
        if config["model"] == "InfoMax":
            # the InfoMax pair loss + fused pair optimizer ride the same
            # online runner; marginal="roll" under a mesh (per-device
            # batch slices, see make_infomax_loss_fn)
            from ..train.steps import (make_infomax_loss_fn,
                                       pair_infomax_optimizer)
            pair = run_online_training(
                config,
                loss_fn=make_infomax_loss_fn(
                    model, discriminator, config["beta"],
                    config["lambda"], config["gamma"],
                    marginal="roll" if mesh is not None
                    else "permutation"),
                optimizer=pair_infomax_optimizer(optimizer, optimizer_d),
                state=((state[0], state[1]), (state[2], state[3])),
                k_train=k_train, mesh=mesh, start_epoch=start_epoch,
                on_epoch=_on_epoch, sample_batch_builder=_sample_builder,
                post_epoch=lambda s, e: _post_epoch((s[0][0], s[1][0]), e),
                post_epoch_pred=pred)
            state = (pair[0][0], pair[0][1], pair[1][0], pair[1][1])
        else:
            state = run_online_training(
                config,
                loss_fn=make_supervised_loss_fn(
                    model, config["beta"], config["lambda"],
                    free_bits=config["free_bits"]),
                optimizer=optimizer, state=state, k_train=k_train,
                mesh=mesh, start_epoch=start_epoch, on_epoch=_on_epoch,
                sample_batch_builder=_sample_builder,
                post_epoch=_post_epoch, post_epoch_pred=pred)
    elif config["model"] != "InfoMax" and not config["eager"]:
        # scan-compiled trainer: one device dispatch per <=5-epoch chunk
        # (the reference protocol dispatches per batch — ~5800 host round
        # trips for its 100-epoch run). Chunks additionally split at every
        # viz/checkpoint epoch so those artifacts are built from the EXACT
        # post-epoch state. The remainder batch of each epoch is dropped
        # (fixed shapes under scan; <2% of steps at the reference sizes;
        # --eager restores the exact per-batch protocol). Under --dp the
        # shared driver swaps in the shard_map scanned trainer (per-shard
        # shuffling, one gradient pmean per step over ICI).
        from ..train.scanned import make_supervised_loss_fn
        from .common import run_scanned_training
        raw = make_train_step(model, optimizer, config["beta"],
                              config["lambda"], jit=False,
                              free_bits=config["free_bits"])
        data = [x_data, y_data]
        x_data = y_data = None  # driver owns the training copy
        state = run_scanned_training(
            config, raw_step=raw, state=state, data=data, k_train=k_train,
            mesh=mesh,
            make_loss=lambda: make_supervised_loss_fn(
                model, config["beta"], config["lambda"],
                free_bits=config["free_bits"]),
            optimizer=optimizer, chunk=5, start_epoch=start_epoch,
            on_epoch=_on_epoch, post_epoch=_post_epoch,
            post_epoch_pred=pred)
    elif config["model"] == "InfoMax" and not config["eager"]:
        # InfoMax under the same scanned trainer: (model, discriminator)
        # params/opt states ride as pairs with the fused pair optimizer.
        # marginal="roll" keeps the per-device MI marginal non-degenerate
        # at small local batches (see marginal_epsilon)
        from ..train.steps import (make_infomax_loss_fn,
                                   pair_infomax_optimizer)
        from .common import run_scanned_training
        raw = pair_infomax_step(make_infomax_step(
            model, discriminator, optimizer, optimizer_d, config["beta"],
            config["lambda"], config["gamma"], jit=False))
        data = [x_data, y_data]
        x_data = y_data = None  # driver owns the training copy
        state = run_scanned_training(
            config, raw_step=raw, state=state, data=data, k_train=k_train,
            mesh=mesh,
            make_loss=lambda: make_infomax_loss_fn(
                model, discriminator, config["beta"], config["lambda"],
                config["gamma"], marginal="roll"),
            optimizer=pair_infomax_optimizer(optimizer, optimizer_d),
            chunk=5, start_epoch=start_epoch, on_epoch=_on_epoch,
            post_epoch=lambda s, e: _post_epoch((s[0][0], s[1][0]), e),
            post_epoch_pred=pred, pair=True)
    else:
        for epoch in range(start_epoch, config["epochs"]):
            state, metrics = train_epoch(
                step, state, x_data, y_data, config["batch_size"], k_train,
                epoch, shuffle_rng, drop_remainder=mesh is not None)
            print(format_epoch(epoch, metrics))
            logger.log(metrics, step=epoch)
            _post_epoch((state[0], state[2])
                        if config["model"] == "InfoMax" else state, epoch)

    out = _viz(state[0], x_viz, config["batch_size"],
               jax.random.fold_in(k_train, 2**31))
    viz_recon_grid(np.asarray(out.xhat), f"{config['assets_dir']}/recon.png")
    logger.log_image("reconstruction", f"{config['assets_dir']}/recon.png")

    ckpt = os.path.join(config["assets_dir"],
                        f"model_{config['model']}_{config['scm']}")
    save_checkpoint(ckpt, state[0],
                    opt_state=state[-1] if config["model"] != "InfoMax"
                    else state[2],
                    step=config["epochs"], config=config,
                    extras={"d_params": state[1],
                            "opt_state_d": state[3]}
                    if config["model"] == "InfoMax" else None)
    print(f"checkpoint saved to {ckpt}")
    from .common import publish_model_artifact
    publish_model_artifact(logger, ckpt, config, model,
                           entry_file=__file__)
    logger.finish()
    return state


if __name__ == "__main__":
    main()

"""DR-family training entry point (reference DR/main.py): node=5 with the
spurious background latent wired into every GAM decoder block, λ=20."""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import optax

from ..data.pendulum_dr import PendulumDRDataset
from ..factory import build_pendulum_model
from ..train.steps import make_train_step, make_infomax_step
from ..train.loop import train_epoch, format_epoch
from ..utils.simulation import set_random_seed
from ..utils.checkpoint import save_checkpoint
from ..utils.logging import MetricLogger
from ..utils.viz import viz_recon_grid
from .common import (arg_as_bool,
                     arg_as_list, add_infra_args, add_png_data_dir_arg,
                     resolve_mesh, add_resume_arg, apply_resume)


def get_args(debug: bool = False, argv=None):
    parser = argparse.ArgumentParser("parameters")
    # parity with reference DR/main.py:61-108
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--model", type=str, default="CDGVAE")
    parser.add_argument("--node", default=5, type=int)
    parser.add_argument("--scm", default="linear", type=str)
    parser.add_argument("--flow_num", default=1, type=int)
    parser.add_argument("--inverse_loop", default=100, type=int)
    parser.add_argument("--factor", default=[1, 1, 2], type=arg_as_list)
    parser.add_argument("--labeled_ratio", default=1, type=float)
    parser.add_argument("--label_normalization", default=True, type=arg_as_bool)
    parser.add_argument("--adjacency_scaling", default=True, type=arg_as_bool)
    parser.add_argument("--image_size", default=64, type=int)
    parser.add_argument("--epochs", default=100, type=int)
    parser.add_argument("--batch_size", default=128, type=int)
    parser.add_argument("--lr", default=0.001, type=float)
    parser.add_argument("--lr_D", default=0.0001, type=float)
    parser.add_argument("--beta", default=0.1, type=float)
    parser.add_argument("--lambda", default=20, type=float)
    parser.add_argument("--gamma", default=1, type=float)
    parser.add_argument("--free_bits", default=0.0, type=float,
                        help="opt-in per-dim KL floor (posterior-collapse "
                             "mitigation; supervised models only — see "
                             "cli.main --free_bits). 0 = reference "
                             "objective")
    parser.add_argument("--online", action="store_true",
                        help="fresh-data-per-step training: every step "
                             "draws a new batch from the DR DGP (spurious "
                             "background included) and rasterizes it on "
                             "device inside the compiled scan "
                             "(train/online.py::dr_batch_fn). All models "
                             "(incl. InfoMax), scanned path (composes "
                             "with --dp: per-device DGP draws, one "
                             "gradient pmean per step); full labels, "
                             "label_normalization only")
    add_png_data_dir_arg(parser)
    add_resume_arg(parser)
    add_infra_args(parser)
    if debug:
        return parser.parse_args(args=[])
    return parser.parse_args(argv)


def main(argv=None):
    config = vars(get_args(argv=argv))
    if config["free_bits"] and config["model"] == "InfoMax":
        raise SystemExit("--free_bits targets the supervised VAE/CDGVAE "
                         "objective; the InfoMax path does not wire it")
    config["spurious"] = True  # family marker for checkpoint loaders (api.py)
    set_random_seed(config["seed"])
    logger = MetricLogger(logdir=config["assets_dir"],
                          use_wandb=config["wandb"], tags=["VAEBased", "DR"],
                          config=config)

    if config["online"]:
        # no dataset: --online draws every batch from the device DR DGP
        # (no label_normalization=False support — the online stream's
        # labels use the frozen normalization constants)
        if config["eager"] or \
                config.get("data_dir") or config["labeled_ratio"] < 1 or \
                not config["label_normalization"]:
            raise SystemExit("--online supports the scanned path on the "
                             "synthetic DR DGP with full labels and "
                             "label_normalization only")
        x_data = y_data = None
    else:
        dataset = PendulumDRDataset(
            data_dir=config.get("data_dir") or None,
            image_size=config["image_size"], train=True,
            labeled_ratio=config["labeled_ratio"],
            label_normalization=config["label_normalization"],
            seed=config["seed"], n=config["n_samples"])
        x_data = jax.device_put(dataset.x_data)
        y_data = jax.device_put(dataset.y_data)

    model, discriminator = build_pendulum_model(config, spurious=True)
    key = jax.random.key(config["seed"])
    k_model, k_disc, k_train = jax.random.split(key, 3)
    params = model.init(k_model)
    mesh = resolve_mesh(config)
    optimizer = optax.adam(config["lr"])

    if config["model"] == "InfoMax":
        d_params = discriminator.init(k_disc)
        optimizer_d = optax.adam(config["lr_D"])
        step = make_infomax_step(model, discriminator, optimizer,
                                 optimizer_d, config["beta"],
                                 config["lambda"], config["gamma"],
                                 mesh=mesh)
        state = (params, d_params, optimizer.init(params),
                 optimizer_d.init(d_params))
    else:
        step = make_train_step(model, optimizer, config["beta"],
                               config["lambda"], mesh=mesh,
                               free_bits=config["free_bits"])
        state = (params, optimizer.init(params))

    state, start_epoch = apply_resume(config, state)
    shuffle_rng = np.random.default_rng(config["seed"] + start_epoch)
    os.makedirs(config["assets_dir"], exist_ok=True)
    viz_fwd = jax.jit(lambda p, x, r: model(p, x, rng=r).xhat)
    if config["online"]:
        from ..train.online import dr_batch_fn
        _sample_builder = lambda bs: dr_batch_fn(  # noqa: E731
            bs, config["image_size"], norm_seed=config["seed"],
            norm_n=config["n_samples"])
        x_viz = jax.jit(_sample_builder(9))(
            jax.random.fold_in(k_train, 2**29))[0]
    else:
        x_viz = x_data[:9]

    def on_epoch(epoch, metrics):
        print(format_epoch(epoch, metrics))
        logger.log(metrics, step=epoch)

    # single source of truth for the viz cadence: the scanned/online
    # drivers gate on it via post_epoch_pred (so off-cadence epochs skip
    # the device pull entirely) and the eager loop gates explicitly
    viz_due = lambda e: e % 10 == 0  # noqa: E731

    def post_epoch(state, epoch):
        xhat = viz_fwd(state[0], x_viz,
                       jax.random.fold_in(k_train, 2**31))
        viz_recon_grid(np.asarray(xhat),
                       f"{config['assets_dir']}/tmp_image_{epoch}.png")

    if config["online"]:
        # fresh-data-per-step on the DR DGP (cli.main --online analog):
        # DGP draw + blue-background rasterization + train step in one
        # compiled scan, one dispatch per epoch-equivalent; under --dp
        # every device runs its own DGP with one gradient pmean per step
        from ..train.scanned import make_supervised_loss_fn
        from .common import run_online_training
        if config["model"] == "InfoMax":
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
                on_epoch=on_epoch, sample_batch_builder=_sample_builder,
                post_epoch=lambda s, e: post_epoch((s[0][0],), e),
                post_epoch_pred=viz_due)
            state = (pair[0][0], pair[0][1], pair[1][0], pair[1][1])
        else:
            state = run_online_training(
                config,
                loss_fn=make_supervised_loss_fn(
                    model, config["beta"], config["lambda"],
                    free_bits=config["free_bits"]),
                optimizer=optimizer, state=state, k_train=k_train,
                mesh=mesh, start_epoch=start_epoch, on_epoch=on_epoch,
                sample_batch_builder=_sample_builder,
                post_epoch=post_epoch,
                post_epoch_pred=viz_due)
    elif config["model"] != "InfoMax" and not config["eager"]:
        # scanned trainer; --dp swaps in the shard_map trainer (same
        # wiring as cli.main — DR uses the identical supervised loss)
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
            optimizer=optimizer, start_epoch=start_epoch,
            on_epoch=on_epoch, post_epoch=post_epoch,
            post_epoch_pred=viz_due)
    elif config["model"] == "InfoMax" and not config["eager"]:
        # InfoMax scanned (pair states), single-device or mesh — same
        # wiring as cli.main
        from ..train.steps import (pair_infomax_step, make_infomax_loss_fn,
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
            start_epoch=start_epoch, on_epoch=on_epoch,
            post_epoch=lambda s, e: post_epoch((s[0][0],), e),
            post_epoch_pred=viz_due, pair=True)
    else:
        for epoch in range(start_epoch, config["epochs"]):
            state, metrics = train_epoch(
                step, state, x_data, y_data, config["batch_size"], k_train,
                epoch, shuffle_rng, drop_remainder=mesh is not None)
            on_epoch(epoch, metrics)
            if viz_due(epoch):
                post_epoch(state, epoch)

    ckpt = os.path.join(config["assets_dir"],
                        f"model_DR_{config['model']}_{config['scm']}")
    save_checkpoint(ckpt, state[0], opt_state=state[1] if
                    config["model"] != "InfoMax" else state[2],
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

"""Semi-supervised DR training (reference DR/main_semi.py): ELBO on the
unlabeled DR stream + alignment on a labeled_ratio subset, with the spurious
background latent wired into every decoder block."""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import optax

from ..data.pendulum_dr import PendulumDRDataset
from ..factory import build_pendulum_model
from ..train.steps import make_semi_step
from ..train.loop import train_epoch_semi, format_epoch
from ..utils.simulation import set_random_seed
from ..utils.checkpoint import save_checkpoint
from ..utils.logging import MetricLogger
from .common import (arg_as_bool,
                     arg_as_list, add_infra_args, add_png_data_dir_arg,
                     resolve_mesh, add_resume_arg, apply_resume)


def get_args(debug: bool = False, argv=None):
    parser = argparse.ArgumentParser("parameters")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--model", type=str, default="CDGVAEsemi")
    parser.add_argument("--node", default=5, type=int)
    parser.add_argument("--scm", default="nonlinear", type=str)
    parser.add_argument("--flow_num", default=1, type=int)
    parser.add_argument("--inverse_loop", default=100, type=int)
    parser.add_argument("--factor", default=[1, 1, 2], type=arg_as_list)
    parser.add_argument("--labeled_ratio", default=0.1, type=float)
    parser.add_argument("--label_normalization", default=True, type=arg_as_bool)
    parser.add_argument("--adjacency_scaling", default=True, type=arg_as_bool)
    parser.add_argument("--image_size", default=64, type=int)
    parser.add_argument("--epochs", default=100, type=int)
    parser.add_argument("--batch_size", default=128, type=int)
    parser.add_argument("--batch_sizeL", default=32, type=int)
    parser.add_argument("--lr", default=0.001, type=float)
    parser.add_argument("--beta", default=0.1, type=float)
    # NOTE: the reference's DR semi default is 5 (DR/main_semi.py:107),
    # unlike supervised DR's 20 (DR/main.py:105) — kept faithfully
    parser.add_argument("--lambda", default=5, type=float)
    parser.add_argument("--online", action="store_true",
                        help="infinite unlabeled stream from the device-"
                             "side DR DGP (spurious background included) "
                             "inside the compiled scan; the labeled set "
                             "stays fixed. Composes with --dp (see "
                             "cli.main_semi --online)")
    add_png_data_dir_arg(parser)
    add_resume_arg(parser)
    add_infra_args(parser)
    if debug:
        return parser.parse_args(args=[])
    return parser.parse_args(argv)


def main(argv=None):
    config = vars(get_args(argv=argv))
    config["spurious"] = True  # family marker for checkpoint loaders (api.py)
    set_random_seed(config["seed"])
    logger = MetricLogger(logdir=config["assets_dir"],
                          use_wandb=config["wandb"],
                          tags=["VAEBased", "DR", "semi"], config=config)

    labeled = PendulumDRDataset(
        data_dir=config.get("data_dir") or None,
        image_size=config["image_size"], train=True,
        labeled_ratio=config["labeled_ratio"],
        label_normalization=config["label_normalization"],
        seed=config["seed"], n=config["n_samples"])
    x_l = jax.device_put(labeled.x_data)
    y_l = jax.device_put(labeled.y_data)
    if config["online"]:
        # the unlabeled stream is the device DR DGP — no unlabeled
        # dataset (its generated labels are DISCARDED: alignment reads
        # the labeled dataset's own y, so label_normalization is free)
        if config["eager"] or config.get("data_dir"):
            raise SystemExit("--online supports the scanned path on the "
                             "synthetic DGP only")
        x_u = None
    else:
        unlabeled = PendulumDRDataset(
            data_dir=config.get("data_dir") or None,
            image_size=config["image_size"], train=True,
            seed=config["seed"], n=config["n_samples"])
        x_u = jax.device_put(unlabeled.x_data)

    model, _ = build_pendulum_model(config, spurious=True)
    key = jax.random.key(config["seed"])
    k_model, k_train = jax.random.split(key)
    params = model.init(k_model)
    optimizer = optax.adam(config["lr"])
    state = (params, optimizer.init(params))
    state, start_epoch = apply_resume(config, state)

    os.makedirs(config["assets_dir"], exist_ok=True)

    def on_epoch(epoch, metrics):
        print(format_epoch(epoch, metrics))
        logger.log(metrics, step=epoch)

    mesh = resolve_mesh(config, extra_batch_sizes=(config["batch_sizeL"],))
    if config["online"]:
        # infinite unlabeled DR stream (spurious background included):
        # fresh device DGP draw per step; fixed labeled set subsampled on
        # device (train/online.py)
        from ..train.online import dr_batch_fn
        from ..train.steps import make_semi_loss_fn
        from .common import run_online_training
        state = run_online_training(
            config,
            loss_fn=make_semi_loss_fn(model, config["beta"],
                                      config["lambda"]),
            optimizer=optimizer, state=state, k_train=k_train, mesh=mesh,
            start_epoch=start_epoch, on_epoch=on_epoch,
            sample_batch_builder=lambda bs: dr_batch_fn(
                bs, config["image_size"], norm_seed=config["seed"],
                norm_n=config["n_samples"]),
            labeled=(x_l, y_l))
    elif config["eager"]:
        step = make_semi_step(model, optimizer, config["beta"],
                              config["lambda"], mesh=mesh)
        shuffle_rng = np.random.default_rng(config["seed"] + start_epoch)
        for epoch in range(start_epoch, config["epochs"]):
            state, metrics = train_epoch_semi(
                step, state, x_u, x_l, y_l, config["batch_size"],
                config["batch_sizeL"], k_train, epoch, shuffle_rng,
                drop_remainder=mesh is not None)
            on_epoch(epoch, metrics)
    else:
        # scanned two-stream trainer; --dp shards both streams over dp
        # with per-shard labeled cycling, one gradient pmean per step
        from ..train.steps import make_semi_loss_fn
        from .common import run_scanned_training_semi
        raw = make_semi_step(model, optimizer, config["beta"],
                             config["lambda"], jit=False)
        state = run_scanned_training_semi(
            config, raw_step=raw, state=state, data=[x_u, x_l, y_l],
            k_train=k_train, mesh=mesh,
            make_loss=lambda: make_semi_loss_fn(
                model, config["beta"], config["lambda"]),
            optimizer=optimizer, chunk=10, start_epoch=start_epoch,
            on_epoch=on_epoch)

    ckpt = os.path.join(config["assets_dir"],
                        f"model_DR_{config['model']}_{config['scm']}")
    save_checkpoint(ckpt, state[0], opt_state=state[1],
                    step=config["epochs"], config=config)
    print(f"checkpoint saved to {ckpt}")
    from .common import publish_model_artifact
    publish_model_artifact(logger, ckpt, config, model,
                           entry_file=__file__)
    logger.finish()
    return state


if __name__ == "__main__":
    main()

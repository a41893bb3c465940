"""Semi-supervised pendulum training (reference main_semi.py).

ELBO on the unlabeled stream + alignment on a small labeled stream
(labeled_ratio of the train set, batch_sizeL=32)."""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import optax

from ..data.pendulum import PendulumDataset
from ..factory import build_pendulum_model
from ..train.steps import make_semi_step
from ..train.loop import train_epoch_semi, format_epoch
from ..utils.simulation import set_random_seed
from ..utils.checkpoint import save_checkpoint
from ..utils.logging import MetricLogger
from ..utils.viz import viz_recon_grid
from .common import (arg_as_bool,
                     arg_as_list, add_infra_args, add_png_data_dir_arg,
                     resolve_mesh, add_resume_arg, apply_resume)


def get_args(debug: bool = False, argv=None):
    parser = argparse.ArgumentParser("parameters")
    # parity with reference main_semi.py:95-108
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--model", type=str, default="CDGVAEsemi")
    parser.add_argument("--node", default=4, type=int)
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
    parser.add_argument("--batch_sizeL", default=32, type=int,
                        help="batch size for the labeled stream")
    parser.add_argument("--lr", default=0.001, type=float)
    parser.add_argument("--beta", default=0.1, type=float)
    parser.add_argument("--lambda", default=5, type=float)
    parser.add_argument("--online", action="store_true",
                        help="infinite unlabeled stream: every step draws "
                             "a FRESH unlabeled batch from the device-side "
                             "DGP+rasterizer inside the compiled scan, "
                             "while the small labeled set stays fixed "
                             "(subsampled on device per step) — the "
                             "semi-supervised premise (labels expensive, "
                             "unlabeled data cheap) realized exactly. "
                             "Composes with --dp (per-device draws + "
                             "labeled shards, one gradient pmean per step)")
    add_png_data_dir_arg(parser)
    add_resume_arg(parser)
    add_infra_args(parser)
    if debug:
        return parser.parse_args(args=[])
    return parser.parse_args(argv)


def main(argv=None):
    config = vars(get_args(argv=argv))
    config["spurious"] = False  # family marker for checkpoint loaders (api.py)
    set_random_seed(config["seed"])
    logger = MetricLogger(logdir=config["assets_dir"],
                          use_wandb=config["wandb"],
                          tags=["VAEBased", "semi"], config=config)

    labeled = PendulumDataset(
        data_dir=config.get("data_dir") or None,
        image_size=config["image_size"], train=True,
        labeled_ratio=config["labeled_ratio"],
        label_normalization=config["label_normalization"],
        seed=config["seed"], n=config["n_samples"])
    x_l = jax.device_put(labeled.x_data)
    y_l = jax.device_put(labeled.y_data)
    if config["online"]:
        # the unlabeled stream is the device DGP — no unlabeled dataset
        if config["eager"] or config.get("data_dir"):
            raise SystemExit("--online supports the scanned path on the "
                             "synthetic DGP only")
        x_u = None
    else:
        unlabeled = PendulumDataset(
            data_dir=config.get("data_dir") or None,
            image_size=config["image_size"], train=True,
            seed=config["seed"], n=config["n_samples"])
        x_u = jax.device_put(unlabeled.x_data)

    model, _ = build_pendulum_model(config)
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
        # infinite unlabeled stream: fresh DGP draw per step inside the
        # scan; fixed labeled set subsampled on device (train/online.py)
        from ..train.online import pendulum_batch_fn
        from ..train.steps import make_semi_loss_fn
        from .common import run_online_training
        _sample_builder = lambda bs: pendulum_batch_fn(  # noqa: E731
            bs, config["image_size"], norm_seed=config["seed"],
            norm_n=config["n_samples"])
        state = run_online_training(
            config,
            loss_fn=make_semi_loss_fn(model, config["beta"],
                                      config["lambda"]),
            optimizer=optimizer, state=state, k_train=k_train, mesh=mesh,
            start_epoch=start_epoch, on_epoch=on_epoch,
            sample_batch_builder=_sample_builder, labeled=(x_l, y_l))
    elif config["eager"]:
        # the reference's exact per-batch protocol (partial batches
        # dropped only when a mesh requires fixed per-device shapes)
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

    viz = jax.jit(lambda p, x, r: model(p, x, rng=r).xhat)
    # under --online there is no unlabeled dataset — viz a fresh draw
    x_viz = x_u[:9] if x_u is not None else jax.jit(_sample_builder(9))(
        jax.random.fold_in(k_train, 2**29))[0]
    xhat = viz(state[0], x_viz, jax.random.fold_in(k_train, 2**31))
    viz_recon_grid(np.asarray(xhat), f"{config['assets_dir']}/recon.png")

    ckpt = os.path.join(config["assets_dir"],
                        f"model_{config['model']}_{config['scm']}")
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

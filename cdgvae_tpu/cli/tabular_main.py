"""Tabular training entry point (reference tabular/main.py):
VAE / InfoMax / CDG-VAE on loan / adult / covtype."""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import optax

from ..data.tabular.datasets import load_tabular, DATASET_SPECS
from ..factory import build_tabular_model
from ..train.tabular_steps import (make_tabular_step,
                                   make_tabular_infomax_step, make_recon_fn)
from ..train.loop import train_epoch, format_epoch
from ..utils.simulation import set_random_seed
from ..utils.checkpoint import save_checkpoint
from ..utils.logging import MetricLogger
from .common import (arg_as_bool,
                     add_infra_args, resolve_mesh, arg_as_list,
                     add_resume_arg, apply_resume)


def get_args(debug: bool = False, argv=None):
    parser = argparse.ArgumentParser("parameters")
    # parity with reference tabular/main.py:60-101
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--model", type=str, default="CDGVAE",
                        help="VAE, InfoMax, CDGVAE")
    parser.add_argument("--dataset", type=str, default="loan",
                        help="loan, adult, covtype")
    # declared-but-overridden flags, exactly like the reference
    # (tabular/main.py:67-84 declares them, then :139-159 overwrites per
    # dataset) — accepted for CLI parity, values replaced by DATASET_SPECS
    parser.add_argument("--node", default=3, type=int,
                        help="overridden per dataset (reference parity)")
    parser.add_argument("--factor", default=[1, 1, 1], type=arg_as_list,
                        help="overridden per dataset (reference parity)")
    parser.add_argument("--input_dim", default=5, type=int,
                        help="overridden per dataset (reference parity)")
    parser.add_argument("--scm", default="linear", type=str)
    parser.add_argument("--flow_num", default=1, type=int)
    parser.add_argument("--inverse_loop", default=100, type=int)
    parser.add_argument("--adjacency_scaling", default=True, type=arg_as_bool)
    parser.add_argument("--epochs", default=200, type=int)
    parser.add_argument("--batch_size", default=256, type=int)
    parser.add_argument("--lr", default=0.01, type=float)
    parser.add_argument("--lr_D", default=0.001, type=float)
    parser.add_argument("--beta", default=0.01, type=float)
    parser.add_argument("--lambda", default=10, type=float)
    parser.add_argument("--gamma", default=1, type=float)
    parser.add_argument("--data_dir", default="./data", type=str,
                        help="directory with the real CSVs; synthetic "
                             "schema-compatible data is generated if absent")
    add_resume_arg(parser)
    add_infra_args(parser)
    if debug:
        return parser.parse_args(args=[])
    return parser.parse_args(argv)


def main(argv=None):
    config = vars(get_args(argv=argv))
    set_random_seed(config["seed"])
    spec = DATASET_SPECS[config["dataset"]]
    config["node"] = spec["node"]
    config["factor"] = list(spec["factor"])
    config["input_dim"] = spec["input_dim"]
    logger = MetricLogger(logdir=config["assets_dir"],
                          use_wandb=config["wandb"], tags=["Tabular"],
                          config=config)

    data = load_tabular(config["dataset"], train=True,
                        data_dir=config["data_dir"])
    x_data = jax.device_put(data.x_data)
    y_data = jax.device_put(data.label)

    model, discriminator = build_tabular_model(config)
    key = jax.random.key(config["seed"])
    k_model, k_disc, k_train = jax.random.split(key, 3)
    params = model.init(k_model)
    mesh = resolve_mesh(config)
    optimizer = optax.adam(config["lr"])
    recon_fn = make_recon_fn(config["dataset"], data.flatten_topology)

    if config["model"] == "InfoMax":
        d_params = discriminator.init(k_disc)
        optimizer_d = optax.adam(config["lr_D"])
        step = make_tabular_infomax_step(
            model, discriminator, optimizer, optimizer_d, config["beta"],
            config["lambda"], config["gamma"], recon_fn, mesh=mesh)
        state = (params, d_params, optimizer.init(params),
                 optimizer_d.init(d_params))
    else:
        step = make_tabular_step(model, optimizer, config["beta"],
                                 config["lambda"], recon_fn, mesh=mesh)
        state = (params, optimizer.init(params))

    state, start_epoch = apply_resume(config, state)
    shuffle_rng = np.random.default_rng(config["seed"] + start_epoch)
    os.makedirs(config["assets_dir"], exist_ok=True)

    def on_epoch(epoch, metrics):
        print(format_epoch(epoch, metrics))
        logger.log(metrics, step=epoch)

    if config["model"] != "InfoMax" and not config["eager"]:
        # scanned trainer; --dp swaps in the shard_map trainer with the
        # tabular dataset-specific loss
        from ..train.tabular_steps import make_tabular_loss_fn
        from .common import run_scanned_training
        raw = make_tabular_step(model, optimizer, config["beta"],
                                config["lambda"], recon_fn, jit=False)
        state = run_scanned_training(
            config, raw_step=raw, state=state, data=[x_data, y_data],
            k_train=k_train, mesh=mesh,
            make_loss=lambda: make_tabular_loss_fn(
                model, config["beta"], config["lambda"], recon_fn),
            optimizer=optimizer, chunk=25, start_epoch=start_epoch,
            on_epoch=on_epoch)
    elif config["model"] == "InfoMax" and not config["eager"]:
        # InfoMax scanned (pair states), single-device or mesh
        from ..train.steps import pair_infomax_step, pair_infomax_optimizer
        from ..train.tabular_steps import make_tabular_infomax_loss_fn
        from .common import run_scanned_training
        raw = pair_infomax_step(make_tabular_infomax_step(
            model, discriminator, optimizer, optimizer_d, config["beta"],
            config["lambda"], config["gamma"], recon_fn, jit=False))
        state = run_scanned_training(
            config, raw_step=raw, state=state, data=[x_data, y_data],
            k_train=k_train, mesh=mesh,
            make_loss=lambda: make_tabular_infomax_loss_fn(
                model, discriminator, config["beta"], config["lambda"],
                config["gamma"], recon_fn, marginal="roll"),
            optimizer=pair_infomax_optimizer(optimizer, optimizer_d),
            chunk=25, start_epoch=start_epoch, on_epoch=on_epoch,
            pair=True)
    else:
        for epoch in range(start_epoch, config["epochs"]):
            state, metrics = train_epoch(
                step, state, x_data, y_data, config["batch_size"], k_train,
                epoch, shuffle_rng, drop_remainder=mesh is not None)
            on_epoch(epoch, metrics)

    ckpt = os.path.join(
        config["assets_dir"],
        f"tabular_{config['model']}_{config['dataset']}")
    save_checkpoint(ckpt, state[0],
                    opt_state=state[1] if config["model"] != "InfoMax"
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

"""CDG-TVAE training entry point (reference tabular/main_tvae.py):
CTGAN-style tabular VAE over DataTransformer encodings."""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np
import jax
import optax

from ..data.tabular.datasets import load_tabular_tvae, DATASET_SPECS
from ..factory import build_tabular_model, tvae_block_mask
from ..train.tabular_steps import make_tvae_step
from ..train.loop import train_epoch, format_epoch
from ..utils.simulation import set_random_seed
from ..utils.checkpoint import save_checkpoint, atomic_write
from ..utils.logging import MetricLogger
from .common import (arg_as_bool,
                     arg_as_list, add_infra_args, resolve_mesh,
                     add_resume_arg, apply_resume)

# per-dataset transformer random_state (reference tabular/main_tvae.py:121-127)
TRANSFORMER_RANDOM_STATE = {"loan": 8, "adult": 0, "covtype": 0}


def get_args(debug: bool = False, argv=None):
    parser = argparse.ArgumentParser("parameters")
    # parity with reference tabular/main_tvae.py:58-102
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--model", type=str, default="TVAE")
    parser.add_argument("--dataset", type=str, default="loan",
                        help="loan, adult, covtype")
    # declared-but-overridden flags (reference tabular/main_tvae.py:65-80)
    parser.add_argument("--node", default=3, type=int,
                        help="overridden per dataset (reference parity)")
    parser.add_argument("--factor", default=[1, 1, 1], type=arg_as_list,
                        help="overridden per dataset (reference parity)")
    parser.add_argument("--scm", default="linear", type=str)
    parser.add_argument("--flow_num", default=1, type=int)
    parser.add_argument("--inverse_loop", default=100, type=int)
    parser.add_argument("--adjacency_scaling", default=True, type=arg_as_bool)
    parser.add_argument("--epochs", default=300, type=int)
    parser.add_argument("--batch_size", default=256, type=int)
    parser.add_argument("--lr", default=0.001, type=float)
    parser.add_argument("--weight_decay", default=1e-5, type=float)
    parser.add_argument("--lambda", default=5, type=float)
    parser.add_argument("--sigma_range", default=[0.01, 0.1],
                        type=arg_as_list)
    parser.add_argument("--data_dir", default="./data", type=str)
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

    data = load_tabular_tvae(
        config["dataset"], data_dir=config["data_dir"],
        random_state=TRANSFORMER_RANDOM_STATE[config["dataset"]])
    config["input_dim"] = data.transformer.output_dimensions
    config["tvae_mask"] = tvae_block_mask(
        config["dataset"], data.transformer.output_info_list)

    logger = MetricLogger(logdir=config["assets_dir"],
                          use_wandb=config["wandb"], tags=["Tabular", "TVAE"],
                          config=config)
    x_data = jax.device_put(data.x_data)
    y_data = jax.device_put(data.label)

    model, _ = build_tabular_model(config)
    key = jax.random.key(config["seed"])
    k_model, k_train = jax.random.split(key)
    params = model.init(k_model)
    mesh = resolve_mesh(config)
    # torch Adam(weight_decay=...) adds wd·param to the gradient BEFORE the
    # Adam moments (L2, not decoupled AdamW) — replicate that ordering
    optimizer = optax.chain(
        optax.add_decayed_weights(config["weight_decay"]),
        optax.scale_by_adam(),
        optax.scale(-config["lr"]),
    )
    step = make_tvae_step(model, optimizer, config["lambda"],
                          data.transformer.output_info_list,
                          sigma_range=tuple(config["sigma_range"]),
                          mesh=mesh)
    state = (params, optimizer.init(params))

    state, start_epoch = apply_resume(config, state)
    shuffle_rng = np.random.default_rng(config["seed"] + start_epoch)
    os.makedirs(config["assets_dir"], exist_ok=True)

    def on_epoch(epoch, metrics):
        print(format_epoch(epoch, metrics))
        logger.log(metrics, step=epoch)

    if not config["eager"]:
        # scanned trainer; --dp swaps in the shard_map trainer with the
        # span-walking TVAE loss and the post-update sigma clamp
        from ..train.tabular_steps import (make_tvae_loss_fn,
                                           make_sigma_clamp)
        from .common import run_scanned_training
        raw = make_tvae_step(model, optimizer, config["lambda"],
                             data.transformer.output_info_list,
                             sigma_range=tuple(config["sigma_range"]),
                             jit=False)
        state = run_scanned_training(
            config, raw_step=raw, state=state, data=[x_data, y_data],
            k_train=k_train, mesh=mesh,
            make_loss=lambda: make_tvae_loss_fn(
                model, config["lambda"],
                data.transformer.output_info_list),
            optimizer=optimizer, chunk=25, start_epoch=start_epoch,
            on_epoch=on_epoch,
            post_update=make_sigma_clamp(tuple(config["sigma_range"])))
    else:
        for epoch in range(start_epoch, config["epochs"]):
            state, metrics = train_epoch(
                step, state, x_data, y_data, config["batch_size"], k_train,
                epoch, shuffle_rng, drop_remainder=mesh is not None)
            on_epoch(epoch, metrics)

    ckpt = os.path.join(
        config["assets_dir"],
        f"tabular_{config['model']}_{config['dataset']}")
    save_checkpoint(ckpt, state[0], opt_state=state[1],
                    step=config["epochs"], config=config)
    # the fitted transformer must travel with the checkpoint: inverse
    # transforms (synthetic sampling) depend on it (inference_tvae.py:250-310)
    atomic_write(os.path.join(ckpt, "transformer.pkl"), "wb",
                  lambda f: pickle.dump(data.transformer, f))
    print(f"checkpoint saved to {ckpt}")
    from .common import publish_model_artifact
    publish_model_artifact(logger, ckpt, config, model,
                           entry_file=__file__)
    logger.finish()
    return state


if __name__ == "__main__":
    main()

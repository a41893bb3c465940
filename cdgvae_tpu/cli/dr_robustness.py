"""Distributional-robustness evaluation (reference DR/robustness.py):
train the downstream classifier on the first 4 latent means (spurious dim
dropped), report average and worst-group accuracy on the shifted test set."""
from __future__ import annotations

import argparse
import os

import jax

from ..data.pendulum_dr import PendulumDRDataset
from ..factory import build_pendulum_model
from ..eval.downstream import robustness
from ..utils.checkpoint import load_checkpoint
from ..utils.simulation import set_random_seed
from .common import add_platform_arg


def get_args(argv=None):
    parser = argparse.ArgumentParser("parameters")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--num", type=int, default=0)
    parser.add_argument("--repeats", type=int, default=10)
    parser.add_argument("--epochs", type=int, default=500)
    parser.add_argument("--keep_spurious", action="store_true",
                        help="keep the 5th (spurious) latent in the "
                             "downstream representation")
    parser.add_argument("--assets_dir", default="./assets/robustness",
                        type=str)
    add_platform_arg(parser)
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    ckpt = load_checkpoint(args.checkpoint)
    config = ckpt["config"]
    set_random_seed(config["seed"])

    model, _ = build_pendulum_model(config, spurious=True)
    params = ckpt["params"]

    train_ds = PendulumDRDataset(data_dir=config.get("data_dir") or None,
        image_size=config["image_size"],
                                 train=True, downstream=True,
                                 seed=config["seed"],
                                 n=config.get("n_samples", 10000))
    test_ds = PendulumDRDataset(data_dir=config.get("data_dir") or None,
        image_size=config["image_size"],
                                train=False, downstream=True,
                                seed=config["seed"],
                                n=config.get("n_samples", 10000))

    result = robustness(
        model, params,
        jax.device_put(train_ds.x_data), train_ds.y_data,
        jax.device_put(test_ds.x_data), test_ds.y_data,
        seed=config["seed"], repeats=args.repeats, epochs=args.epochs,
        drop_last_latent=not args.keep_spurious)

    os.makedirs(args.assets_dir, exist_ok=True)
    tag = f"{config['model']}_{config['scm']}_{args.num}"
    with open(f"{args.assets_dir}/{tag}.txt", "w") as f:
        f.write("average accuracy: {:.4f}\n".format(
            result["avg_accuracy"]))
        f.write("worst-group accuracy: {:.4f}\n".format(
            result["worst_group_accuracy"]))
    print(result)
    return result


if __name__ == "__main__":
    main()

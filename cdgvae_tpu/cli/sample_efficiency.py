"""Downstream sample-efficiency entry point (reference sample_efficiency.py):
acc(100 training labels) / acc(all labels), 10 repeats."""
from __future__ import annotations

import argparse
import os

import jax

from ..data.pendulum import PendulumDataset
from ..factory import build_pendulum_model
from ..eval.downstream import sample_efficiency
from ..utils.checkpoint import load_checkpoint
from ..utils.simulation import set_random_seed
from .common import add_platform_arg


def get_args(argv=None):
    parser = argparse.ArgumentParser("parameters")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--num", type=int, default=0)
    parser.add_argument("--repeats", type=int, default=10)
    parser.add_argument("--assets_dir", default="./assets/sample_efficiency",
                        type=str)
    add_platform_arg(parser)
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    ckpt = load_checkpoint(args.checkpoint)
    config = ckpt["config"]
    set_random_seed(config["seed"])

    model, _ = build_pendulum_model(config)
    params = ckpt["params"]

    # downstream=True keeps raw (un-normalized) labels for the target logit
    train_ds = PendulumDataset(data_dir=config.get("data_dir") or None,
        image_size=config["image_size"], train=True,
                               downstream=True, seed=config["seed"],
                               n=config.get("n_samples", 10000))
    test_ds = PendulumDataset(data_dir=config.get("data_dir") or None,
        image_size=config["image_size"], train=False,
                              downstream=True, seed=config["seed"],
                              n=config.get("n_samples", 10000))

    result = sample_efficiency(
        model, params,
        jax.device_put(train_ds.x_data), train_ds.y_data,
        jax.device_put(test_ds.x_data), test_ds.y_data,
        seed=config["seed"], repeats=args.repeats)

    os.makedirs(args.assets_dir, exist_ok=True)
    tag = f"{config['model']}_{config['scm']}_{args.num}"
    with open(f"{args.assets_dir}/{tag}.txt", "w") as f:
        f.write("100 samples accuracy: {:.4f}\n".format(
            result["accuracy_100"]))
        f.write("all samples accuracy: {:.4f}\n".format(
            result["accuracy_all"]))
        f.write("sample efficiency: {:.4f}\n".format(
            result["sample_efficiency"]))
    print(result)
    return result


if __name__ == "__main__":
    main()

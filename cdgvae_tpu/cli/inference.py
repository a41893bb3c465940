"""Counterfactual inference entry point (reference inference.py).

Loads a checkpoint (config embedded), rebuilds the model, and produces the
reference's full diagnostic set: latent-range bars, posterior-variance bars,
per-node alignment cross-entropy, recon side-by-side, per-block GAM images,
and the node×7 do-intervention grid.
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax

from ..data.pendulum import PendulumDataset
from ..factory import build_pendulum_model
from ..eval.inference import (encode_dataset, latent_ranges, do_grid,
                              alignment_cross_entropy)
from ..utils.checkpoint import load_checkpoint
from ..utils.simulation import set_random_seed
from ..utils.viz import viz_do_grid, viz_bars, viz_pair, viz_gam_blocks
from .common import add_platform_arg


def get_args(argv=None):
    parser = argparse.ArgumentParser("parameters")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="checkpoint directory written by cli.main")
    parser.add_argument("--assets_dir", default="./assets/inference",
                        type=str)
    add_platform_arg(parser)
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    ckpt = load_checkpoint(args.checkpoint)
    config = ckpt["config"]
    set_random_seed(config["seed"])

    # honor the family marker so DR checkpoints rebuild with the spurious
    # block wiring (older checkpoints: fall back to the node==5 heuristic)
    model, _ = build_pendulum_model(
        config, spurious=bool(config.get("spurious",
                                         config.get("node", 4) == 5)))
    params = ckpt["params"]

    dataset = PendulumDataset(
        data_dir=config.get("data_dir") or None,
        image_size=config["image_size"], train=True, seed=config["seed"],
        label_normalization=config.get("label_normalization", True),
        n=config.get("n_samples", 10000))
    x_data = jax.device_put(dataset.x_data)

    os.makedirs(args.assets_dir, exist_ok=True)
    encoded = encode_dataset(model, params, x_data)
    omin, omax, lmin, lmax = latent_ranges(encoded)

    viz_bars(np.abs(omax - omin), dataset.name[: model.node],
             "latent (intervened)",
             f"{args.assets_dir}/latent_maxmin_orig.png")
    viz_bars(np.abs(lmax - lmin), dataset.name[: model.node],
             "transformed latent",
             f"{args.assets_dir}/latent_maxmin.png")
    viz_bars(np.exp(encoded["logvar"]).mean(axis=0),
             dataset.name[: model.node], "posterior variance",
             f"{args.assets_dir}/posterior_variance.png", ylim=(0, 1))
    ce = alignment_cross_entropy(encoded, dataset.y_data)
    viz_bars(ce, dataset.name[: model.node], "latent",
             f"{args.assets_dir}/crossentropy.png")

    # recon side-by-side (8th sample like the reference, inference.py:252-255)
    x_sample = x_data[7:8]
    out = model(params, x_sample, deterministic=True)
    viz_pair(np.asarray(x_sample[0]), np.asarray(out.xhat[0]),
             f"{args.assets_dir}/original_and_recon.png")

    if out.xhat_separated is not None:
        viz_gam_blocks(np.asarray(out.xhat_separated).reshape(
            model.K, config["image_size"], config["image_size"], 3),
            f"{args.assets_dir}/gam.png")

    grid = do_grid(model, params, x_sample, lmin, lmax)
    viz_do_grid(grid, f"{args.assets_dir}/do.png",
                row_names=dataset.name[: model.node])
    print(f"wrote diagnostics to {args.assets_dir}")
    return grid


if __name__ == "__main__":
    main()

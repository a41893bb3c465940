"""CDM metric entry point (reference metric.py).

Loads a trained VAE/CDG-VAE checkpoint and the pretrained CDM factor
classifier, computes the node×node CDM lower/upper matrices, and writes
CSVs + heatmaps exactly like the reference (metric.py:265-283).
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax

from ..data.pendulum import PendulumDataset
from ..factory import build_pendulum_model
from ..models.classifier import FactorClassifier
from ..eval.metric import cdm_matrices
from ..utils.checkpoint import load_checkpoint
from ..utils.simulation import set_random_seed
from ..utils.viz import viz_heatmap
from .common import add_platform_arg
from .main_classifier import classifier_masks


def get_args(argv=None):
    parser = argparse.ArgumentParser("parameters")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="trained model checkpoint directory")
    parser.add_argument("--classifier_checkpoint", type=str, required=True,
                        help="CDMClassifier checkpoint directory")
    parser.add_argument("--num", type=int, default=0,
                        help="repeat id used in output filenames")
    parser.add_argument("--assets_dir", default="./assets/CDM", type=str)
    add_platform_arg(parser)
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    ckpt = load_checkpoint(args.checkpoint)
    config = ckpt["config"]
    set_random_seed(config["seed"])

    model, _ = build_pendulum_model(config)
    params = ckpt["params"]

    clf_ckpt = load_checkpoint(args.classifier_checkpoint)
    # rebuild the classifier from ITS OWN checkpoint config — the two CLIs
    # expose image_size/node independently, so the model's config may
    # legitimately differ (shapes would mismatch or masks silently shift)
    clf_cfg = clf_ckpt["config"] or config
    if (clf_cfg["image_size"], clf_cfg["node"]) != (
            config["image_size"], config["node"]):
        raise ValueError(
            f"classifier was trained at image_size={clf_cfg['image_size']}"
            f"/node={clf_cfg['node']} but the model uses "
            f"{config['image_size']}/{config['node']} — retrain the CDM "
            "classifier at the model's geometry")
    masks = classifier_masks(clf_cfg["image_size"], clf_cfg["node"])
    classifier = FactorClassifier(masks, clf_cfg["node"],
                                  clf_cfg["image_size"])
    clf_params = clf_ckpt["params"]

    dataset = PendulumDataset(data_dir=config.get("data_dir") or None,
        image_size=config["image_size"], train=True,
                              seed=config["seed"],
                              n=config.get("n_samples", 10000))
    x_data = jax.device_put(dataset.x_data)

    lower, upper = cdm_matrices(model, params, classifier, clf_params,
                                x_data)

    os.makedirs(args.assets_dir, exist_ok=True)
    names = dataset.name[: config["node"]]
    import pandas as pd
    tag = f"{config['model']}_{config['scm']}_{args.num}"
    pd.DataFrame(lower.round(3), columns=names, index=names).to_csv(
        f"{args.assets_dir}/lower_{tag}.csv")
    pd.DataFrame(upper.round(3), columns=names, index=names).to_csv(
        f"{args.assets_dir}/upper_{tag}.csv")
    viz_heatmap(np.flipud(lower), f"{args.assets_dir}/lower_{tag}.png")
    viz_heatmap(np.flipud(upper), f"{args.assets_dir}/upper_{tag}.png")
    print("CDM(lower):\n", lower.round(3))
    print("CDM(upper):\n", upper.round(3))
    return lower, upper


if __name__ == "__main__":
    main()

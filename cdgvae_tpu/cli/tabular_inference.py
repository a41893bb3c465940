"""Tabular synthetic-data evaluation entry point (reference
tabular/inference.py): PC CPDAGs on real / reconstructed / synthetic data,
SHD, and ML efficacy."""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax

from ..data.tabular.datasets import load_tabular, DATASET_SPECS
from ..factory import build_tabular_model
from ..eval.tabular_inference import (reconstruct_dataset, sample_synthetic,
                                      to_frame, real_cpdag)
from ..eval.ml_efficacy import regression_eval, classification_eval
from ..utils.pc import pc, cpdag_shd
from ..utils.checkpoint import load_checkpoint
from ..utils.simulation import set_random_seed
from .common import add_platform_arg


def get_args(argv=None):
    parser = argparse.ArgumentParser("parameters")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--data_dir", default="./data", type=str)
    parser.add_argument("--assets_dir", default="./assets/tabular", type=str)
    add_platform_arg(parser)
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    ckpt = load_checkpoint(args.checkpoint)
    config = ckpt["config"]
    set_random_seed(config["seed"])
    dataset_name = config["dataset"]
    spec = DATASET_SPECS[dataset_name]

    model, _ = build_tabular_model(config)
    params = ckpt["params"]

    train = load_tabular(dataset_name, train=True, data_dir=args.data_dir)
    test = load_tabular(dataset_name, train=False, data_dir=args.data_dir)
    x_data = jax.device_put(train.x_data)

    os.makedirs(args.assets_dir, exist_ok=True)
    results = {}

    # PC on real train data (inference.py:184-190) with the reference's
    # indep-test choice (shared helper: chisq loan/adult, fisherz covtype)
    G_real = real_cpdag(train.frame, dataset_name)

    # reconstructions
    recon = reconstruct_dataset(model, params, x_data, dataset_name,
                                seed=config["seed"])
    recon_df = to_frame(recon, train.topology, train.continuous)
    # fisherz (the default) for recon/sample CPDAGs even where the real
    # data used chisq — faithful to the reference, which hard-codes
    # fisherz for the model outputs (inference.py:250-252, :277-279;
    # the decoder emits continuous values)
    G_recon, _ = pc(recon_df.to_numpy(), alpha=0.05)
    results["SHD (Train)"] = cpdag_shd(G_real, G_recon)
    print(f"SHD (Train): {results['SHD (Train)']}")

    # synthetic samples
    sample = sample_synthetic(model, params, len(train.x_data),
                              dataset_name, seed=config["seed"])
    sample_df = to_frame(sample, train.topology, train.continuous)
    G_sample, _ = pc(sample_df.to_numpy(), alpha=0.05)
    results["SHD (Sample)"] = cpdag_shd(G_real, G_sample)
    print(f"SHD (Sample): {results['SHD (Sample)']}")

    # ML efficacy (inference.py:297-338)
    target = spec["target"]
    if spec["task"] == "regression":
        base = regression_eval(train.frame, test.frame, target)
        synth = regression_eval(sample_df, test.frame, target)
        results["R^2 (Baseline)"] = float(np.mean([x[1] for x in base]))
        results["R^2 (Synthetic)"] = float(np.mean([x[1] for x in synth]))
    else:
        base = classification_eval(train.frame, test.frame, target)
        synth = classification_eval(sample_df, test.frame, target)
        results["F1 (Baseline)"] = float(np.mean([x[1] for x in base]))
        results["F1 (Synthetic)"] = float(np.mean([x[1] for x in synth]))

    with open(os.path.join(
            args.assets_dir,
            f"inference_{config['model']}_{dataset_name}.txt"), "w") as f:
        for k, v in results.items():
            f.write(f"{k}: {v}\n")
    print(results)
    return results


if __name__ == "__main__":
    main()

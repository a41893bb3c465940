"""CDG-TVAE synthetic-data evaluation entry point (reference
tabular/inference_tvae.py): synthetic sampling through the DataTransformer
inverse with learned sigmas, PC/SHD, ML efficacy."""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

from ..data.tabular.datasets import load_tabular, DATASET_SPECS
from ..factory import build_tabular_model
from ..eval.tabular_inference import (sample_synthetic_tvae, real_cpdag,
                                      zscore_synthetic, efficacy)
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

    with open(os.path.join(args.checkpoint, "transformer.pkl"), "rb") as f:
        transformer = pickle.load(f)

    model, _ = build_tabular_model(config)
    params = ckpt["params"]

    train = load_tabular(dataset_name, train=True, data_dir=args.data_dir)
    test = load_tabular(dataset_name, train=False, data_dir=args.data_dir)

    os.makedirs(args.assets_dir, exist_ok=True)
    results = {}

    # real-data CPDAG with the reference's indep-test choice; recon/sample
    # CPDAGs below stay fisherz like the reference (inference_tvae.py:268,
    # :321 — the decoder emits continuous values). Shared protocol helpers
    # (eval.tabular_inference) keep this in sync with the non-TVAE CLI and
    # the multi-seed study scripts.
    G_real = real_cpdag(train.frame, dataset_name)

    raw = sample_synthetic_tvae(model, params, transformer,
                                len(train.x_data), seed=config["seed"])
    sample_df = zscore_synthetic(raw, train, spec, dataset_name)

    G_sample, _ = pc(sample_df.to_numpy(), alpha=0.05)
    results["SHD (Sample)"] = cpdag_shd(G_real, G_sample)
    print(f"SHD (Sample): {results['SHD (Sample)']}")

    key = ("R^2" if spec["task"] == "regression" else "F1") + " (Synthetic)"
    results[key] = efficacy(sample_df, test.frame, spec)

    with open(os.path.join(args.assets_dir,
                           f"inference_TVAE_{dataset_name}.txt"), "w") as f:
        for k, v in results.items():
            f.write(f"{k}: {v}\n")
    print(results)
    return results


if __name__ == "__main__":
    main()

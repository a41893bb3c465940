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
from ..eval.tabular_inference import sample_synthetic_tvae
from ..eval.ml_efficacy import regression_eval, classification_eval
from ..utils.pc import pc, cpdag_shd
from ..utils.checkpoint import load_checkpoint
from ..utils.simulation import set_random_seed


def get_args(argv=None):
    parser = argparse.ArgumentParser("parameters")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--data_dir", default="./data", type=str)
    parser.add_argument("--assets_dir", default="./assets/tabular", type=str)
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

    # real data: chisq for loan/adult, fisherz for covtype
    # (inference_tvae.py:189-222); recon/sample CPDAGs below stay fisherz
    # like the reference (:268, :321 — the decoder emits continuous values)
    i_test = "fisherz" if dataset_name == "covtype" else "chisq"
    G_real, _ = pc(train.frame.to_numpy(), alpha=0.05, indep_test=i_test)

    raw = sample_synthetic_tvae(model, params, transformer,
                                len(train.x_data), seed=config["seed"])
    # z-score the synthetic data like the real frames so PC / ML-efficacy
    # operate on the same scale (the reference's CDG-TVAE eval normalizes
    # synthetic output against the train statistics, inference_tvae.py)
    sample_df = raw[train.continuous].copy()
    scaling = [c for c in train.continuous
               if c not in spec["zscore_exclude"]]
    mu, sd = train.frame[scaling].mean(), train.frame[scaling].std()
    sample_df[scaling] = (sample_df[scaling] - sample_df[scaling].mean()) \
        / sample_df[scaling].std() * sd.to_numpy() + mu.to_numpy()

    G_sample, _ = pc(sample_df.to_numpy(), alpha=0.05)
    results["SHD (Sample)"] = cpdag_shd(G_real, G_sample)
    print(f"SHD (Sample): {results['SHD (Sample)']}")

    target = spec["target"]
    if spec["task"] == "regression":
        synth = regression_eval(sample_df, test.frame, target)
        results["R^2 (Synthetic)"] = float(np.mean([x[1] for x in synth]))
    else:
        if target in sample_df.columns and dataset_name == "adult":
            sample_df[target] = (sample_df[target] > 0.5).astype(int)
        synth = classification_eval(sample_df, test.frame, target)
        results["F1 (Synthetic)"] = float(np.mean([x[1] for x in synth]))

    with open(os.path.join(args.assets_dir,
                           f"inference_TVAE_{dataset_name}.txt"), "w") as f:
        for k, v in results.items():
            f.write(f"{k}: {v}\n")
    print(results)
    return results


if __name__ == "__main__":
    main()

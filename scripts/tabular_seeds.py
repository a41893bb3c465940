"""Multi-seed tabular study: SHD and ML-efficacy stability over training
stochasticity (model init + train RNG + sampling RNG per seed; the data
itself is the fixed-seed corpus, matching the reference's fixed
``sample(random_state=...)`` dataset determinism).

Per seed and dataset: train CDG-VAE at the reference tabular protocol
(200 epochs, batch 256, lr 0.01, beta=0.01, lambda=10 —
tabular/main.py:86-101), then the reference inference protocol
(tabular/inference.py): PC CPDAG on real data vs deterministic
reconstructions vs z~N(0,1) synthetic samples, custom CPDAG SHD, and
train-on-synthetic/test-on-real ML efficacy.

Writes docs/results/tabular_seeds.json.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cdgvae_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import optax  # noqa: E402

from cdgvae_tpu.data.tabular.datasets import (load_tabular,  # noqa: E402
                                              DATASET_SPECS)
from cdgvae_tpu.factory import build_tabular_model  # noqa: E402
from cdgvae_tpu.train.tabular_steps import (make_tabular_step,  # noqa: E402
                                            make_recon_fn)
from cdgvae_tpu.train.scanned import make_scanned_epochs  # noqa: E402
from cdgvae_tpu.eval.tabular_inference import (  # noqa: E402
    reconstruct_dataset, sample_synthetic, to_frame, real_cpdag,
    zscore_synthetic, efficacy)
from cdgvae_tpu.utils.pc import pc, cpdag_shd  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_seed(dataset: str, seed: int, epochs: int, train, test, G_real):
    spec = DATASET_SPECS[dataset]
    config = dict(model="CDGVAE", dataset=dataset, scm="linear",
                  flow_num=1, inverse_loop=100, adjacency_scaling=True,
                  node=spec["node"], factor=list(spec["factor"]),
                  input_dim=spec["input_dim"], seed=seed)
    model, _ = build_tabular_model(config)
    params = model.init(jax.random.key(seed))
    opt = optax.adam(0.01)
    raw = make_tabular_step(model, opt, beta=0.01, lam=10.0,
                            recon_fn=make_recon_fn(
                                dataset, train.flatten_topology),
                            jit=False)
    run = make_scanned_epochs(raw, batch_size=256,
                              n_epochs_per_call=epochs)
    x = jax.device_put(train.x_data)
    y = jax.device_put(train.label)
    t0 = time.time()
    params, _, ms = run(params, opt.init(params), x, y,
                        jax.random.key(seed + 100), 0)
    jax.block_until_ready(ms["loss"])
    t_train = time.time() - t0
    m = {k: float(np.asarray(v)[-1]) for k, v in ms.items()}

    recon = reconstruct_dataset(model, params, x, dataset, seed=seed)
    G_recon, _ = pc(to_frame(recon, train.topology,
                             train.continuous).to_numpy(), alpha=0.05)
    sample = sample_synthetic(model, params, len(train.x_data), dataset,
                              seed=seed)
    sample_df = to_frame(sample, train.topology, train.continuous)
    G_sample, _ = pc(sample_df.to_numpy(), alpha=0.05)

    out = {"seed": seed, "train_s": round(t_train, 1),
           "final_loss": round(float(m["loss"]), 2),
           "shd_train": int(cpdag_shd(G_real, G_recon)),
           "shd_sample": int(cpdag_shd(G_real, G_sample)),
           "efficacy_synthetic": round(
               efficacy(sample_df, test.frame, spec), 4)}
    log(f"{dataset} seed {seed}: {out}")
    return out


def run_seed_tvae(dataset: str, seed: int, epochs: int, test, G_real,
                  train, data_dir=None):
    """Reference CDG-TVAE protocol (tabular/main_tvae.py:82-97: 300
    epochs, batch 256, lr 1e-3, lambda 5, weight_decay 1e-5 as torch-style
    L2, sigma in [0.01, 0.1]); BGMM random_state varies with the seed so
    the DataTransformer fit stochasticity is included."""
    from cdgvae_tpu.data.tabular.datasets import load_tabular_tvae
    from cdgvae_tpu.factory import tvae_block_mask
    from cdgvae_tpu.train.tabular_steps import make_tvae_step
    from cdgvae_tpu.eval.tabular_inference import sample_synthetic_tvae

    spec = DATASET_SPECS[dataset]
    data = load_tabular_tvae(dataset, data_dir=data_dir, random_state=seed)
    config = dict(model="TVAE", dataset=dataset, scm="linear", flow_num=1,
                  inverse_loop=100, adjacency_scaling=True,
                  node=spec["node"], factor=list(spec["factor"]),
                  input_dim=data.transformer.output_dimensions,
                  tvae_mask=tvae_block_mask(
                      dataset, data.transformer.output_info_list),
                  seed=seed)
    model, _ = build_tabular_model(config)
    params = model.init(jax.random.key(seed))
    opt = optax.chain(optax.add_decayed_weights(1e-5),
                      optax.scale_by_adam(), optax.scale(-1e-3))
    raw = make_tvae_step(model, opt, 5.0,
                         data.transformer.output_info_list, jit=False)
    run = make_scanned_epochs(raw, batch_size=256,
                              n_epochs_per_call=epochs)
    x = jax.device_put(data.x_data)
    y = jax.device_put(data.label)
    t0 = time.time()
    params, _, ms = run(params, opt.init(params), x, y,
                        jax.random.key(seed + 100), 0)
    jax.block_until_ready(ms["loss"])
    t_train = time.time() - t0

    raw_df = sample_synthetic_tvae(model, params, data.transformer,
                                   len(data.x_data), seed=seed)
    sample_df = zscore_synthetic(raw_df, train, spec, dataset)
    G_sample, _ = pc(sample_df.to_numpy(), alpha=0.05)

    out = {"seed": seed, "train_s": round(t_train, 1),
           "final_loss": round(float(np.asarray(ms["loss"])[-1]), 2),
           "shd_sample": int(cpdag_shd(G_real, G_sample)),
           "efficacy_synthetic": round(
               efficacy(sample_df, test.frame, spec), 4)}
    log(f"{dataset} TVAE seed {seed}: {out}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--datasets", nargs="*", default=["loan", "adult"])
    ap.add_argument("--epochs", type=int, default=None,
                    help="default: the reference protocol length "
                         "(200 CDG-VAE / 300 CDG-TVAE)")
    ap.add_argument("--tvae", action="store_true",
                    help="CDG-TVAE protocol instead of CDG-VAE")
    ap.add_argument("--data_dir", default="",
                    help="directory of real-format CSVs — routes loading "
                         "through the real-CSV loader branch (the one the "
                         "byte-level fixtures in test_tabular_real_format "
                         "prove) instead of the synthetic fallback arrays; "
                         "generate one with scripts/tabular_fixture_corpus")
    ap.add_argument("--fixture_corpus", action="store_true",
                    help="generate a real-format fixture corpus into "
                         "--data_dir (or a default tmp dir) before running")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.fixture_corpus:
        from tabular_fixture_corpus import write_corpus
        args.data_dir = write_corpus(
            args.data_dir or "/tmp/tabular_fixture_corpus",
            datasets=tuple(args.datasets))
    data_dir = args.data_dir or None
    if data_dir:
        # load_raw silently falls back to the synthetic arrays when the
        # CSV is absent — a study claiming the real-CSV branch must fail
        # loudly instead
        for ds in args.datasets:
            path = os.path.join(data_dir, DATASET_SPECS[ds]["csv"])
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"--data_dir given but {path} is missing; generate a "
                    f"real-format corpus with --fixture_corpus")
    if not args.out:
        name = "tabular_seeds_tvae" if args.tvae else "tabular_seeds"
        args.out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs", "results", f"{name}.json")

    all_results = {"loader_branch": ("real-csv" if data_dir
                                     else "synthetic-fallback"),
                   "data_dir": args.data_dir}
    for ds in args.datasets:
        spec = DATASET_SPECS[ds]
        train = load_tabular(ds, train=True, data_dir=data_dir)
        test = load_tabular(ds, train=False, data_dir=data_dir)
        # real-data CPDAG with the reference's indep-test choice (shared
        # helper, same rule as both inference CLIs)
        G_real = real_cpdag(train.frame, ds)
        baseline = efficacy(train.frame, test.frame, spec)
        if args.tvae:
            epochs = args.epochs or 300
            rows = [run_seed_tvae(ds, s, epochs, test, G_real, train,
                                  data_dir=data_dir)
                    for s in range(1, args.seeds + 1)]
        else:
            epochs = args.epochs or 200
            rows = [run_seed(ds, s, epochs, train, test, G_real)
                    for s in range(1, args.seeds + 1)]
        all_results[ds] = {
            "task": spec["task"],
            "efficacy_baseline": round(baseline, 4),
            "per_seed": rows,
            "shd_sample_mean": round(float(np.mean(
                [r["shd_sample"] for r in rows])), 2),
            "shd_sample_std": round(float(np.std(
                [r["shd_sample"] for r in rows])), 2),
            "efficacy_synthetic_mean": round(float(np.mean(
                [r["efficacy_synthetic"] for r in rows])), 4),
            "efficacy_synthetic_std": round(float(np.std(
                [r["efficacy_synthetic"] for r in rows])), 4),
        }
        log(f"{ds}: SHD(sample) {all_results[ds]['shd_sample_mean']} "
            f"+/- {all_results[ds]['shd_sample_std']}, efficacy "
            f"{all_results[ds]['efficacy_synthetic_mean']} +/- "
            f"{all_results[ds]['efficacy_synthetic_std']} "
            f"(baseline {baseline:.4f})")

    with open(args.out, "w") as f:
        json.dump(all_results, f, indent=1)
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()

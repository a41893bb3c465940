"""End-to-end tabular validation: train CDG-VAE on loan (synthetic CSV
fallback), then PC/SHD + ML-efficacy inference, plus a short CDG-TVAE run."""
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
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from cdgvae_tpu.data.tabular.datasets import (load_tabular,  # noqa: E402
                                              load_tabular_tvae,
                                              DATASET_SPECS)
from cdgvae_tpu.factory import (build_tabular_model,  # noqa: E402
                                tvae_block_mask)
from cdgvae_tpu.train.tabular_steps import (make_tabular_step,  # noqa: E402
                                            make_tvae_step, make_recon_fn)
from cdgvae_tpu.train.loop import train_epoch  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/e2e_tab")
    ap.add_argument("--dataset", default="loan")
    ap.add_argument("--epochs", type=int, default=200)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    ds_name = args.dataset
    spec = DATASET_SPECS[ds_name]

    train = load_tabular(ds_name, train=True)
    test = load_tabular(ds_name, train=False)
    log(f"{ds_name}: train {train.x_data.shape} (synthetic fallback data)")

    config = dict(model="CDGVAE", dataset=ds_name, scm="linear", flow_num=1,
                  inverse_loop=100, adjacency_scaling=True,
                  node=spec["node"], factor=list(spec["factor"]),
                  input_dim=spec["input_dim"], seed=1)
    model, _ = build_tabular_model(config)
    params = model.init(jax.random.key(1))
    opt = optax.adam(0.01)
    recon_fn = make_recon_fn(ds_name, train.flatten_topology)
    step = make_tabular_step(model, opt, beta=0.01, lam=10.0,
                             recon_fn=recon_fn)
    state = (params, opt.init(params))
    x = jax.device_put(train.x_data)
    y = jax.device_put(train.label)
    rng = np.random.default_rng(1)
    t0 = time.time()
    for epoch in range(args.epochs):
        state, m = train_epoch(step, state, x, y, 256, jax.random.key(2),
                               epoch, rng)
    log(f"CDG-VAE {args.epochs} epochs in {time.time() - t0:.1f}s; "
        f"final loss {m['loss']:.3f} recon {m['recon']:.3f} "
        f"align {m['alignment']:.3f}")
    params = state[0]

    # inference: PC/SHD + ML efficacy
    from cdgvae_tpu.eval.tabular_inference import (reconstruct_dataset,
                                                   sample_synthetic,
                                                   to_frame, real_cpdag)
    from cdgvae_tpu.eval.ml_efficacy import regression_eval
    from cdgvae_tpu.utils.pc import pc, cpdag_shd

    t0 = time.time()
    G_real = real_cpdag(train.frame, ds_name)
    recon = reconstruct_dataset(model, params, x, ds_name, seed=1)
    recon_df = to_frame(recon, train.topology, train.continuous)
    G_recon, _ = pc(recon_df.to_numpy(), alpha=0.05)
    shd_train = cpdag_shd(G_real, G_recon)
    sample = sample_synthetic(model, params, len(train.x_data), ds_name,
                              seed=1)
    sample_df = to_frame(sample, train.topology, train.continuous)
    G_sample, _ = pc(sample_df.to_numpy(), alpha=0.05)
    shd_sample = cpdag_shd(G_real, G_sample)
    log(f"PC/SHD in {time.time() - t0:.1f}s: SHD(train-recon)={shd_train}, "
        f"SHD(synthetic)={shd_sample}")

    base = regression_eval(train.frame, test.frame, spec["target"])
    synth = regression_eval(sample_df, test.frame, spec["target"])
    results = {
        "shd_train": int(shd_train), "shd_sample": int(shd_sample),
        "r2_baseline": float(np.mean([v for _, v in base])),
        "r2_synthetic": float(np.mean([v for _, v in synth])),
    }
    log(f"ML efficacy: {results}")

    # short CDG-TVAE run
    data2 = load_tabular_tvae(ds_name, random_state=8)
    cfg2 = dict(config, model="TVAE",
                input_dim=data2.transformer.output_dimensions,
                tvae_mask=tvae_block_mask(
                    ds_name, data2.transformer.output_info_list))
    tvae, _ = build_tabular_model(cfg2)
    tparams = tvae.init(jax.random.key(3))
    topt = optax.adam(1e-3)
    tstep = make_tvae_step(tvae, topt, lam=5.0,
                           output_info_list=data2.transformer.output_info_list)
    tstate = (tparams, topt.init(tparams))
    x2 = jax.device_put(data2.x_data)
    y2 = jax.device_put(data2.label)
    t0 = time.time()
    for epoch in range(30):
        tstate, m2 = train_epoch(tstep, tstate, x2, y2, 256,
                                 jax.random.key(4), epoch, rng)
    log(f"CDG-TVAE 30 epochs in {time.time() - t0:.1f}s; "
        f"loss {m2['loss']:.3f}")

    from cdgvae_tpu.eval.tabular_inference import sample_synthetic_tvae
    synth_df = sample_synthetic_tvae(tvae, tstate[0], data2.transformer,
                                     500, seed=1)
    log(f"TVAE synthetic sample head:\n{synth_df.head(3)}")

    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f)
    log("TABULAR E2E COMPLETE")


if __name__ == "__main__":
    main()

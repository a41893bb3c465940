"""ELBO-curve parity: the torch reference vs this framework, same data.

BASELINE.json's north-star check: at equal hyperparameters (main.py:93-107)
and on the IDENTICAL device-rendered pendulum_real dataset, the two
implementations' per-epoch loss trajectories must agree within initialization
noise. Trains both for --epochs epochs and writes
docs/results/parity_curve.json with both curves + summary stats.

The torch side is the reference CDG-VAE reconstructed from its code (same
modules as scripts/bench_reference_torch.py, here with shuffled real-data
epochs); the JAX side is the scan-compiled trainer.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdgvae_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()


def torch_curve(x_np, y_np, epochs, batch=128, seed=0):
    import torch
    import torch.nn as nn
    from bench_reference_torch import CDGVAE, NODE

    torch.manual_seed(seed)
    model = CDGVAE()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    x_all = torch.from_numpy(x_np)
    y_all = torch.from_numpy(y_np[:, :NODE])
    n = len(x_all)
    rng = np.random.default_rng(seed)
    curve = []
    for _ in range(epochs):
        perm = rng.permutation(n)
        losses = []
        for i in range(0, n - batch + 1, batch):
            idx = perm[i: i + batch]
            x, y = x_all[idx], y_all[idx]
            opt.zero_grad()
            mean, logvar, align, xhat = model(x)
            recon = 0.5 * torch.pow(xhat - x, 2).sum(axis=[1, 2, 3]).mean()
            KL = 0.5 * (mean.pow(2).sum(1) - logvar.sum(1)
                        + torch.exp(logvar).sum(1) - NODE).mean()
            yh = torch.sigmoid(align)
            alignL = nn.functional.binary_cross_entropy(
                yh, y, reduction="none").sum(1).mean()
            loss = recon + 0.1 * KL + 5.0 * alignL
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        curve.append(float(np.mean(losses)))
    return curve


def jax_curve(x_np, y_np, epochs, batch=128, seed=1):
    import jax
    import optax
    from cdgvae_tpu.factory import build_pendulum_model
    from cdgvae_tpu.train.scanned import make_scanned_epochs, unjitted_step

    config = dict(model="CDGVAE", node=4, scm="linear", flow_num=1,
                  inverse_loop=100, factor=[1, 1, 2], image_size=64,
                  adjacency_scaling=True)
    model, _ = build_pendulum_model(config)
    params = model.init(jax.random.key(seed))
    opt = optax.adam(1e-3)
    step = unjitted_step(model, opt, beta=0.1, lam=5.0)
    run = make_scanned_epochs(step, batch_size=batch,
                              n_epochs_per_call=epochs)
    x = jax.device_put(x_np)
    y = jax.device_put(y_np)
    params, _, ms = run(params, opt.init(params), x, y,
                        jax.random.key(seed + 1), 0)
    return [float(v) for v in np.asarray(ms["loss"])]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--n", type=int, default=7500)
    ap.add_argument("--cpu", action="store_true",
                    help="run the JAX side on the CPU backend (identical "
                         "math; use while the chip is busy)")
    ap.add_argument("--out", default="docs/results/parity_curve.json")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if not os.path.isabs(args.out):
        # anchor on the repo root regardless of cwd (a round-1 run from
        # scripts/ landed the artifact in scripts/docs/)
        args.out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), args.out)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from cdgvae_tpu.data.pendulum import PendulumDataset

    ds = PendulumDataset(image_size=64, train=True, seed=1, n=args.n)
    x_np = np.asarray(ds.x_data, np.float32)
    y_np = np.asarray(ds.y_data, np.float32)
    print(f"dataset {x_np.shape}; training both for {args.epochs} epochs",
          flush=True)

    t0 = time.time()
    ours = jax_curve(x_np, y_np, args.epochs)
    t_jax = time.time() - t0
    print(f"jax done in {t_jax:.1f}s: {[round(v, 1) for v in ours]}",
          flush=True)

    t0 = time.time()
    ref = torch_curve(x_np, y_np, args.epochs)
    t_torch = time.time() - t0
    print(f"torch done in {t_torch:.1f}s: {[round(v, 1) for v in ref]}",
          flush=True)

    # parity stat: relative gap of the tail (epochs after warmup)
    tail = slice(args.epochs // 2, None)
    gap = abs(np.mean(ours[tail]) - np.mean(ref[tail])) / np.mean(ref[tail])
    out = {"epochs": args.epochs, "n": args.n,
           "jax_curve": ours, "torch_curve": ref,
           "jax_seconds": t_jax, "torch_seconds": t_torch,
           "tail_relative_gap": float(gap)}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"tail relative gap: {gap:.3f}  -> {args.out}")


if __name__ == "__main__":
    main()

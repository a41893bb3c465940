"""ELBO-curve parity for the tabular family (loan): torch reference vs
this framework, same data.

Extends the pendulum parity check (scripts/parity_curve.py) to the tabular
family per the BASELINE north star. The torch side reconstructs the
reference's loan CDG-VAE exactly as specified by its code — encoder
input_dim->4->node*2 ELU (tabular/modules/model.py:278-298), per-factor
decoders k->2->m concatenated (model.py:337-342), affine flows, loan
recon 0.5*SSE on topology-reordered columns (tabular/modules/train.py:199),
hyperparameters epochs 200 / batch 256 / lr 0.01 / beta 0.01 / lambda 10
(tabular/main.py:86-101) — in fresh torch code. The JAX side is this
framework's tabular trainer. Both consume the IDENTICAL loan corpus
(data/tabular/datasets.py synthetic fallback, fixed seed).

Writes docs/results/parity_curve_loan.json with both curves + tail gap.
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

NODE, FACTOR, MASK, INPUT_DIM = 3, [1, 1, 1], [2, 2, 1], 5
BETA, LAM, LR, BATCH = 0.01, 10.0, 0.01, 256


def torch_curve(x_np, y_np, flat, epochs, seed=0):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(seed)

    class LoanCDGVAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = nn.Sequential(nn.Linear(INPUT_DIM, 4), nn.ELU(),
                                         nn.Linear(4, NODE * 2))
            B = torch.zeros(NODE, NODE)
            B[:-1, -1] = 1.0
            B[:, -1] /= B[:, -1].sum()  # adjacency scaling (in-degree)
            self.register_buffer("I_B_inv",
                                 torch.inverse(torch.eye(NODE) - B))
            self.flow_p = nn.ParameterList(
                [nn.Parameter(torch.rand(2) * 0.1) for _ in range(NODE)])
            self.decoder = nn.ModuleList(
                [nn.Sequential(nn.Linear(k, 2), nn.ELU(), nn.Linear(2, m))
                 for k, m in zip(FACTOR, MASK)])

        def encode(self, x, deterministic=False):
            h = self.encoder(x)
            mean, logvar = torch.split(h, NODE, dim=1)
            eps = mean if deterministic else \
                mean + torch.exp(logvar / 2) * torch.randn_like(mean)
            z = eps @ self.I_B_inv
            latent = [p[0] * z[:, [i]] + p[1]
                      for i, p in enumerate(self.flow_p)]
            return mean, logvar, latent

        def forward(self, x):
            mean, logvar, latent = self.encode(x)
            zcat = torch.cat(latent, dim=1)
            blocks = torch.split(zcat, FACTOR, dim=-1)
            xhat = torch.cat([D(z) for D, z in zip(self.decoder, blocks)],
                             dim=1)
            _, _, align = self.encode(x, deterministic=True)
            return mean, logvar, torch.cat(align, dim=1), xhat

    model = LoanCDGVAE()
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    x_all = torch.from_numpy(x_np)
    y_all = torch.from_numpy(y_np)
    n = len(x_all)
    rng = np.random.default_rng(seed)
    curve = []
    for _ in range(epochs):
        perm = rng.permutation(n)
        losses = []
        for i in range(0, n - BATCH + 1, BATCH):
            idx = perm[i: i + BATCH]
            x, y = x_all[idx], y_all[idx]
            opt.zero_grad()
            mean, logvar, align, xhat = model(x)
            recon = 0.5 * torch.pow(xhat - x[:, flat], 2).sum(1).mean()
            KL = 0.5 * (mean.pow(2).sum(1) - logvar.sum(1)
                        + torch.exp(logvar).sum(1) - NODE).mean()
            alignL = F.binary_cross_entropy(
                torch.sigmoid(align), y, reduction="none").sum(1).mean()
            loss = recon + BETA * KL + LAM * alignL
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        curve.append(float(np.mean(losses)))
    return curve


def jax_curve(x_np, y_np, flat, epochs, seed=1):
    import jax
    import optax
    from cdgvae_tpu.factory import build_tabular_model
    from cdgvae_tpu.train.tabular_steps import (make_recon_fn,
                                                make_tabular_step)
    from cdgvae_tpu.train.scanned import make_scanned_epochs

    config = dict(model="CDGVAE", dataset="loan", node=NODE,
                  factor=FACTOR, input_dim=INPUT_DIM, scm="linear",
                  flow_num=1, inverse_loop=100, adjacency_scaling=True)
    model, _ = build_tabular_model(config)
    params = model.init(jax.random.key(seed))
    opt = optax.adam(LR)
    step = make_tabular_step(model, opt, BETA, LAM,
                             make_recon_fn("loan", flat), jit=False)
    run = make_scanned_epochs(step, batch_size=BATCH,
                              n_epochs_per_call=epochs)
    params, _, ms = run(params, opt.init(params), x_np, y_np,
                        jax.random.key(seed + 1), 0)
    return [float(v) for v in np.asarray(ms["loss"])]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--cpu", action="store_true",
                    help="run the JAX side on the CPU backend (identical "
                         "math; use while the chip is busy)")
    ap.add_argument("--out", default="docs/results/parity_curve_loan.json")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if not os.path.isabs(args.out):
        args.out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), args.out)

    from cdgvae_tpu.data.tabular.datasets import load_tabular
    data = load_tabular("loan", train=True)
    x_np = data.x_data
    y_np = data.label
    flat = data.flatten_topology
    print(f"loan corpus {x_np.shape}; {args.epochs} epochs both sides",
          flush=True)

    t0 = time.time()
    ours = jax_curve(x_np, y_np, flat, args.epochs)
    t_jax = time.time() - t0
    print(f"jax done in {t_jax:.1f}s; tail {ours[-1]:.4f}", flush=True)

    t0 = time.time()
    ref = torch_curve(x_np, y_np, flat, args.epochs)
    t_torch = time.time() - t0
    print(f"torch done in {t_torch:.1f}s; tail {ref[-1]:.4f}", flush=True)

    tail = slice(args.epochs // 2, None)
    gap = abs(np.mean(ours[tail]) - np.mean(ref[tail])) / \
        abs(np.mean(ref[tail]))
    out = {"epochs": args.epochs, "n": len(x_np),
           "jax_curve": ours, "torch_curve": ref,
           "jax_seconds": t_jax, "torch_seconds": t_torch,
           "tail_relative_gap": float(gap)}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"tail relative gap: {gap:.4f}  -> {args.out}")


if __name__ == "__main__":
    main()

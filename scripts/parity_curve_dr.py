"""DR-family parity at the reference's published hyperparameters
(β=0.1, λ=20): torch reference vs this framework, same data, same eval.

Round-1 finding (docs/RESULTS.md, scripts/dr_sweep.py): at λ=20 the
spurious background leaks into a causal latent and worst-group robustness
collapses; λ=40 fixes it. That left open whether the *torch reference
itself* is robust at λ=20 — i.e. whether our λ=20 failure is a faithful
reproduction of a paper-hyperparameter gap or a divergence in this
implementation. This script answers it:

- torch side: the reference DR CDG-VAE reconstructed exactly as specified
  by its code — 12288->300->300->node*2 ELU encoder (DR/modules/model.py:
  218-225), (I-B)^-T propagation + per-node InvertiblePriorLinear flows
  (model.py:8-29, 261-268), three (k+1)->300->300->12288 decoders over
  factor [1,1,2] with the spurious latent appended to every decoder input
  and row-band masks light [0:20) / angle [20:51) / shadow [51:)
  (model.py:281-293, DR/main.py:168-181), loss 0.5·SSE + 0.1·KL +
  20·alignment-BCE over the first 5 labels (DR/modules/train.py:150-203),
  Adam 1e-3, batch 128 (DR/main.py:93-107) — in fresh torch code.
- JAX side: this framework's DR trainer (factory.build_pendulum_model
  spurious=True + train.scanned), identical hyperparameters.
- both consume the IDENTICAL device-rendered pendulum-DR corpus and are
  evaluated with the IDENTICAL downstream protocol (eval/downstream.py::
  robustness — posterior means [:, :4], 10 repeats of the 4->2->1
  classifier, worst group = background != target; reference
  DR/robustness.py:155-295).

Writes docs/results/parity_curve_dr.json: both loss curves + tail gap,
both sides' per-latent |corr| with the background, and both sides'
average / worst-group downstream accuracy.
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

NODE, FACTOR, IMG = 5, (1, 1, 2), 64
BETA, LR, BATCH = 0.1, 1e-3, 128


def torch_model():
    import torch
    import torch.nn as nn

    class DRCDGVAE(nn.Module):
        def __init__(self):
            super().__init__()
            d = 3 * IMG * IMG
            self.encoder = nn.Sequential(
                nn.Linear(d, 300), nn.ELU(), nn.Linear(300, 300), nn.ELU(),
                nn.Linear(300, NODE * 2))
            # light->length/position, angle->length/position, in-degree
            # scaled (DR/main.py:133-148); node order
            # [light, angle, length, position, background]
            B = torch.zeros(NODE, NODE)
            B[0, 2] = B[0, 3] = B[1, 2] = B[1, 3] = 0.5
            self.register_buffer("I_B_inv",
                                 torch.inverse(torch.eye(NODE) - B))
            self.flow_p = nn.ParameterList(
                [nn.Parameter(torch.rand(2) * 0.1) for _ in range(NODE)])
            self.decoder = nn.ModuleList(
                [nn.Sequential(nn.Linear(k + 1, 300), nn.ELU(),
                               nn.Linear(300, 300), nn.ELU(),
                               nn.Linear(300, d)) for k in FACTOR])
            masks = torch.zeros(3, IMG, IMG, 3)
            masks[0, :20] = masks[1, 20:51] = masks[2, 51:] = 1.0
            self.register_buffer("masks", masks)

        def encode(self, x, deterministic=False):
            h = self.encoder(x.reshape(len(x), -1))
            mean, logvar = torch.split(h, NODE, dim=1)
            eps = mean if deterministic else \
                mean + torch.exp(logvar / 2) * torch.randn_like(mean)
            z = eps @ self.I_B_inv
            latent = torch.cat([p[0] * z[:, [i]] + p[1]
                                for i, p in enumerate(self.flow_p)], dim=1)
            return mean, logvar, latent

        def forward(self, x):
            mean, logvar, latent = self.encode(x)
            spur = latent[:, [-1]]
            blocks = torch.split(latent[:, :-1], list(FACTOR), dim=-1)
            xhat = torch.tanh(sum(
                D(torch.cat([z, spur], 1)).view(-1, IMG, IMG, 3) * m
                for D, z, m in zip(self.decoder, blocks, self.masks)))
            _, _, align = self.encode(x, deterministic=True)
            return mean, logvar, align, xhat

    return DRCDGVAE()


def torch_curve(x_np, y_np, epochs, seed=0):
    import torch
    import torch.nn.functional as F

    torch.manual_seed(seed)
    model = torch_model()
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    x_all = torch.from_numpy(x_np)
    y_all = torch.from_numpy(y_np[:, :NODE].astype(np.float32))
    n = len(x_all)
    rng = np.random.default_rng(seed)
    curve, comps = [], {"recon": [], "KL": [], "alignment": []}
    for ep in range(epochs):
        perm = rng.permutation(n)
        losses = []
        ep_comps = {k: [] for k in comps}
        for i in range(0, n - BATCH + 1, BATCH):
            idx = perm[i: i + BATCH]
            x, y = x_all[idx], y_all[idx]
            opt.zero_grad()
            mean, logvar, align, xhat = model(x)
            recon = 0.5 * torch.pow(xhat - x, 2).sum((1, 2, 3)).mean()
            KL = 0.5 * (mean.pow(2).sum(1) - logvar.sum(1)
                        + torch.exp(logvar).sum(1) - NODE).mean()
            alignL = F.binary_cross_entropy(
                torch.sigmoid(align), y, reduction="none").sum(1).mean()
            loss = recon + BETA * KL + args_lam * alignL
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
            ep_comps["recon"].append(float(recon.detach()))
            ep_comps["KL"].append(float(KL.detach()))
            ep_comps["alignment"].append(float(alignL.detach()))
        curve.append(float(np.mean(losses)))
        for k in comps:
            comps[k].append(float(np.mean(ep_comps[k])))
        if (ep + 1) % 10 == 0:
            print(f"  torch epoch {ep + 1}: {curve[-1]:.2f}", flush=True)

    def posterior_means(x):
        with torch.no_grad():
            h = model.encoder(torch.from_numpy(x).reshape(len(x), -1))
        return h[:, :NODE].numpy()

    return curve, comps, posterior_means


def evaluate(posterior_means, ds_tr, ds_te):
    """Shared downstream protocol: reps = posterior means [:, :4]
    (DR/robustness.py:174), 10 repeats, worst group background != target."""
    import jax
    from cdgvae_tpu.eval.downstream import (train_downstream,
                                            worst_group_accuracy)

    reps_tr = posterior_means(ds_tr.x_data)[:, :NODE - 1]
    reps_te = posterior_means(ds_te.x_data)[:, :NODE - 1]
    t_tr = np.asarray(ds_tr.y_data)[:, -1:].astype(np.float32)
    t_te = np.asarray(ds_te.y_data)[:, -1:].astype(np.float32)
    bg_te = np.asarray(ds_te.y_data)[:, -2]
    groups = (bg_te != t_te[:, 0]).astype(np.int32)

    avgs, worsts = [], []
    for r in range(10):
        clf, p = train_downstream(reps_tr, t_tr, jax.random.key(77 + r),
                                  epochs=500, batch_size=64)
        avg, worst = worst_group_accuracy(clf, p, reps_te, t_te, groups)
        avgs.append(avg)
        worsts.append(worst)

    # leak probe: per-latent |corr| with the background (all NODE means)
    full = posterior_means(ds_te.x_data)
    leaks = [round(abs(float(np.corrcoef(full[:, j], bg_te)[0, 1])), 3)
             for j in range(NODE)]
    return {"avg_accuracy": round(float(np.mean(avgs)), 4),
            "worst_group_accuracy": round(float(np.mean(worsts)), 4),
            "bg_corr_per_latent": leaks}


def jax_side(x_np, y_np, epochs, seed=1):
    import jax
    import optax
    from cdgvae_tpu.factory import build_pendulum_model
    from cdgvae_tpu.train.scanned import make_scanned_epochs, unjitted_step

    config = dict(model="CDGVAE", node=NODE, scm="linear", flow_num=1,
                  inverse_loop=100, factor=list(FACTOR), image_size=IMG,
                  adjacency_scaling=True)
    model, _ = build_pendulum_model(config, spurious=True)
    params = model.init(jax.random.key(seed))
    opt = optax.adam(LR)
    step = unjitted_step(model, opt, BETA, args_lam)
    run = make_scanned_epochs(step, batch_size=BATCH,
                              n_epochs_per_call=epochs)
    params, _, ms = run(params, opt.init(params), x_np,
                        y_np[:, :NODE].astype(np.float32),
                        jax.random.key(seed + 1000), 0)
    curve = [float(v) for v in np.asarray(ms["loss"])]
    comps = {k: [float(v) for v in np.asarray(ms[k])]
             for k in ("recon", "KL", "alignment")}

    from cdgvae_tpu.eval.downstream import extract_representations

    def posterior_means(x):
        return extract_representations(model, params, x)

    return curve, comps, posterior_means


def main():
    global args_lam
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--n", type=int, default=2500)
    ap.add_argument("--lam", type=float, default=20.0)
    ap.add_argument("--cpu", action="store_true",
                    help="run the JAX side on the CPU backend")
    ap.add_argument("--out", default="docs/results/parity_curve_dr.json")
    args = ap.parse_args()
    args_lam = args.lam
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if not os.path.isabs(args.out):
        args.out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), args.out)

    from cdgvae_tpu.data.pendulum_dr import PendulumDRDataset
    ds = PendulumDRDataset(image_size=IMG, train=True, seed=1, n=args.n)
    ds_tr = PendulumDRDataset(image_size=IMG, train=True, seed=1,
                              n=args.n, downstream=True)
    ds_te = PendulumDRDataset(image_size=IMG, train=False, seed=1,
                              n=args.n, downstream=True)
    x_np = np.asarray(ds.x_data, np.float32)
    y_np = np.asarray(ds.y_data, np.float32)
    print(f"DR corpus {x_np.shape}; lambda={args.lam}; "
          f"{args.epochs} epochs both sides", flush=True)

    t0 = time.time()
    ours, ours_comps, post_jax = jax_side(x_np, y_np, args.epochs)
    t_jax = time.time() - t0
    ours_eval = evaluate(post_jax, ds_tr, ds_te)
    print(f"jax done in {t_jax:.1f}s; tail {ours[-1]:.2f}; "
          f"{ours_eval}", flush=True)

    t0 = time.time()
    ref, ref_comps, post_torch = torch_curve(x_np, y_np, args.epochs)
    t_torch = time.time() - t0
    ref_eval = evaluate(post_torch, ds_tr, ds_te)
    print(f"torch done in {t_torch:.1f}s; tail {ref[-1]:.2f}; "
          f"{ref_eval}", flush=True)

    tail = slice(args.epochs // 2, None)
    gap = abs(np.mean(ours[tail]) - np.mean(ref[tail])) / \
        abs(np.mean(ref[tail]))
    comp_tails = {
        side + "_" + k: round(float(np.mean(c[k][-10:])), 4)
        for side, c in (("jax", ours_comps), ("torch", ref_comps))
        for k in ("recon", "KL", "alignment")}
    print("component tails (last-10-epoch means):", comp_tails, flush=True)
    out = {"lambda": args.lam, "epochs": args.epochs, "n": args.n,
           "jax_curve": ours, "torch_curve": ref,
           "jax_components": ours_comps, "torch_components": ref_comps,
           "component_tails": comp_tails,
           "jax_seconds": round(t_jax, 1),
           "torch_seconds": round(t_torch, 1),
           "tail_relative_gap": float(gap),
           "jax_eval": ours_eval, "torch_eval": ref_eval}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"tail relative gap: {gap:.4f}  -> {args.out}")


if __name__ == "__main__":
    main()

"""Measure the PyTorch reference's training throughput on this host (CPU).

The reference publishes no speed numbers (BASELINE.md), so this script
reconstructs the reference's CDG-VAE training step exactly as specified by
its code — same architecture (modules/model.py:208-304), same losses
(modules/train.py:150-209), same hyperparameters (main.py:93-107) — in fresh
torch code, and times steps/sec on synthetic data of the real shape.

Run once; the resulting images/sec is recorded in BASELINE.md and used as the
``vs_baseline`` denominator in bench.py.
"""
import time

import torch
import torch.nn as nn

NODE, IMG, BATCH, FACTOR = 4, 64, 128, [1, 1, 2]


class AffineFlow(nn.Module):
    def __init__(self):
        super().__init__()
        self.p = nn.Parameter(torch.rand(2) * 0.1)

    def forward(self, eps):
        return self.p[0] * eps + self.p[1]


class CDGVAE(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = nn.Sequential(
            nn.Linear(3 * IMG * IMG, 300), nn.ELU(),
            nn.Linear(300, 300), nn.ELU(), nn.Linear(300, NODE * 2))
        B = torch.zeros(NODE, NODE)
        B[0, 2] = B[0, 3] = B[1, 2] = B[1, 3] = 0.5
        self.register_buffer("I_B_inv",
                             torch.inverse(torch.eye(NODE) - B))
        self.flows = nn.ModuleList([AffineFlow() for _ in range(NODE)])
        self.decoder = nn.ModuleList([nn.Sequential(
            nn.Linear(k, 300), nn.ELU(), nn.Linear(300, 300), nn.ELU(),
            nn.Linear(300, 3 * IMG * IMG)) for k in FACTOR])
        mask = torch.zeros(3, IMG, IMG, 3)
        mask[0, :20] = 1
        mask[1, 20:51] = 1
        mask[2, 51:] = 1
        self.register_buffer("mask", mask)

    def encode(self, x, deterministic=False):
        h = self.encoder(x.flatten(1))
        mean, logvar = torch.split(h, NODE, dim=1)
        eps = mean if deterministic else \
            mean + torch.exp(logvar / 2) * torch.randn_like(mean)
        z = eps @ self.I_B_inv
        latent = [f(z[:, [i]]) for i, f in enumerate(self.flows)]
        return mean, logvar, latent

    def forward(self, x):
        mean, logvar, latent = self.encode(x)
        zcat = torch.cat(latent, dim=1)
        blocks = torch.split(zcat, FACTOR, dim=-1)
        xs = [D(z).view(-1, IMG, IMG, 3) * m
              for D, z, m in zip(self.decoder, blocks, self.mask)]
        xhat = torch.tanh(sum(xs))
        _, _, align = self.encode(x, deterministic=True)
        return mean, logvar, torch.cat(align, dim=1), xhat


def main():
    torch.manual_seed(0)
    model = CDGVAE()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.tanh(torch.randn(BATCH, IMG, IMG, 3))
    y = torch.rand(BATCH, NODE)

    def step():
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
        return float(loss.detach())

    for _ in range(5):
        step()
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = time.perf_counter() - t0
    print(f"torch reference CPU: {n / dt:.3f} steps/s, "
          f"{BATCH * n / dt:.1f} imgs/s")


if __name__ == "__main__":
    main()

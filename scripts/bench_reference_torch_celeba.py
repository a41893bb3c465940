"""Measure the PyTorch reference's CelebA training throughput on this host
(CPU).

The reference publishes no speed numbers (BASELINE.md), so this script
reconstructs the reference's CelebA CDG-VAE training step exactly as
specified by its code — frozen resnet18 trunk + new fc head
(celeba/module/model.py:117-125; torchvision is absent offline so the
standard resnet18 topology is built inline, randomly initialized — weight
values do not affect step *time*), five SAGAN generators with the
hand-wired parent groups (model.py:189-195), L1 recon + dual KL +
alignment BCE (celeba/module/train.py:33-58), batch 16 at 128px
(celeba/main.py defaults) — in fresh torch code, and times steps/sec on
synthetic data of the real shape.

Run once; the resulting images/sec is recorded in docs/PERF.md and used as
the ``vs_baseline`` denominator for the CelebA metric in bench.py.
"""
import time

import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import spectral_norm

NODE, LATENT, IMG, BATCH, CONV = 6, 6, 128, 16, 32
GROUPS = ([0, 2], [0, 3], [0, 4], [0, 1, 5])


# ---- resnet18 trunk (standard topology; torchvision layout) ----

class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(nn.Conv2d(cin, cout, 1, stride,
                                                bias=False),
                                      nn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.down is None else self.down(x)
        h = F.relu(self.bn1(self.conv1(x)))
        return F.relu(self.bn2(self.conv2(h)) + idn)


class ResNet18(nn.Module):
    def __init__(self, out_dim):
        super().__init__()
        self.stem = nn.Sequential(nn.Conv2d(3, 64, 7, 2, 3, bias=False),
                                  nn.BatchNorm2d(64), nn.ReLU(),
                                  nn.MaxPool2d(3, 2, 1))
        layers, cin = [], 64
        for cout, stride in ((64, 1), (64, 1), (128, 2), (128, 1),
                             (256, 2), (256, 1), (512, 2), (512, 1)):
            layers.append(BasicBlock(cin, cout, stride))
            cin = cout
        self.layers = nn.Sequential(*layers)
        self.fc = nn.Linear(512, out_dim)

    def forward(self, x):
        h = self.layers(self.stem(x))
        return self.fc(h.mean(dim=(2, 3)))


# ---- SAGAN generator (celeba/module/sagan.py topology at 128px) ----

class NoiseInjection(nn.Module):
    def __init__(self, ch, size):
        super().__init__()
        self.weight = nn.Parameter(torch.zeros(1, ch, size, size))

    def forward(self, x):
        return x + self.weight * torch.randn_like(x[:, :1])


class SelfAttn(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.theta = spectral_norm(nn.Conv2d(ch, ch // 8, 1))
        self.phi = spectral_norm(nn.Conv2d(ch, ch // 8, 1))
        self.g = spectral_norm(nn.Conv2d(ch, ch // 2, 1))
        self.o = spectral_norm(nn.Conv2d(ch // 2, ch, 1))
        self.sigma = nn.Parameter(torch.zeros(1))

    def forward(self, x):
        b, c, h, w = x.shape
        th = self.theta(x).view(b, c // 8, h * w)
        ph = F.max_pool2d(self.phi(x), 2).view(b, c // 8, h * w // 4)
        attn = torch.softmax(torch.bmm(th.transpose(1, 2), ph), -1)
        g = F.max_pool2d(self.g(x), 2).view(b, c // 2, h * w // 4)
        o = torch.bmm(g, attn.transpose(1, 2)).view(b, c // 2, h, w)
        return x + self.sigma * self.o(o)


class GenBlock(nn.Module):
    def __init__(self, cin, cout, size):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(cin)
        self.bn2 = nn.BatchNorm2d(cout)
        self.c1 = spectral_norm(nn.Conv2d(cin, cout, 3, 1, 1))
        self.c2 = spectral_norm(nn.Conv2d(cout, cout, 3, 1, 1))
        self.c0 = spectral_norm(nn.Conv2d(cin, cout, 1))
        self.n1 = NoiseInjection(cout, size)
        self.n2 = NoiseInjection(cout, size)

    def forward(self, x):
        up = lambda t: F.interpolate(t, scale_factor=2, mode="nearest")
        h = up(F.relu(self.bn1(x)))
        h = self.n1(self.c1(h))
        h = self.n2(self.c2(F.relu(self.bn2(h))))
        return h + self.c0(up(x))


class Generator(nn.Module):
    def __init__(self, z_dim, conv=CONV):
        super().__init__()
        self.conv = conv
        self.lin0 = spectral_norm(nn.Linear(z_dim, conv * 16 * 4 * 4))
        self.n0 = NoiseInjection(conv * 16, 4)
        self.b1 = GenBlock(conv * 16, conv * 16, 8)
        self.b2 = GenBlock(conv * 16, conv * 8, 16)
        self.b3 = GenBlock(conv * 8, conv * 4, 1)
        self.attn = SelfAttn(conv * 4)
        self.b4 = GenBlock(conv * 4, conv * 2, 1)
        self.b5 = GenBlock(conv * 2, conv, 1)
        self.bn = nn.BatchNorm2d(conv)
        self.rgb = spectral_norm(nn.Conv2d(conv, 3, 3, 1, 1))

    def forward(self, z):
        h = self.n0(self.lin0(z).view(-1, self.conv * 16, 4, 4))
        h = self.b2(self.b1(h))
        h = self.b4(self.attn(self.b3(h)))
        h = self.b5(h)
        return torch.tanh(self.rgb(F.relu(self.bn(h))))


class CelebACDGVAE(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = ResNet18(NODE * 2 + LATENT * 2)
        for p in self.encoder.parameters():      # frozen trunk,
            p.requires_grad_(False)
        self.encoder.fc.weight.requires_grad = True   # new fc trains
        self.encoder.fc.bias.requires_grad = True
        B = torch.zeros(NODE, NODE)
        B[0, 2] = B[0, 3] = B[0, 4] = B[1, 5] = 1.0
        self.register_buffer("I_B_inv",
                             torch.inverse(torch.eye(NODE) - B))
        self.flow_p = nn.Parameter(torch.rand(NODE, 2) * 0.1)
        self.gens = nn.ModuleList([Generator(len(g)) for g in GROUPS]
                                  + [Generator(LATENT)])

    def encode(self, x, deterministic=False):
        h = self.encoder(x[..., :3].permute(0, 3, 1, 2))
        m1, lv1, m2, lv2 = torch.split(h, [NODE, NODE, LATENT, LATENT], 1)
        if deterministic:
            e1, e2 = m1, m2
        else:
            e1 = m1 + torch.exp(lv1 / 2) * torch.randn_like(m1)
            e2 = m2 + torch.exp(lv2 / 2) * torch.randn_like(m2)
        z = e1 @ self.I_B_inv
        latent = z * self.flow_p[:, 0] + self.flow_p[:, 1]
        return m1, lv1, m2, lv2, latent, e2

    def forward(self, x, masks):
        m1, lv1, m2, lv2, latent, e2 = self.encode(x)
        zs = [latent[:, g] for g in GROUPS] + [e2]
        xh = sum(G(z).permute(0, 2, 3, 1) * m[..., None]
                 for G, z, m in zip(self.gens, zs, masks))
        _, _, _, _, align, _ = self.encode(x, deterministic=True)
        return m1, lv1, m2, lv2, align, torch.tanh(xh)


def main():
    torch.manual_seed(0)
    model = CelebACDGVAE()
    opt = torch.optim.Adam([p for p in model.parameters()
                            if p.requires_grad], lr=1e-3)
    x = torch.rand(BATCH, IMG, IMG, 8)
    masks = [x[..., 3 + i] for i in range(5)]
    y = (torch.rand(BATCH, NODE) > 0.5).float()

    def step():
        opt.zero_grad()
        m1, lv1, m2, lv2, align, xhat = model(x, masks)
        recon = (xhat - (x[..., :3] * 2 - 1)).abs().sum((1, 2, 3)).mean()
        KL = 0.5 * ((m1.pow(2) + lv1.exp() - lv1 - 1).sum(1)
                    + (m2.pow(2) + lv2.exp() - lv2 - 1).sum(1)).mean()
        alignL = F.binary_cross_entropy_with_logits(
            align, y, reduction="none").sum(1).mean()
        loss = recon + 0.1 * KL + 5.0 * alignL
        loss.backward()
        opt.step()
        return float(loss.detach())

    n_params = sum(p.numel() for p in model.parameters())
    print(f"params: {n_params / 1e6:.1f}M")
    for _ in range(2):
        step()
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = time.perf_counter() - t0
    print(f"torch reference CelebA CPU: {n / dt:.4f} steps/s, "
          f"{BATCH * n / dt:.2f} imgs/s")


if __name__ == "__main__":
    main()

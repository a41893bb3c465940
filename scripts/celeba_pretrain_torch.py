"""Pretrain a torchvision-layout resnet18 on the synthetic CelebA corpus.

Purpose: demonstrate the PRETRAINED-ENCODER regime end-to-end. The
reference freezes an ImageNet-pretrained torchvision resnet18 and trains
only a new fc head (celeba/module/model.py:117-125); ImageNet weights are
unavailable offline, so the repo's CelebA results so far come from the
random-init regime (frozen random features fail the alignment loss at
lambda=5; the trained-trunk runs use lambda=2000). This script closes the
loop the only way available offline:

1. build a resnet18 in torch whose ``state_dict()`` keys/shapes are
   EXACTLY torchvision's (``conv1.weight``, ``bn1.*``,
   ``layer{1-4}.{i}.{conv,bn}{1,2}.*``, ``downsample.{0,1}.*``, ``fc.*``)
   — this is a reconstruction of the torchvision module layout for
   export-format parity, not a copy of reference code;
2. pretrain it (torch CPU) on supervised attribute classification over
   the pixel-visible synthetic corpus (data/celeba.py::synthetic_celeba)
   — the stand-in for ImageNet pretraining: features that LINEARLY
   expose the generative attributes;
3. ``torch.save`` the state dict (BN running stats included) for
   ``cli.celeba_main --torch_weights`` / ``ResNetEncoder.load_torch_weights``
   to import, freeze, and train CDG-VAE on top at the reference's
   lambda=5.

Writes <out>.pt plus a json sidecar with the pretraining accuracy.
"""
import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from cdgvae_tpu.data.celeba import synthetic_celeba  # noqa: E402


class BasicBlock(nn.Module):
    """torchvision-layout basic block: conv1/bn1/conv2/bn2[/downsample]."""

    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                nn.BatchNorm2d(out_ch))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        h = F.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return F.relu(h + identity)


class ResNet18(nn.Module):
    """resnet18 with torchvision state_dict layout; fc head sized for the
    6 binary attributes (the head is NOT imported downstream — the
    importer keeps its fresh fc, matching the reference's replaced head)."""

    def __init__(self, n_out=6):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        widths = [64, 128, 256, 512]
        in_ch = 64
        for li, w in enumerate(widths):
            blocks = []
            for bi in range(2):
                stride = 2 if (li > 0 and bi == 0) else 1
                blocks.append(BasicBlock(in_ch, w, stride))
                in_ch = w
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(512, n_out)

    def forward(self, x):
        h = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        for li in range(1, 5):
            h = getattr(self, f"layer{li}")(h)
        return self.fc(h.mean(dim=(2, 3)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_train", type=int, default=2000)
    ap.add_argument("--n_test", type=int, default=256)
    ap.add_argument("--img_size", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data_seed", type=int, default=1,
                    help="corpus seed; keep equal to the downstream "
                         "study's --data_seed so the pretraining sees the "
                         "same distribution (train split only)")
    ap.add_argument("--out", default="/tmp/celeba_pretrained_resnet18.pt")
    args = ap.parse_args()

    torch.manual_seed(args.seed)
    x, y = synthetic_celeba(args.n_train, args.img_size,
                            seed=args.data_seed)
    xt, yt = synthetic_celeba(args.n_test, args.img_size,
                              seed=args.data_seed + 1)
    # NCHW, RGB only, [0, 1] — the SAME range the downstream encoder
    # consumes (models/celeba.py::get_posterior feeds x[..., :3] raw; only
    # the recon TARGET is rescaled to [-1, 1] in the loss). Pretraining on
    # a different range would hand the frozen trunk (and its imported BN
    # running stats) a distribution it never saw.
    to_t = lambda a: torch.from_numpy(  # noqa: E731
        a[..., :3].transpose(0, 3, 1, 2).copy())
    x, y = to_t(x), torch.from_numpy(y)
    xt, yt = to_t(xt), torch.from_numpy(yt)

    net = ResNet18(n_out=y.shape[1])
    # layout guard: exactly the torchvision resnet18 key set
    keys = set(net.state_dict().keys())
    assert "layer4.1.bn2.running_var" in keys and "conv1.weight" in keys
    opt = torch.optim.Adam(net.parameters(), lr=args.lr)

    n_steps = math.ceil(len(x) / args.batch)
    t0 = time.time()
    for epoch in range(args.epochs):
        net.train()
        perm = torch.randperm(len(x))
        tot = 0.0
        for s in range(n_steps):
            idx = perm[s * args.batch: (s + 1) * args.batch]
            logits = net(x[idx])
            loss = F.binary_cross_entropy_with_logits(logits, y[idx])
            opt.zero_grad()
            loss.backward()
            opt.step()
            tot += float(loss) * len(idx)
        net.eval()
        with torch.no_grad():
            acc = float(((net(xt) > 0) == (yt > 0.5)).float().mean())
        print(f"[epoch {epoch}] bce {tot / len(x):.4f}  "
              f"test attr-acc {acc:.4f}", flush=True)

    net.eval()
    with torch.no_grad():
        acc = float(((net(xt) > 0) == (yt > 0.5)).float().mean())
    torch.save(net.state_dict(), args.out)
    side = {"test_attr_acc": round(acc, 4), "n_train": args.n_train,
            "img_size": args.img_size, "epochs": args.epochs,
            "data_seed": args.data_seed,
            "wall_s": round(time.time() - t0, 1)}
    with open(args.out + ".json", "w") as f:
        json.dump(side, f, indent=1)
    print(f"state dict -> {args.out}  {side}")


if __name__ == "__main__":
    main()

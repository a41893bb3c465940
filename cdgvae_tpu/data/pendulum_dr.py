"""Pendulum-DR data-generating process: spurious background attribute.

Replicates reference DR/modules/pendulum_DR.py as a pure array program:
same physics + measurement error + 20% corruption as pendulum_real, then
  * labels are centered by the TRAIN mean (train and test both,
    pendulum_DR.py:103-105),
  * target τ ~ Bernoulli(σ(logit − 2 sin logit)) on the centered labels,
  * spurious background ~ P(blue|τ=1)=0.8, P(blue|τ=0)=0.2 in train but
    0.5/0.5 in test (pendulum_DR.py:113-132) — the distribution shift the
    robustness eval measures,
  * background==1 renders the canvas blue (pendulum_DR.py:164).

Label columns: [light, angle, length, position, background, target]
(DR/modules/datasets.py:17); dataset normalization touches ONLY the first
four columns (DR/modules/datasets.py:28-33).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from ..ops.renderer import render
from .pendulum import shadow_physics

DR_FACTOR_NAMES = ["light", "angle", "length", "position", "background",
                   "target"]
_BETA = np.array([1.0, -1.0, 0.5, -0.5])


def sample_factors_dr(seed: int = 1, n: int = 10000):
    """Returns (train_factors [*,6], test_factors [*,6]); columns =
    (light, angle, length, position, background, target)."""
    rng = np.random.RandomState(seed)
    light = rng.uniform(math.pi / 4, math.pi / 2, n)
    angle = rng.uniform(0, math.pi / 4, n)
    length, position = shadow_physics(light, angle)
    length = length + rng.normal(0, 0.1, n)
    position = position + rng.normal(0, 0.1, n)
    corrupt = (np.arange(n) + 1) % 5 == 0
    length = np.where(corrupt, rng.uniform(0, 12, n), length)
    position = np.where(corrupt, rng.uniform(0, 12, n), position)

    factors = np.round(np.stack([light, angle, length, position], 1), 4)
    is_test = (np.arange(n) + 1) % 4 == 0
    train_f, test_f = factors[~is_test], factors[is_test]

    # center by the TRAIN mean before computing the target logit
    mean = train_f.mean(axis=0)

    def tau_and_background(f, p1, p0):
        logit = (f - mean) @ _BETA
        tau = rng.binomial(1, 1.0 / (1.0 + np.exp(-logit
                                                  + 2.0 * np.sin(logit))))
        p = np.where(tau == 1, p1, p0)
        background = (rng.uniform(size=len(f)) < p).astype(np.float64)
        return tau.astype(np.float64), background

    tr_tau, tr_bg = tau_and_background(train_f, 0.8, 0.2)
    te_tau, te_bg = tau_and_background(test_f, 0.5, 0.5)

    train = np.concatenate([train_f, tr_bg[:, None], tr_tau[:, None]], 1)
    test = np.concatenate([test_f, te_bg[:, None], te_tau[:, None]], 1)
    return train, test


@dataclass
class PendulumDRDataset:
    """DR dataset: blue-background-rendered images + 6-column labels.

    ``data_dir`` (optional) loads a reference-format pendulum_DR PNG tree
    (6 filename fields, DR/modules/pendulum_DR.py:167) instead of
    rendering. See :mod:`cdgvae_tpu.data.png_io`.
    """
    image_size: int = 64
    train: bool = True
    labeled_ratio: float = 1.0
    label_normalization: bool = True
    downstream: bool = False
    seed: int = 1
    n: int = 10000
    data_dir: str | None = None
    name: list = field(default_factory=lambda: list(DR_FACTOR_NAMES))

    def __post_init__(self):
        if self.data_dir is not None:
            from .png_io import load_png_dataset
            import os
            split = "train" if self.train else "test"
            self.x_data, factors = load_png_dataset(
                os.path.join(self.data_dir, split), self.image_size)
            if self.train and self.labeled_ratio < 1.0:
                keep = int(len(factors) * self.labeled_ratio)
                self.x_data, factors = self.x_data[:keep], factors[:keep]
        else:
            train_f, test_f = sample_factors_dr(self.seed, self.n)
            factors = train_f if self.train else test_f
            if self.train and self.labeled_ratio < 1.0:
                factors = factors[: int(len(factors) * self.labeled_ratio)]
        self.factors = factors
        if self.data_dir is None:
            xs = []
            for i in range(0, len(factors), 2048):
                chunk = factors[i: i + 2048]
                xs.append(np.asarray(render(
                    jnp.asarray(chunk[:, :4], jnp.float32),
                    size=self.image_size,
                    background=jnp.asarray(chunk[:, 4], jnp.float32))))
            self.x_data = np.concatenate(xs, 0).astype(np.float32)

        label = factors.copy()
        if not self.downstream:
            label[:, :4] = label[:, :4] - label[:, :4].mean(axis=0)
            self.std = label.std(axis=0)
            if self.label_normalization:
                label[:, :4] = (label[:, :4] - label[:, :4].min(axis=0)) / (
                    label[:, :4].max(axis=0) - label[:, :4].min(axis=0))
        self.y_data = label.astype(np.float32)

    def __len__(self):
        return len(self.x_data)

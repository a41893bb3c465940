"""Pendulum data-generating process + in-memory datasets.

Replicates the two DGPs of the reference as pure array programs:

* :func:`sample_factors_real` — the "pendulum_real" DGP used by all main
  experiments (reference modules/pendulum_real.py): 10k uniform draws of
  (light angle, pendulum angle), closed-form shadow physics, Gaussian
  measurement error on the shadow factors, 20% uniform corruption, and a
  Bernoulli target label with a nonlinear logit (β=[1,-1,.5,-.5], -2·sin).
* :func:`grid_factors` — the deterministic 100×100 linspace grid DGP
  (reference modules/pendulum.py:30-58), no noise, no target.

Train/test splits replicate the reference's counter-based assignment
(every 4th sample is test, pendulum_real.py:109-114).

Images are rendered on device by :mod:`cdgvae_tpu.ops.renderer` instead of the
reference's matplotlib-PNG-PIL round trip; labels carry the reference's
4-decimal rounding (labels are parsed back out of PNG *filenames* there,
modules/datasets.py:30, and filenames round to 4 decimals,
pendulum_real.py:88).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.renderer import render, CENTER, ROD_LEN, GROUND

FACTOR_NAMES = ["light", "angle", "length", "position", "target"]
_BETA = np.array([1.0, -1.0, 0.5, -0.5])


def shadow_physics(light_angle: np.ndarray, pendulum_angle: np.ndarray,
                   xp=np):
    """Closed-form shadow length/position (reference pendulum_real.py:64-68).
    ``xp=jnp`` makes it jit-traceable for the device-side online DGP."""
    cx, cy = CENTER
    l, b = ROD_LEN, GROUND
    tip_x = cx + l * xp.sin(pendulum_angle)
    tip_y = cy - l * xp.cos(pendulum_angle)
    t = xp.tan(light_angle)
    right = tip_x - (tip_y - b) / t
    left = cx - (cy - b) / t
    length = right - left
    position = (right + left) / 2.0
    return length, position


def sample_factors_real(seed: int = 1, n: int = 10000):
    """The pendulum_real DGP. Returns (factors [n,5], is_test [n]) where
    factor columns are (light, angle, length, position, target)."""
    rng = np.random.RandomState(seed)
    light = rng.uniform(math.pi / 4, math.pi / 2, n)
    angle = rng.uniform(0, math.pi / 4, n)
    length, position = shadow_physics(light, angle)

    scale = 0.1  # measurement-error scale (pendulum_real.py:49)
    length = length + rng.normal(0, scale, n)
    position = position + rng.normal(0, scale, n)

    # 20% corruption: every 5th sample's shadow resampled uniformly
    corrupt = (np.arange(n) + 1) % 5 == 0
    length = np.where(corrupt, rng.uniform(0, 12, n), length)
    position = np.where(corrupt, rng.uniform(0, 12, n), position)

    logit = np.stack([light, angle, length, position], 1) @ _BETA
    p = 1.0 / (1.0 + np.exp(-logit + 2.0 * np.sin(logit)))
    target = rng.binomial(1, p).astype(np.float64)

    factors = np.stack([light, angle, length, position, target], axis=1)
    # labels ride through 4-decimal filename rounding in the reference
    factors = np.round(factors, 4)
    is_test = (np.arange(n) + 1) % 4 == 0  # 3:1 split (pendulum_real.py:109)
    return factors, is_test


def grid_factors(n_per_axis: int = 100):
    """Deterministic grid DGP (reference modules/pendulum.py). Returns
    (factors [n²,4], is_test). Outer loop = pendulum angle, inner = light."""
    light_list = np.linspace(math.pi / 4, math.pi / 2, n_per_axis)
    angle_list = np.linspace(0, math.pi / 4, n_per_axis)
    angle, light = np.meshgrid(angle_list, light_list, indexing="ij")
    light, angle = light.ravel(), angle.ravel()
    length, position = shadow_physics(light, angle)
    factors = np.round(np.stack([light, angle, length, position], 1), 4)
    is_test = (np.arange(light.size) + 1) % 4 == 0
    return factors, is_test


def normalize_labels(label: np.ndarray, label_normalization: bool = True):
    """Center then min-max to (0,1) per column (reference
    modules/datasets.py:31-37). Returns (normalized, std_of_centered)."""
    label = label - label.mean(axis=0)
    std = label.std(axis=0)
    if label_normalization:
        label = (label - label.min(axis=0)) / (
            label.max(axis=0) - label.min(axis=0))
    return label, std


@dataclass
class PendulumDataset:
    """In-memory pendulum dataset, rendered on device.

    Mirrors the reference LabeledDataset / TestDataset contract
    (modules/datasets.py:14-95): ``x_data`` [-1,1] float32 HWC images,
    ``y_data`` labels (light, angle, length, position, target), ``name``.

    ``labeled_ratio`` truncates the train set for semi-supervised runs
    (modules/datasets.py:21). ``downstream=True`` keeps raw labels.

    ``data_dir`` (optional) loads a reference-format PNG tree
    (``<data_dir>/{train,test}/a_*.png``, labels in filenames) instead of
    rendering — a reference user's existing ``modules/causal_data/...``
    dataset works here directly. See :mod:`cdgvae_tpu.data.png_io`.
    """
    image_size: int = 64
    train: bool = True
    labeled_ratio: float = 1.0
    label_normalization: bool = True
    downstream: bool = False
    seed: int = 1
    n: int = 10000
    data_dir: str | None = None
    name: list = field(default_factory=lambda: list(FACTOR_NAMES))

    def __post_init__(self):
        if self.data_dir is not None:
            from .png_io import load_png_dataset
            import os
            split = "train" if self.train else "test"
            x, factors = load_png_dataset(
                os.path.join(self.data_dir, split), self.image_size)
            if self.train and self.labeled_ratio < 1.0:
                keep = int(len(factors) * self.labeled_ratio)
                x, factors = x[:keep], factors[:keep]
            self.factors, self.x_data = factors, x
        else:
            factors, is_test = sample_factors_real(self.seed, self.n)
            sel = is_test if not self.train else ~is_test
            factors = factors[sel]
            if self.train and self.labeled_ratio < 1.0:
                factors = factors[: int(len(factors) * self.labeled_ratio)]

            self.factors = factors
            self.x_data = np.asarray(
                _render_in_chunks(factors[:, :4], self.image_size))
        label = factors.copy()
        if not self.downstream:
            label, self.std = normalize_labels(label,
                                               self.label_normalization)
        self.y_data = label.astype(np.float32)

    def __len__(self):
        return len(self.x_data)


def _render_in_chunks(factors: np.ndarray, image_size: int,
                      chunk: int = 2048) -> np.ndarray:
    outs = []
    for i in range(0, len(factors), chunk):
        f = jnp.asarray(factors[i:i + chunk], dtype=jnp.float32)
        outs.append(np.asarray(render(f, size=image_size)))
    return np.concatenate(outs, axis=0).astype(np.float32)

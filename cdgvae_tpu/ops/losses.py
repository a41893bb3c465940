"""Loss terms for all CDG-VAE families, as pure functions.

Each matches the reference's exact reduction semantics (sum over feature axes,
mean over batch) so loss curves are directly comparable:

* ``gaussian_recon``   — 0.5 * sum((xhat-x)^2) per sample, batch mean
                         (reference modules/train.py:175)
* ``l1_recon``         — |xhat - x| sum/mean (celeba/module/train.py:33-34)
* ``kl_std_normal``    — analytic KL( N(mean, diag e^logvar) || N(0, I) )
                         (modules/train.py:180-186)
* ``alignment_bce``    — per-node BCE(sigmoid(latent), labels) summed over
                         nodes, batch mean (modules/train.py:189-191)
* ``infomax_mi``       — f-divergence MI lower bound with permuted marginals
                         (modules/train.py:120-125)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_recon(xhat: jax.Array, x: jax.Array) -> jax.Array:
    """0.5 * Σ_pixels (xhat - x)^2, batch mean."""
    d = (xhat - x).astype(jnp.float32)
    axes = tuple(range(1, d.ndim))
    return 0.5 * jnp.sum(d * d, axis=axes).mean()


def l1_recon(xhat: jax.Array, x: jax.Array) -> jax.Array:
    """Σ_pixels |xhat - x|, batch mean (CelebA family)."""
    d = jnp.abs(xhat - x).astype(jnp.float32)
    axes = tuple(range(1, d.ndim))
    return jnp.sum(d, axis=axes).mean()


def kl_std_normal(mean: jax.Array, logvar: jax.Array) -> jax.Array:
    """0.5 * Σ_j (mean² - logvar + e^logvar - 1), batch mean."""
    mean = mean.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    kl = jnp.sum(mean ** 2 - logvar + jnp.exp(logvar) - 1.0, axis=1)
    return 0.5 * kl.mean()


def kl_std_normal_free_bits(mean: jax.Array, logvar: jax.Array,
                            free_bits: float) -> jax.Array:
    """Free-bits KL (Kingma et al., IAF-VAE appendix): per-LATENT-DIM
    batch-mean KL floored at ``free_bits`` nats before summing —
    dimensions already below the floor stop receiving KL gradient, the
    standard posterior-collapse mitigation. ``free_bits=0`` reduces
    exactly to :func:`kl_std_normal`. Opt-in deviation (the reference's
    objective, modules/train.py:180-186, has no floor); used by
    ``cli.main --free_bits`` for the round-4 collapse-mitigation A/B."""
    mean = mean.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    kl_dim = 0.5 * (mean ** 2 - logvar + jnp.exp(logvar) - 1.0).mean(axis=0)
    return jnp.maximum(kl_dim, free_bits).sum()


def alignment_bce(align_latent: jax.Array, labels: jax.Array) -> jax.Array:
    """BCE(sigmoid(align_latent), labels) summed over nodes, batch mean.

    Computed in the numerically stable logits form. Equal to the
    reference's sigmoid-then-binary_cross_entropy (modules/train.py:189)
    everywhere the sigmoid is representable; once a logit saturates past
    float range (|z| ≳ 90) torch's internal log clamp plateaus while this
    form keeps growing linearly with gradient sign(z)-y — a deliberate
    deviation (the stable form is strictly better-behaved for training,
    and no validated run reaches that regime).
    """
    z = align_latent.astype(jnp.float32)
    return jnp.sum(stable_bce(z, labels.astype(z.dtype)), axis=1).mean()


def stable_bce(z: jax.Array, y: jax.Array) -> jax.Array:
    """Elementwise BCE-with-logits in the numerically stable form
    ``max(z,0) - z*y + log(1+exp(-|z|))`` — the single definition used by
    every LOGIT head (alignment, the adult income recon). Heads that emit
    probabilities use clipped_bce_probs below."""
    return jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))


def clipped_bce_probs(p: jax.Array, y: jax.Array,
                      eps: float = 1e-7) -> jax.Array:
    """Elementwise BCE in probability space with clipping — the analogue of
    torch ``BCELoss`` on sigmoid outputs, the single definition for the
    heads the reference trains/scores on probabilities: the
    DownstreamClassifier fits (sample_efficiency.py, DR/robustness.py),
    toyDR, and the alignment-CE diagnostic (inference.py:231-236).
    Deliberately NOT rewritten as stable_bce: these sites replicate the
    reference's BCELoss numerics, where gradients saturate under the clip
    once |logit| exceeds ~16."""
    p = jnp.clip(p, eps, 1.0 - eps)
    return -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))


def infomax_mi(d_joint: jax.Array, d_marginal: jax.Array) -> jax.Array:
    """Negative f-divergence MI lower bound:
    MI = -( E[D(x, eps)] - E[exp(D(x, eps_perm) - 1)] )."""
    return -(d_joint.mean() - jnp.exp(d_marginal - 1.0).mean())


def posterior_variance(logvar: jax.Array) -> jax.Array:
    """Per-node mean posterior variance, the reference's debug telemetry
    (modules/train.py:193-196). Returns [node]."""
    return jnp.exp(logvar).mean(axis=0)

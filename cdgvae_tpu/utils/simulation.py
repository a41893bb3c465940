"""Seeding and DAG utilities (reference modules/simulation.py)."""
from __future__ import annotations

import random

import numpy as np

from ..ops.causal import is_dag  # noqa: F401  (re-export; igraph-free)


def set_random_seed(seed: int):
    """Seed host-side RNGs (reference modules/simulation.py:9-19). Device
    randomness in this framework is handled by explicit jax.random keys, so
    no global device seed exists — pass jax.random.key(seed) to the model."""
    np.random.seed(seed)
    random.seed(seed)


def count_accuracy(B_true: np.ndarray, B_est: np.ndarray) -> dict:
    """NOTEARS-style structure metrics between binary DAG adjacencies:
    fdr, tpr, fpr, shd, nnz (reference modules/simulation.py:31-76)."""
    if not ((B_est == 0) | (B_est == 1)).all():
        raise ValueError("B_est should take value in {0,1}")
    if not is_dag(B_est):
        raise ValueError("B_est should be a DAG")
    d = B_true.shape[0]
    pred = np.flatnonzero(B_est == 1)
    cond = np.flatnonzero(B_true)
    cond_reversed = np.flatnonzero(B_true.T)
    cond_skeleton = np.concatenate([cond, cond_reversed])
    true_pos = np.intersect1d(pred, cond, assume_unique=True)
    false_pos = np.setdiff1d(pred, cond_skeleton, assume_unique=True)
    reverse = np.intersect1d(
        np.setdiff1d(pred, cond, assume_unique=True), cond_reversed,
        assume_unique=True)
    pred_size = len(pred)
    cond_neg_size = 0.5 * d * (d - 1) - len(cond)
    fdr = float(len(reverse) + len(false_pos)) / max(pred_size, 1)
    tpr = float(len(true_pos)) / max(len(cond), 1)
    fpr = float(len(reverse) + len(false_pos)) / max(cond_neg_size, 1)
    pred_lower = np.flatnonzero(np.tril(B_est + B_est.T))
    cond_lower = np.flatnonzero(np.tril(B_true + B_true.T))
    extra_lower = np.setdiff1d(pred_lower, cond_lower, assume_unique=True)
    missing_lower = np.setdiff1d(cond_lower, pred_lower, assume_unique=True)
    shd = len(extra_lower) + len(missing_lower) + len(reverse)
    return {"fdr": fdr, "tpr": tpr, "fpr": fpr, "shd": shd, "nnz": pred_size}

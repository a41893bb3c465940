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
    """Structure-recovery metrics between DAG adjacencies: fdr, tpr, fpr,
    shd, nnz. Same NOTEARS-lineage definitions as the reference
    (modules/simulation.py:31-76, dead code there too), computed here on
    boolean edge masks: an estimated edge is *correct* if the truth has it
    with the same orientation, *reversed* if only the flipped edge exists,
    and *spurious* if the skeleton lacks it entirely; SHD is the undirected
    skeleton mismatch plus one per reversed edge."""
    truth = np.asarray(B_true) != 0
    est = np.asarray(B_est)
    if not np.isin(est, (0, 1)).all():
        raise ValueError("B_est should take value in {0,1}")
    if not is_dag(est):
        raise ValueError("B_est should be a DAG")
    est = est == 1
    d = truth.shape[0]

    correct = est & truth
    flipped = est & truth.T & ~truth
    spurious = est & ~(truth | truth.T)
    n_wrong = int(flipped.sum() + spurious.sum())
    n_pred = int(est.sum())
    n_true = int(truth.sum())
    n_negative = d * (d - 1) / 2 - n_true

    lower = np.tril_indices(d)
    skel_est = (est | est.T)[lower]
    skel_true = (truth | truth.T)[lower]
    shd = int((skel_est != skel_true).sum() + flipped.sum())

    return {"fdr": n_wrong / max(n_pred, 1),
            "tpr": float(correct.sum()) / max(n_true, 1),
            "fpr": n_wrong / max(n_negative, 1),
            "shd": shd, "nnz": n_pred}

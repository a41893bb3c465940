"""Tabular synthetic-data evaluation: reconstruction/synthesis, PC CPDAGs,
SHD vs the real-data CPDAG, and ML efficacy
(library form of reference tabular/inference.py and inference_tvae.py)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp




def gumbel_argmax(logits: np.ndarray, rng: np.random.Generator,
                  eps: float = 1e-20) -> np.ndarray:
    """Gumbel-max categorical sampling (reference tabular/inference.py:202-205;
    the reference's G = log(-log(U)) sign quirk amounts to a perturbed
    argmax — we use the standard Gumbel -log(-log(U)), matching the
    intended sampling semantics)."""
    u = rng.uniform(size=logits.shape)
    g = -np.log(-np.log(u + eps) + eps)
    # argmax is invariant to the per-row log-softmax constant, so perturb
    # the raw logits directly (identical samples, no exp/sum/log pass)
    return np.argmax(logits + g, axis=1)


def reconstruct_dataset(model, params, x_data, dataset: str,
                        seed: int = 0, batch_size: int = 1024) -> np.ndarray:
    """Deterministic reconstructions of the training data
    (inference.py:209-223), with Gumbel-sampled Cover_Type for covtype."""
    fwd = jax.jit(lambda p, x: model(p, x, deterministic=True).xhat)
    outs = [np.asarray(fwd(params, x_data[i: i + batch_size]))
            for i in range(0, len(x_data), batch_size)]
    recon = np.concatenate(outs, axis=0)
    if dataset == "covtype":
        rng = np.random.default_rng(seed)
        cat = gumbel_argmax(recon[:, 7:], rng)[:, None] + 1.0
        recon = np.concatenate([recon[:, :7], cat], axis=1)
    return recon


def sample_synthetic(model, params, n: int, dataset: str,
                     seed: int = 0) -> np.ndarray:
    """Synthetic data: z ~ N(0, I) -> causal transform -> decode
    (inference.py:226-241)."""
    randn = jax.random.normal(jax.random.key(seed), (n, model.node))

    @jax.jit
    def gen(params, z):
        _, latent, _ = model.graph.transform(params["causal"], z)
        dec = model.decode(params, latent)
        return dec[1] if isinstance(dec, tuple) else dec

    sample = np.asarray(gen(params, randn))
    if dataset == "covtype":
        rng = np.random.default_rng(seed)
        cat = gumbel_argmax(sample[:, 7:], rng)[:, None] + 1.0
        sample = np.concatenate([sample[:, :7], cat], axis=1)
    return sample


def sample_synthetic_tvae(model, params, transformer, n: int,
                          seed: int = 0) -> pd.DataFrame:
    """CDG-TVAE synthetic sampling: decode -> tanh -> DataTransformer
    inverse with the learned sigmas (inference_tvae.py:286-310)."""
    randn = jax.random.normal(jax.random.key(seed), (n, model.node))

    @jax.jit
    def gen(params, z):
        _, latent, _ = model.graph.transform(params["causal"], z)
        _, xhat = model.decode(params, latent)
        return jnp.tanh(xhat)

    xhat = np.asarray(gen(params, randn))
    sigmas = np.asarray(params["sigma"])
    return transformer.inverse_transform(xhat, sigmas=sigmas)


def to_frame(recon: np.ndarray, topology, continuous,
             binarize_income: bool = True) -> pd.DataFrame:
    """Model output (topology column order) -> DataFrame in the dataset's
    original column order (inference.py:244-251)."""
    cols = [c for grp in topology for c in grp]
    df = pd.DataFrame(recon, columns=cols)[continuous]
    if binarize_income and "income" in df.columns:
        df["income"] = (df["income"] > 0).astype(int)
    return df


def real_cpdag(frame: pd.DataFrame, dataset: str, alpha: float = 0.05):
    """PC CPDAG of the REAL train data with the reference's
    independence-test choice: chisq for loan/adult, fisherz for covtype
    (inference.py:111-125, inference_tvae.py:189-222). Model outputs
    (reconstructions / synthetic samples) always use fisherz — the
    decoder emits continuous values (inference.py:250-252, :277-279)."""
    from ..utils.pc import pc
    i_test = "fisherz" if dataset == "covtype" else "chisq"
    G, _ = pc(frame.to_numpy(), alpha=alpha, indep_test=i_test)
    return G


def zscore_synthetic(raw_df: pd.DataFrame, train, spec,
                     dataset: str) -> pd.DataFrame:
    """Normalize TVAE synthetic output against the train statistics so PC
    and ML efficacy operate on the real frames' scale (reference
    inference_tvae.py); adult's binary income column is re-binarized at
    0.5 (covtype's 7-way Cover_Type is already integer-decoded)."""
    sample_df = raw_df[train.continuous].copy()
    scaling = [c for c in train.continuous
               if c not in spec["zscore_exclude"]]
    mu, sd = train.frame[scaling].mean(), train.frame[scaling].std()
    sample_df[scaling] = (sample_df[scaling] - sample_df[scaling].mean()) \
        / sample_df[scaling].std() * sd.to_numpy() + mu.to_numpy()
    target = spec["target"]
    if dataset == "adult" and target in sample_df.columns:
        sample_df[target] = (sample_df[target] > 0.5).astype(int)
    return sample_df


def efficacy(sample_df: pd.DataFrame, test_frame: pd.DataFrame,
             spec) -> float:
    """Mean train-on-synthetic/test-on-real score (R² for regression
    specs, micro-F1 for classification — reference evaluation.py)."""
    from .ml_efficacy import regression_eval, classification_eval
    ev = (regression_eval if spec["task"] == "regression"
          else classification_eval)
    return float(np.mean([v for _, v in
                          ev(sample_df, test_frame, spec["target"])]))

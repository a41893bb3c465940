"""Toy distributional-robustness experiment (reference DR/toyDR.py).

Compares three classifiers under a spurious-correlation shift (appendix
Table 9): logistic regression on the causal feature alone ("disentangled"),
logistic regression on all features (ERM), and a trained 2->1->1 linear
"entangled" model. Logistic fits use sklearn (no intercept, no penalty — the
semantics of the reference's statsmodels ``sm.Logit`` on raw features); the
entangled model trains on device in JAX.
"""
from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..ops.losses import clipped_bce_probs
from .common import add_platform_arg


def generate(seed: int = 0, n: int = 10000, ratio: float = 0.9):
    """The toy DGP (reference DR/toyDR.py:13-53). ``ratio`` controls the
    spurious correlation strength (0.9 train, 0.5 test)."""
    rng = np.random.RandomState(seed)
    x1 = rng.normal(size=(n, 1))
    z1 = x1  # gamma = 1
    y = rng.binomial(1, 1.0 / (1.0 + np.exp(-2.0 * z1)))  # beta = 2

    x2 = np.zeros((n, 1))
    pos, neg = np.where(y == 1)[0], np.where(y == 0)[0]
    x2[pos[: int(ratio * len(pos))]] = 2
    x2[pos[int(ratio * len(pos)):]] = -2
    x2[neg[: int(ratio * len(neg))]] = -2
    x2[neg[int(ratio * len(neg)):]] = 2
    x2 = rng.normal(loc=x2)
    z2 = (x2 > 0).astype(float) + x2  # alpha = 1
    return (np.concatenate([x1, x2], 1), np.concatenate([z1, z2], 1),
            y.astype(np.float32))


def fit_logistic(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    from sklearn.linear_model import LogisticRegression
    m = LogisticRegression(fit_intercept=False, penalty=None, max_iter=1000)
    m.fit(X, y.ravel())
    return m.coef_.ravel()


def logistic_acc(w, X, y) -> float:
    p = 1.0 / (1.0 + np.exp(-(X @ w)))
    return float(((p > 0.5).astype(float) == y.ravel()).mean())


def train_entangled(x, y, seed: int = 1, epochs: int = 20,
                    batch_size: int = 128, lr: float = 0.005):
    """2 -> 1 -> 1 linear sigmoid model, no biases (toyDR.py:97-120)."""
    k1, k2 = jax.random.split(jax.random.key(seed))
    params = {"w1": jax.random.normal(k1, (2, 1)) / np.sqrt(2),
              "w2": jax.random.normal(k2, (1, 1))}
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            pred = jax.nn.sigmoid(xb @ p["w1"] @ p["w2"])
            return clipped_bce_probs(pred, yb).mean()

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    x_dev, y_dev = jnp.asarray(x, jnp.float32), jnp.asarray(y)
    for _ in range(epochs):
        perm = rng.permutation(len(x))
        for i in range(0, len(x), batch_size):
            idx = perm[i: i + batch_size]
            params, opt_state, _ = step(params, opt_state, x_dev[idx],
                                        y_dev[idx])
    return params


def entangled_acc(params, x, y) -> float:
    pred = np.asarray(jax.nn.sigmoid(
        jnp.asarray(x, jnp.float32) @ params["w1"] @ params["w2"]))
    return float(((pred > 0.5).astype(float) == y).mean())


def main(argv=None):
    parser = argparse.ArgumentParser("parameters")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--n", type=int, default=10000)
    add_platform_arg(parser)
    args = parser.parse_args(argv)

    x, z, y = generate(args.seed, args.n, ratio=0.9)
    tx, tz, ty = generate(args.seed + 1, args.n, ratio=0.5)

    results = {}
    w = fit_logistic(z[:, :1], y)
    results["Disentangled"] = (logistic_acc(w, z[:, :1], y),
                               logistic_acc(w, tz[:, :1], ty))
    w = fit_logistic(x, y)
    results["ERM"] = (logistic_acc(w, x, y), logistic_acc(w, tx, ty))
    p = train_entangled(x, y, seed=1)
    results["Entangled"] = (entangled_acc(p, x, y), entangled_acc(p, tx, ty))

    for name, (tr, te) in results.items():
        print(f"{name} model: train accuracy {tr * 100:.2f}%, "
              f"test accuracy {te * 100:.2f}%")
    return results


if __name__ == "__main__":
    main()

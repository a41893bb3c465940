"""Multi-seed CDM study for ONLINE (fresh-data-per-step) training.

Capability study beyond the reference: train CDG-VAE with
``train/online.py`` — every step draws a fresh batch from the
pendulum_real DGP and rasterizes it on device inside the compiled scan
(infinite data; the reference's matplotlib->PNG->PIL pipeline cannot
express this) — at the reference protocol's step count (100 epochs x
len(train)/128 steps, lr 1e-3, beta 0.1, lambda 5; reference
main.py:93-107). Evaluation matches the fixed-dataset study exactly so
the numbers are comparable: the CDM factor classifier is trained on the
seed's FIXED dataset draw and the 4x4 CDM matrices are computed on it
(scripts/cdm_seeds.py protocol).

Writes docs/results/online_seeds.json and prints mean/std tables next to
the fixed-dataset study's numbers.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cdgvae_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import optax  # noqa: E402

from cdgvae_tpu.factory import build_pendulum_model  # noqa: E402
from cdgvae_tpu.data.pendulum import PendulumDataset  # noqa: E402
from cdgvae_tpu.train.online import (make_online_scanned_steps,  # noqa: E402
                                     make_online_scanned_steps_semi)
from cdgvae_tpu.train.scanned import make_scanned_epochs  # noqa: E402
from cdgvae_tpu.cli.main_classifier import classifier_masks  # noqa: E402
from cdgvae_tpu.models.classifier import FactorClassifier  # noqa: E402
from cdgvae_tpu.ops.losses import alignment_bce  # noqa: E402
from cdgvae_tpu.eval.metric import cdm_matrices  # noqa: E402

CONFIG = dict(model="CDGVAE", node=4, scm="linear", flow_num=1,
              inverse_loop=100, factor=[1, 1, 2], image_size=64,
              adjacency_scaling=True, epochs=100, batch_size=128,
              lr=0.001, beta=0.1, **{"lambda": 5.0})

# no-causal-path cells (scripts/cdm_seeds.py): CDM must be exactly 0
PROTECTED = [(0, 1), (1, 0), (2, 0), (2, 1), (3, 0), (3, 1)]


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_seed(seed: int, scm: str, semi: bool = False):
    CONFIG["scm"] = scm
    ds = PendulumDataset(image_size=64, train=True, seed=seed)
    x = jax.device_put(ds.x_data)
    y = jax.device_put(ds.y_data)

    model, _ = build_pendulum_model(CONFIG)
    params = model.init(jax.random.key(seed))
    opt = optax.adam(CONFIG["lr"])
    steps_per_epoch = len(ds.x_data) // CONFIG["batch_size"]
    t0 = time.time()
    if semi:
        # online semi protocol: INFINITE unlabeled stream; alignment on
        # the seed's fixed 10%-labeled subset (batch_sizeL=32, reference
        # main_semi.py:99), comparable to the cdm_seeds --semi study
        lds = PendulumDataset(image_size=64, train=True,
                              labeled_ratio=0.1, seed=seed)
        x_l = jax.device_put(lds.x_data)
        y_l = jax.device_put(lds.y_data)
        run = make_online_scanned_steps_semi(
            model, opt, CONFIG["beta"], CONFIG["lambda"],
            CONFIG["batch_size"], batch_size_l=32,
            n_steps_per_call=steps_per_epoch * CONFIG["epochs"],
            image_size=64, norm_seed=seed)
        params, _, m = run(params, opt.init(params), x_l, y_l,
                           jax.random.key(seed + 1000), 0)
    else:
        run = make_online_scanned_steps(
            model, opt, CONFIG["beta"], CONFIG["lambda"],
            CONFIG["batch_size"],
            n_steps_per_call=steps_per_epoch * CONFIG["epochs"],
            image_size=64, norm_seed=seed)
        params, _, m = run(params, opt.init(params),
                           jax.random.key(seed + 1000), 0)
    jax.block_until_ready(m["loss"])
    loss_tail = float(np.asarray(m["loss"])[-1])
    t_train = time.time() - t0

    # identical eval to the fixed-dataset study: classifier + CDM on the
    # seed's fixed dataset draw
    masks = classifier_masks(64, 4)
    clf = FactorClassifier(masks, 4, 64)
    copt = optax.adam(1e-3)

    def cstep(p, o, xb, yb, rng):
        def lf(p):
            loss = alignment_bce(clf(p, xb), yb[:, :4])
            return loss, {"loss": loss}
        (loss, mm), g = jax.value_and_grad(lf, has_aux=True)(p)
        up, o = copt.update(g, o, p)
        return optax.apply_updates(p, up), o, mm

    crun = make_scanned_epochs(cstep, batch_size=CONFIG["batch_size"],
                               n_epochs_per_call=50)
    cinit = clf.init(jax.random.key(seed + 2000))
    cparams, _, cm = crun(cinit, copt.init(cinit), x, y,
                          jax.random.key(seed + 3000), 0)
    jax.block_until_ready(cm["loss"])

    t0 = time.time()
    lower, upper = cdm_matrices(model, params, clf, cparams, x,
                                batch_size=1024)
    log(f"seed {seed}: online train {t_train:.1f}s "
        f"(loss tail {loss_tail:.1f}), CDM {time.time() - t0:.1f}s, diag "
        f"{np.round(np.diag(upper), 3).tolist()}, protected max "
        f"{max(upper[i][j] for i, j in PROTECTED):.6f}")
    return np.asarray(lower), np.asarray(upper)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--scm", default="linear",
                    choices=["linear", "nonlinear"])
    ap.add_argument("--semi", action="store_true",
                    help="online SEMI-supervised protocol: infinite "
                         "unlabeled stream + the seed's fixed 10%%-labeled "
                         "subset (comparable to cdm_seeds --semi)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if not args.out:
        suffix = "" if args.scm == "linear" else f"_{args.scm}"
        if args.semi:
            suffix += "_semi"
        args.out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs", "results", f"online_seeds{suffix}.json")

    lowers, uppers = [], []
    for seed in range(1, args.seeds + 1):
        lo, up = run_seed(seed, args.scm, semi=args.semi)
        lowers.append(lo)
        uppers.append(up)

    lowers, uppers = np.stack(lowers), np.stack(uppers)
    protected_vals = np.array([uppers[:, i, j] for i, j in PROTECTED])
    out = {
        "config": {**CONFIG, "scm": args.scm, "online": True,
                   "semi": args.semi, "seeds": args.seeds},
        "lower_mean": lowers.mean(0).tolist(),
        "lower_std": lowers.std(0).tolist(),
        "upper_mean": uppers.mean(0).tolist(),
        "upper_std": uppers.std(0).tolist(),
        "upper_per_seed": uppers.tolist(),
        "protected_max": float(protected_vals.max()),
        "protected_all_zero": bool((protected_vals == 0).all()),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {args.out}")
    log(f"upper diag mean+/-std: "
        f"{[f'{m:.3f}+/-{s:.3f}' for m, s in zip(np.diag(uppers.mean(0)), np.diag(uppers.std(0)))]}")
    log(f"protected max {out['protected_max']:.6f} "
        f"(all-zero: {out['protected_all_zero']})")


if __name__ == "__main__":
    main()

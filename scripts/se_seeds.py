"""Multi-seed sample-efficiency study: the paper reports sample
efficiency (paper Table 2: acc(100 labels)/acc(all labels), 10 repeats)
as a point estimate per model; this measures mean +/- std over fresh
seeds at the reference protocol (100 epochs, batch 128, lr 1e-3,
beta=0.1, lambda=5 — reference main.py:93-107, sample_efficiency.py).

Per seed: fresh pendulum_real dataset draw + fresh init + 100-epoch
train + the 10-repeat downstream protocol. All seeds share one process so
every seed after the first reuses the compiled XLA programs.

Writes docs/results/se_seeds.json.
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
from cdgvae_tpu.train.scanned import (make_scanned_epochs,  # noqa: E402
                                      unjitted_step)
from cdgvae_tpu.eval.downstream import sample_efficiency  # noqa: E402

CONFIG = dict(model="CDGVAE", node=4, scm="linear", flow_num=1,
              inverse_loop=100, factor=[1, 1, 2], image_size=64,
              adjacency_scaling=True, epochs=100, batch_size=128,
              lr=0.001, beta=0.1, **{"lambda": 5.0})


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_seed(seed: int, scm: str, n: int = 10000):
    CONFIG["scm"] = scm
    ds = PendulumDataset(image_size=64, train=True, seed=seed, n=n)
    x = jax.device_put(ds.x_data)
    y = jax.device_put(ds.y_data)

    model, _ = build_pendulum_model(CONFIG)
    params = model.init(jax.random.key(seed))
    opt = optax.adam(CONFIG["lr"])
    step = unjitted_step(model, opt, CONFIG["beta"], CONFIG["lambda"])
    run = make_scanned_epochs(step, batch_size=CONFIG["batch_size"],
                              n_epochs_per_call=CONFIG["epochs"])
    t0 = time.time()
    params, _, m = run(params, opt.init(params), x, y,
                       jax.random.key(seed + 1000), 0)
    jax.block_until_ready(m["loss"])
    t_train = time.time() - t0

    # downstream protocol wants raw (un-normalized) labels for the
    # target logit (reference sample_efficiency.py:176)
    tr = PendulumDataset(image_size=64, train=True, downstream=True,
                         seed=seed, n=n)
    te = PendulumDataset(image_size=64, train=False, downstream=True,
                         seed=seed, n=n)
    res = sample_efficiency(model, params,
                            jax.device_put(tr.x_data), tr.y_data,
                            jax.device_put(te.x_data), te.y_data,
                            seed=seed, repeats=10)
    log(f"seed {seed}: train {t_train:.0f}s, "
        f"loss tail {float(np.asarray(m['loss'])[-1]):.1f}, "
        f"acc100 {res['accuracy_100']:.4f} "
        f"accall {res['accuracy_all']:.4f} "
        f"SE {res['sample_efficiency']:.4f}")
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--scm", default="linear",
                    choices=["linear", "nonlinear"])
    ap.add_argument("--epochs", type=int, default=100,
                    help="reference protocol is 100; lower only for smoke")
    ap.add_argument("--n", type=int, default=10000,
                    help="DGP sample count (reference 10000)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if not args.out:
        suffix = "" if args.scm == "linear" else f"_{args.scm}"
        args.out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs", "results", f"se_seeds{suffix}.json")

    CONFIG["epochs"] = args.epochs
    results = [run_seed(s, args.scm, args.n)
               for s in range(1, args.seeds + 1)]
    se = np.array([r["sample_efficiency"] for r in results])
    a100 = np.array([r["accuracy_100"] for r in results])
    aall = np.array([r["accuracy_all"] for r in results])
    summary = {
        "protocol": "reference main.py:93-107 train + "
                    "sample_efficiency.py 10-repeat downstream, "
                    "one full run per seed",
        "scm": args.scm,
        "seeds": list(range(1, args.seeds + 1)),
        "per_seed": results,
        "se_mean": round(float(se.mean()), 4),
        "se_std": round(float(se.std()), 4),
        "acc100_mean": round(float(a100.mean()), 4),
        "accall_mean": round(float(aall.mean()), 4),
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    log(f"SE {summary['se_mean']} +/- {summary['se_std']} "
        f"(acc100 {summary['acc100_mean']}, accall "
        f"{summary['accall_mean']})")
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""DR hyperparameter study: can stronger alignment keep the spurious
background out of the causal latents?

docs/RESULTS.md documents that at the reference's published DR
hyperparameters (β=0.1, λ=20) the background leaks into the angle latent
and the worst-group robustness collapses. The reference publishes no
pendulum-DR robustness numbers, so this sweep (reference-faithful protocol,
only β/λ varied) maps the landscape. Writes docs/results/dr_sweep.json.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdgvae_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from cdgvae_tpu.factory import build_pendulum_model  # noqa: E402
from cdgvae_tpu.data.pendulum_dr import PendulumDRDataset  # noqa: E402
from cdgvae_tpu.train.scanned import (make_scanned_epochs,  # noqa: E402
                                      unjitted_step)
from cdgvae_tpu.eval.downstream import (robustness,  # noqa: E402
                                        extract_representations)


def run_config(beta, lam, x, y, x_te, y_te, ds_tr, ds_te, epochs=100,
               seed=1, scm="linear", online=False, repeats=10,
               detail=False):
    config = dict(model="CDGVAE", node=5, scm=scm, flow_num=1,
                  inverse_loop=100, factor=[1, 1, 2], image_size=64,
                  adjacency_scaling=True)
    model, _ = build_pendulum_model(config, spurious=True)
    params = model.init(jax.random.key(seed))
    opt = optax.adam(1e-3)
    t0 = time.time()
    if online:
        # fresh-data-per-step at the same step count; eval below stays on
        # the fixed splits so numbers are comparable (train/online.py)
        from cdgvae_tpu.train.online import (make_online_scanned_steps,
                                             dr_batch_fn)
        run = make_online_scanned_steps(
            model, opt, beta, lam, 128,
            n_steps_per_call=(len(x) // 128) * epochs,
            sample_batch=dr_batch_fn(128, 64, norm_seed=seed))
        params, _, ms = run(params, opt.init(params),
                            jax.random.key(seed + 1000), 0)
    else:
        step = unjitted_step(model, opt, beta, lam)
        run = make_scanned_epochs(step, batch_size=128,
                                  n_epochs_per_call=epochs)
        params, _, ms = run(params, opt.init(params), x, y,
                            jax.random.key(seed + 1000), 0)
    jax.block_until_ready(ms["loss"])
    dt = time.time() - t0
    res = robustness(model, params, ds_tr.x_data, ds_tr.y_data,
                     ds_te.x_data, ds_te.y_data, seed=0, repeats=repeats,
                     return_detail=detail)
    # leak probe: per-latent |corr| with the background on the test split
    reps = extract_representations(model, params, ds_te.x_data)
    bg = np.asarray(ds_te.y_data)[:, -2]
    leaks = [round(abs(float(np.corrcoef(reps[:, j], bg)[0, 1])), 2)
             for j in range(reps.shape[1])]
    return {"beta": beta, "lambda": lam, "epochs": epochs, "seed": seed,
            "scm": scm, "online": online,
            "train_s": round(dt, 1),
            "final_loss": round(float(np.asarray(ms["loss"])[-1]), 1),
            "avg_accuracy": round(res["avg_accuracy"], 4),
            "worst_group_accuracy": round(res["worst_group_accuracy"], 4),
            "bg_corr_per_latent": leaks,
            **({"per_repeat_avg": res["per_repeat_avg"],
                "per_repeat_worst": res["per_repeat_worst"]}
               if detail else {})}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="",
                    help="default: docs/results/dr_sweep.json, suffixed "
                         "_<scm> for non-linear so runs don't clobber "
                         "each other")
    ap.add_argument("--seeds", type=int, default=1,
                    help="repeat every config for seeds 1..N (model init, "
                         "train RNG and dataset draw all vary per seed)")
    ap.add_argument("--lams", type=float, nargs="*", default=None,
                    help="restrict the sweep to these lambda values "
                         "(beta fixed 0.1); default: the full 6-config "
                         "beta/lambda grid")
    ap.add_argument("--scm", default="linear",
                    choices=["linear", "nonlinear"])
    ap.add_argument("--repeats", type=int, default=10,
                    help="downstream-classifier refits per config "
                         "(reference DR/robustness.py: 10)")
    ap.add_argument("--detail", action="store_true",
                    help="record per-repeat avg/worst-group accuracies — "
                         "separates representation-level failures (all "
                         "repeats low) from the downstream-fit lottery "
                         "(high repeat spread); round-4 λ=20 dip "
                         "diagnosis")
    ap.add_argument("--online", action="store_true",
                    help="train with fresh-data-per-step (train/online.py)"
                         " instead of the fixed dataset; eval unchanged")
    args = ap.parse_args()
    if not args.out:
        suffix = "" if args.scm == "linear" else f"_{args.scm}"
        suffix += "_online" if args.online else ""
        args.out = f"docs/results/dr_sweep{suffix}.json"

    grid = ([(0.1, lam) for lam in args.lams] if args.lams else
            [(0.1, 20.0), (0.1, 40.0), (0.1, 80.0),
             (0.01, 20.0), (0.01, 80.0), (0.5, 20.0)])

    results = []
    for seed in range(1, args.seeds + 1):
        ds_tr = PendulumDRDataset(image_size=64, train=True, seed=seed,
                                  downstream=True)
        ds_te = PendulumDRDataset(image_size=64, train=False, seed=seed,
                                  downstream=True)
        # training labels: normalized (downstream=False)
        ds_align = PendulumDRDataset(image_size=64, train=True, seed=seed)
        x = jax.device_put(ds_align.x_data)
        y = jax.device_put(ds_align.y_data)
        for beta, lam in grid:
            r = run_config(beta, lam, x, y, None, None, ds_tr, ds_te,
                           seed=seed, scm=args.scm, online=args.online,
                           repeats=args.repeats, detail=args.detail)
            print(json.dumps(r), flush=True)
            results.append(r)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

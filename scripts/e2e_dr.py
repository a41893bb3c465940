"""End-to-end DR validation: train the spurious-latent CDG-VAE, then the
distributional-robustness eval (average vs worst-group accuracy with the
spurious latent dropped)."""
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
from cdgvae_tpu.data.pendulum_dr import PendulumDRDataset  # noqa: E402
from cdgvae_tpu.train.scanned import (make_scanned_epochs,  # noqa: E402
                                      unjitted_step)
from cdgvae_tpu.utils.checkpoint import (save_checkpoint,  # noqa: E402
                                         load_checkpoint)

CONFIG = dict(model="CDGVAE", node=5, scm="linear", flow_num=1,
              inverse_loop=100, factor=[1, 1, 2], image_size=64,
              adjacency_scaling=True, seed=1, epochs=100, batch_size=128,
              lr=0.001, beta=0.1, **{"lambda": 20.0})


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/e2e_dr")
    ap.add_argument("--epochs", type=int, default=100)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    log("rendering DR dataset")
    train_ds = PendulumDRDataset(image_size=64, train=True, seed=1)
    x = jax.device_put(train_ds.x_data)
    y = jax.device_put(train_ds.y_data)
    log(f"train {train_ds.x_data.shape}")

    ckpt_dir = os.path.join(args.out, "model_DR_CDGVAE_linear")
    model, _ = build_pendulum_model(CONFIG, spurious=True)
    if not os.path.exists(os.path.join(ckpt_dir, "state.pkl")):
        params = model.init(jax.random.key(1))
        opt = optax.adam(CONFIG["lr"])
        step = unjitted_step(model, opt, CONFIG["beta"], CONFIG["lambda"])
        run = make_scanned_epochs(step, batch_size=128,
                                  n_epochs_per_call=args.epochs)
        t0 = time.time()
        params, _, m = run(params, opt.init(params), x, y,
                           jax.random.key(2), 0)
        jax.block_until_ready(m["loss"])
        losses = np.asarray(m["loss"])
        log(f"DR train {args.epochs} epochs in {time.time() - t0:.1f}s; "
            f"loss {losses[0]:.1f} -> {losses[-1]:.1f}")
        save_checkpoint(ckpt_dir, params, step=args.epochs, config=CONFIG)
    else:
        log("train cached")
    params = jax.device_put(load_checkpoint(ckpt_dir)["params"])

    res_path = os.path.join(args.out, "robustness.json")
    if not os.path.exists(res_path):
        from cdgvae_tpu.eval.downstream import robustness
        tr = PendulumDRDataset(image_size=64, train=True, downstream=True,
                               seed=1)
        te = PendulumDRDataset(image_size=64, train=False, downstream=True,
                               seed=1)
        t0 = time.time()
        res = robustness(model, params,
                         jax.device_put(tr.x_data), tr.y_data,
                         jax.device_put(te.x_data), te.y_data,
                         seed=1, repeats=10, epochs=500)
        log(f"robustness in {time.time() - t0:.1f}s: {res}")
        # compare: keep the spurious latent (entangled baseline behavior)
        res_sp = robustness(model, params,
                            jax.device_put(tr.x_data), tr.y_data,
                            jax.device_put(te.x_data), te.y_data,
                            seed=1, repeats=10, epochs=500,
                            drop_last_latent=False)
        log(f"robustness (spurious kept): {res_sp}")
        with open(res_path, "w") as f:
            json.dump({"dropped": res, "kept": res_sp}, f)
    else:
        log("robustness cached: " + open(res_path).read())
    log("DR E2E COMPLETE")


if __name__ == "__main__":
    main()

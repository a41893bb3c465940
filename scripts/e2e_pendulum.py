"""End-to-end pendulum validation on real hardware.

Stages (each checkpointed; rerun skips completed stages):
  1. train CDG-VAE (linear SCM) 100 epochs with the scan-compiled trainer
  2. train the CDM factor classifier 50 epochs
  3. CDM metric matrices (expect structural zeros off the causal paths)
  4. do-intervention grid + recon diagnostics
  5. downstream sample efficiency

Writes results to --out (default /tmp/e2e) and prints a summary.
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
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from cdgvae_tpu.factory import build_pendulum_model  # noqa: E402
from cdgvae_tpu.data.pendulum import PendulumDataset  # noqa: E402
from cdgvae_tpu.train.scanned import (make_scanned_epochs,  # noqa: E402
                                      unjitted_step)
from cdgvae_tpu.utils.checkpoint import (save_checkpoint,  # noqa: E402
                                         load_checkpoint)
from cdgvae_tpu.utils.simulation import set_random_seed  # noqa: E402

CONFIG = dict(model="CDGVAE", node=4, scm="linear", flow_num=1,
              inverse_loop=100, factor=[1, 1, 2], image_size=64,
              adjacency_scaling=True, label_normalization=True,
              labeled_ratio=1.0, seed=1, epochs=100, batch_size=128,
              lr=0.001, beta=0.1, **{"lambda": 5.0})


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/e2e")
    ap.add_argument("--epochs", type=int, default=100)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    set_random_seed(1)

    log("loading dataset (device-side render)")
    ds = PendulumDataset(image_size=64, train=True, seed=1)
    x = jax.device_put(ds.x_data)
    y = jax.device_put(ds.y_data)
    log(f"dataset {ds.x_data.shape}")

    # ---- stage 1: train CDG-VAE -----------------------------------------
    ckpt_model = os.path.join(args.out, "model_CDGVAE_linear")
    if not os.path.exists(os.path.join(ckpt_model, "state.pkl")):
        model, _ = build_pendulum_model(CONFIG)
        params = model.init(jax.random.key(1))
        opt = optax.adam(CONFIG["lr"])
        opt_state = opt.init(params)
        step = unjitted_step(model, opt, CONFIG["beta"], CONFIG["lambda"])
        run = make_scanned_epochs(step, batch_size=128,
                                  n_epochs_per_call=args.epochs)
        t0 = time.time()
        params, opt_state, m = run(params, opt_state, x, y,
                                   jax.random.key(2), 0)
        jax.block_until_ready(m["loss"])
        losses = np.asarray(m["loss"])
        log(f"trained {args.epochs} epochs in {time.time() - t0:.1f}s; "
            f"loss {losses[0]:.1f} -> {losses[-1]:.1f}")
        np.save(os.path.join(args.out, "loss_curve.npy"), losses)
        save_checkpoint(ckpt_model, params, opt_state=opt_state,
                        step=args.epochs, config=CONFIG)
    else:
        log("stage 1 cached")

    ck = load_checkpoint(ckpt_model)
    model, _ = build_pendulum_model(CONFIG)
    params = jax.device_put(ck["params"])

    # ---- stage 2: CDM classifier -----------------------------------------
    from cdgvae_tpu.cli.main_classifier import classifier_masks
    from cdgvae_tpu.models.classifier import FactorClassifier
    from cdgvae_tpu.ops.losses import alignment_bce

    ckpt_clf = os.path.join(args.out, "CDMClassifier")
    masks = classifier_masks(64, 4)
    clf = FactorClassifier(masks, 4, 64)
    if not os.path.exists(os.path.join(ckpt_clf, "state.pkl")):
        cparams = clf.init(jax.random.key(10))
        copt = optax.adam(1e-3)

        def cstep(p, o, xb, yb, rng):
            def lf(p):
                loss = alignment_bce(clf(p, xb), yb[:, :4])
                return loss, {"loss": loss}
            (loss, m), g = jax.value_and_grad(lf, has_aux=True)(p)
            up, o = copt.update(g, o, p)
            return optax.apply_updates(p, up), o, m

        crun = make_scanned_epochs(cstep, batch_size=128,
                                   n_epochs_per_call=50)
        t0 = time.time()
        cparams, costate, m = crun(cparams, copt.init(cparams), x, y,
                                   jax.random.key(11), 0)
        jax.block_until_ready(m["loss"])
        log(f"classifier 50 epochs in {time.time() - t0:.1f}s; "
            f"loss {np.asarray(m['loss'])[0]:.3f} -> "
            f"{np.asarray(m['loss'])[-1]:.3f}")
        save_checkpoint(ckpt_clf, cparams, step=50, config={"node": 4})
    else:
        log("stage 2 cached")
    clf_params = jax.device_put(load_checkpoint(ckpt_clf)["params"])

    # ---- stage 3: CDM metric ----------------------------------------------
    cdm_path = os.path.join(args.out, "cdm.json")
    if not os.path.exists(cdm_path):
        from cdgvae_tpu.eval.metric import cdm_matrices
        t0 = time.time()
        lower, upper = cdm_matrices(model, params, clf, clf_params, x,
                                    batch_size=1024)
        log(f"CDM in {time.time() - t0:.1f}s")
        with open(cdm_path, "w") as f:
            json.dump({"lower": lower.tolist(), "upper": upper.tolist()}, f)
        log("CDM lower:\n" + str(np.round(lower, 3)))
        log("CDM upper:\n" + str(np.round(upper, 3)))
    else:
        log("stage 3 cached")
        d = json.load(open(cdm_path))
        log("CDM lower:\n" + str(np.round(np.array(d["lower"]), 3)))

    # ---- stage 4: inference diagnostics ------------------------------------
    do_path = os.path.join(args.out, "do.png")
    if not os.path.exists(do_path):
        from cdgvae_tpu.eval.inference import (encode_dataset, latent_ranges,
                                               do_grid)
        from cdgvae_tpu.utils.viz import viz_do_grid, viz_recon_grid
        enc = encode_dataset(model, params, x, batch_size=1024)
        _, _, lmin, lmax = latent_ranges(enc)
        grid = do_grid(model, params, x[7:8], lmin, lmax)
        viz_do_grid(grid, do_path, row_names=ds.name[:4])
        out = model(params, x[:128], deterministic=True)
        viz_recon_grid(np.asarray(out.xhat[:9]),
                       os.path.join(args.out, "recon.png"))
        pv = np.exp(enc["logvar"]).mean(axis=0)
        log(f"posterior variances: {np.round(pv, 3)}")
        log("do-grid + recon written")
    else:
        log("stage 4 cached")

    # ---- stage 5: sample efficiency ---------------------------------------
    se_path = os.path.join(args.out, "sample_efficiency.json")
    if not os.path.exists(se_path):
        from cdgvae_tpu.eval.downstream import sample_efficiency
        ds_dn = PendulumDataset(image_size=64, train=True, downstream=True,
                                seed=1)
        ts_dn = PendulumDataset(image_size=64, train=False, downstream=True,
                                seed=1)
        t0 = time.time()
        res = sample_efficiency(model, params,
                                jax.device_put(ds_dn.x_data), ds_dn.y_data,
                                jax.device_put(ts_dn.x_data), ts_dn.y_data,
                                seed=1, repeats=10)
        log(f"sample efficiency in {time.time() - t0:.1f}s: {res}")
        with open(se_path, "w") as f:
            json.dump(res, f)
    else:
        log("stage 5 cached")

    log("E2E COMPLETE")


if __name__ == "__main__":
    main()

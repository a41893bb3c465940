"""Data-parallel scaling harness: sweep the dp mesh width and report
per-width training throughput (pendulum + CelebA scanned trainers).

The framework's multi-chip story is DP over ICI (SURVEY §2.7): params
replicated, batch sharded, one gradient pmean per step
(train/scanned.py::make_sharded_scanned_epochs_from_loss). Only ONE real
chip exists in this dev environment, so this harness serves two roles:

* **now** — validate the *mechanics* at every width on the virtual CPU
  mesh (run with ``--platform cpu`` after setting
  ``XLA_FLAGS=--xla_force_host_platform_device_count=8``): per-width
  runs must produce finite decreasing losses and identical step-count
  bookkeeping; the wall-clock columns are meaningless on virtual
  devices (they timeshare one host core) and are flagged as such;
* **when hardware appears** — the same one command on a real v5e-4/8
  slice reports imgs/s and ms/step per mesh width, i.e. the DP scaling
  curve (the global batch is fixed: width-N runs shard it N ways, so
  perfect scaling halves ms/step per doubling).

One command:
    python scripts/dp_sweep.py [--family pendulum|celeba|both]
        [--widths 1 2 4 8] [--batch 128] [--platform cpu]

Writes docs/results/dp_sweep_<family>.json.
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _widths(requested):
    import jax
    n = len(jax.devices())
    ws = [w for w in requested if w <= n]
    if not ws:
        raise SystemExit(f"no requested width fits the {n} visible devices")
    return ws


def sweep_pendulum(args):
    import jax
    import jax.numpy as jnp
    import optax
    from cdgvae_tpu.factory import build_pendulum_model
    from cdgvae_tpu.data.pendulum import sample_factors_real
    from cdgvae_tpu.ops.renderer import render
    from cdgvae_tpu.parallel.mesh import make_mesh
    from cdgvae_tpu.train.scanned import (
        make_scanned_epochs, unjitted_step, make_supervised_loss_fn,
        make_sharded_scanned_epochs_from_loss)
    from cdgvae_tpu.cli.common import _shard_over_dp

    config = dict(model="CDGVAE", node=4, scm="linear", flow_num=1,
                  inverse_loop=100, factor=[1, 1, 2], image_size=64,
                  adjacency_scaling=True)
    model, _ = build_pendulum_model(config)
    opt = optax.adam(1e-3)
    factors, _ = sample_factors_real(seed=1, n=args.n_data)
    x = render(jnp.asarray(factors[:, :4], jnp.float32), size=64)
    y = jnp.asarray(np.random.default_rng(0).uniform(
        size=(args.n_data, 5)).astype(np.float32))
    loss_fn = make_supervised_loss_fn(model, beta=0.1, lam=5.0)

    rows = []
    for w in _widths(args.widths):
        params = model.init(jax.random.key(0))
        opt_state = opt.init(params)
        if w == 1:
            step = unjitted_step(model, opt, beta=0.1, lam=5.0)
            run = make_scanned_epochs(step, batch_size=args.batch,
                                      n_epochs_per_call=args.epochs)
            xd, yd = x, y
        else:
            mesh = make_mesh(w)
            run = make_sharded_scanned_epochs_from_loss(
                loss_fn, opt, mesh, args.batch,
                n_epochs_per_call=args.epochs)
            xd, yd = _shard_over_dp(mesh, (x, y))
        params, opt_state, m = run(params, opt_state, xd, yd,
                                   jax.random.key(1), 0)
        jax.block_until_ready(m["loss"])
        times = []
        for rep in range(args.reps):
            t0 = time.perf_counter()
            params, opt_state, m = run(params, opt_state, xd, yd,
                                       jax.random.key(1),
                                       (rep + 1) * args.epochs)
            jax.block_until_ready(m["loss"])
            times.append(time.perf_counter() - t0)
        dt = min(times)
        n_rows = len(xd) if w == 1 else args.n_data - args.n_data % w
        steps = ((n_rows // w) // (args.batch // w)) * args.epochs
        losses = np.asarray(m["loss"])
        rows.append({
            "dp": w,
            "steps_per_epoch": steps // args.epochs,
            "imgs_per_sec": round(steps * args.batch / dt, 1),
            "ms_per_step": round(dt / steps * 1e3, 3),
            "final_epoch_loss": round(float(losses[-1]), 3),
            "loss_decreased": bool(losses[-1] < losses[0]),
            "loss_finite": bool(np.isfinite(losses).all()),
        })
        print(rows[-1], flush=True)
    return rows


def sweep_celeba(args):
    import jax
    import jax.numpy as jnp
    import optax
    from cdgvae_tpu.data.celeba import synthetic_celeba
    from cdgvae_tpu.models.celeba import (CelebACDGVAE, celeba_B,
                                          SMILE_NODES)
    from cdgvae_tpu.ops.causal import CausalGraph
    from cdgvae_tpu.models.sagan import sn_refresh
    from cdgvae_tpu.ops.packing import Packer
    from cdgvae_tpu.parallel.mesh import make_mesh
    from cdgvae_tpu.train.celeba_steps import (celeba_unjitted_step,
                                               make_celeba_loss_fn)
    from cdgvae_tpu.train.scanned import (
        make_scanned_epochs, make_sharded_scanned_epochs_from_loss)
    from cdgvae_tpu.cli.common import _shard_over_dp

    graph = CausalGraph(celeba_B(SMILE_NODES, 0), scm="linear")
    model = CelebACDGVAE(graph, latent_dim=6,
                         image_size=args.celeba_img_size,
                         conv_dim=args.celeba_conv_dim, freeze_trunk=True)
    opt = optax.adam(1e-3)
    x_np, y_np = synthetic_celeba(args.n_data_celeba,
                                  args.celeba_img_size, seed=1)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)
    packer = Packer(model.init(jax.random.key(0)))
    base_loss = make_celeba_loss_fn(model, beta=0.1, lam=5.0,
                                    compute_dtype=jnp.bfloat16
                                    if args.bf16 else None)

    def loss_fn(pp, xb, yb, rng):
        return base_loss(packer.unpack(pp), xb, yb, rng)

    def post_update(pp):
        return packer.map_unpacked(sn_refresh, pp)

    rows = []
    for w in _widths(args.widths):
        if args.celeba_batch % w:
            print(f"dp={w}: batch {args.celeba_batch} not divisible, skip")
            continue
        params = packer.pack(model.init(jax.random.key(0)))
        opt_state = opt.init(params)
        if w == 1:
            step = celeba_unjitted_step(
                model, opt, beta=0.1, lam=5.0, packer=packer,
                compute_dtype=jnp.bfloat16 if args.bf16 else None)
            run = make_scanned_epochs(step, batch_size=args.celeba_batch,
                                      n_epochs_per_call=args.epochs)
            xd, yd = x, y
        else:
            mesh = make_mesh(w)
            run = make_sharded_scanned_epochs_from_loss(
                loss_fn, opt, mesh, args.celeba_batch,
                n_epochs_per_call=args.epochs, post_update=post_update)
            xd, yd = _shard_over_dp(mesh, (x, y))
        params, opt_state, m = run(params, opt_state, xd, yd,
                                   jax.random.key(1), 0)
        jax.block_until_ready(m["loss"])
        times = []
        for rep in range(args.reps):
            t0 = time.perf_counter()
            params, opt_state, m = run(params, opt_state, xd, yd,
                                       jax.random.key(1),
                                       (rep + 1) * args.epochs)
            jax.block_until_ready(m["loss"])
            times.append(time.perf_counter() - t0)
        dt = min(times)
        n_rows = len(xd) if w == 1 else len(x) - len(x) % w
        steps = ((n_rows // w) // (args.celeba_batch // w)) * args.epochs
        losses = np.asarray(m["loss"])
        rows.append({
            "dp": w,
            "steps_per_epoch": steps // args.epochs,
            "imgs_per_sec": round(steps * args.celeba_batch / dt, 1),
            "ms_per_step": round(dt / steps * 1e3, 3),
            "final_epoch_loss": round(float(losses[-1]), 3),
            "loss_decreased": bool(losses[-1] < losses[0]),
            "loss_finite": bool(np.isfinite(losses).all()),
        })
        print(rows[-1], flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["pendulum", "celeba", "both"],
                    default="both")
    ap.add_argument("--widths", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--epochs", type=int, default=4,
                    help="epochs per timed call")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128,
                    help="pendulum global batch (sharded over dp)")
    ap.add_argument("--n_data", type=int, default=4096)
    ap.add_argument("--celeba_batch", type=int, default=16)
    ap.add_argument("--n_data_celeba", type=int, default=128)
    ap.add_argument("--celeba_img_size", type=int, default=64)
    ap.add_argument("--celeba_conv_dim", type=int, default=16)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--tag", default="")
    from cdgvae_tpu.cli.common import _platform_arg
    ap.add_argument("--platform", default="", type=_platform_arg)
    args = ap.parse_args()

    import jax
    platform = jax.devices()[0].platform
    out = {
        "platform": platform,
        "device_kind": jax.devices()[0].device_kind,
        "n_devices": len(jax.devices()),
        "timing_meaningful": platform == "tpu",
        "note": ("virtual CPU devices timeshare one host core — timings "
                 "validate MECHANICS only, not scaling"
                 if platform != "tpu" else
                 "real-device timings: DP scaling curve at fixed global "
                 "batch"),
        "protocol": {"widths": args.widths, "epochs": args.epochs,
                     "reps": args.reps, "batch": args.batch,
                     "celeba_batch": args.celeba_batch,
                     "bf16": args.bf16},
    }
    if args.family in ("pendulum", "both"):
        out["pendulum"] = sweep_pendulum(args)
    if args.family in ("celeba", "both"):
        out["celeba"] = sweep_celeba(args)

    path = os.path.join(REPO, "docs", "results",
                        f"dp_sweep_scaling{args.tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {path}")


if __name__ == "__main__":
    main()

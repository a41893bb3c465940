"""Serving-surface throughput bench: api.LoadedModel on the real chip.

Measures the three pendulum serving paths (reference counterparts:
reconstruct = inference.py recon pass; counterfactual = the do-operator,
inference.py:298-327; sample = z~N(0,I) generation, tabular/inference.py
:226-241 analog) and — new in round 4 — the CelebA serving paths
(reconstruct and encode→do→SAGAN-decode counterfactual) that
api.LoadedModel has supported since round 2 but were never benched.

Protocol (docs/PERF.md "Serving surface"): batch-sized device-resident
inputs driven through the ONCE-jitted internal paths; "pipelined" =
``reps`` async dispatches, block at the end (jax's default dispatch
model — what a co-located serving client achieves); "blocking" = one
synchronous call (pays the dev-tunnel's ~30 ms round trip per call;
meaningless in deployment, reported for transparency).

Checkpoints are trained in-place (subprocess CLI, reference-protocol
shapes, short epochs — serving speed is architecture-shaped, not
training-quality-shaped) and reused across runs.

Writes docs/results/serving_r04.json.
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cdgvae_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_checkpoint(workdir, family, img_size):
    if family == "pendulum":
        ckpt = os.path.join(workdir, "pend", "model_CDGVAE_linear")
        argv = [sys.executable, "-m", "cdgvae_tpu.cli.main",
                "--model", "CDGVAE", "--epochs", "12", "--n_samples",
                "2048", "--assets_dir", os.path.join(workdir, "pend")]
    elif family == "tabular":
        ckpt = os.path.join(workdir, "tab", "tabular_CDGVAE_loan")
        argv = [sys.executable, "-m", "cdgvae_tpu.cli.tabular_main",
                "--dataset", "loan", "--epochs", "50",
                "--assets_dir", os.path.join(workdir, "tab")]
    else:
        ckpt = os.path.join(workdir, "celeba", "celeba_CDGVAE_linear")
        argv = [sys.executable, "-m", "cdgvae_tpu.cli.celeba_main",
                "--epochs", "4", "--img_size", str(img_size),
                "--chunk", "2", "--data_dir", "/nonexistent",
                "--assets_dir", os.path.join(workdir, "celeba")]
    if not os.path.isdir(ckpt):
        r = subprocess.run(argv, cwd=REPO)
        if r.returncode != 0:
            raise RuntimeError(f"{family} checkpoint training failed")
    return ckpt


def timed(fn, reps):
    """(pipelined imgs-equivalent wall, blocking wall) for one path."""
    import jax
    out = fn()
    jax.block_until_ready(out)  # warm/compile
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]  # async dispatch pipeline
    jax.block_until_ready(outs)
    pipelined = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    blocking = time.perf_counter() - t0
    return pipelined, blocking


def bench_family(family, ckpt, batch, reps, img_size=128):
    import jax
    import jax.numpy as jnp
    from cdgvae_tpu.api import LoadedModel

    m = LoadedModel.load(ckpt)
    rows = {}
    if family == "tabular":
        from cdgvae_tpu.data.tabular.datasets import load_tabular
        ds = load_tabular("loan", train=False, data_dir="/nonexistent")
        data_rows = np.asarray(ds.x_data, np.float32)
        n_tile = int(np.ceil(batch / len(data_rows)))
        x = jnp.asarray(np.tile(data_rows, (n_tile, 1))[:batch])
        eps = jnp.asarray(np.random.default_rng(0).normal(
            size=(batch, m.model.node)).astype(np.float32))
        paths = {
            "reconstruct": lambda: m._fwd(m.params, x),
            "counterfactual": lambda: m._cf(m.params, x, do_index=0,
                                            value=jnp.float32(0.5)),
            "sample": lambda: m._gen(m.params, eps),
        }
    else:
        paths = _family_paths(family, m, batch, img_size)
    for name, fn in paths.items():
        pipelined, blocking = timed(fn, reps)
        rows[name] = {
            "batch": batch,
            "pipelined_imgs_per_sec": round(reps * batch / pipelined, 1),
            "blocking_imgs_per_sec": round(batch / blocking, 1),
        }
        print(f"{family}/{name}: {rows[name]}", flush=True)
    return rows


def _family_paths(family, m, batch, img_size):
    """(name -> zero-arg dispatch) for one family at one batch size."""
    import jax.numpy as jnp

    if family == "pendulum":
        from cdgvae_tpu.data.pendulum import sample_factors_real
        from cdgvae_tpu.ops.renderer import render
        factors, _ = sample_factors_real(seed=3, n=batch)
        x = render(jnp.asarray(factors[:, :4], jnp.float32),
                   size=m.config["image_size"])
        eps = jnp.asarray(np.random.default_rng(0).normal(
            size=(batch, m.model.node)).astype(np.float32))
        return {
            "reconstruct": lambda: m._fwd(m.params, x),
            "counterfactual": lambda: m._cf(m.params, x, do_index=0,
                                            value=jnp.float32(0.5)),
            "sample": lambda: m._gen(m.params, eps),
        }
    from cdgvae_tpu.data.celeba import synthetic_celeba
    x_np, _ = synthetic_celeba(batch, img_size, seed=3)
    x = jnp.asarray(x_np)
    return {
        "reconstruct": lambda: m._fwd(m.params, x),
        "counterfactual": lambda: m._cf(m.params, x, do_index=0,
                                        value=jnp.float32(0.5)),
    }


def bench_latency(family, ckpt, batches, reps, img_size=128):
    """DEVICE-SIDE per-call latency (ms) per path/batch from the xplane
    trace (round-5 ask: host-side timing of ms-scale calls through the
    dev tunnel is RTT-corrupted — ~25-65 ms per round trip, docs/PERF.md
    measurement rules — so the latency a co-located serving deployment
    would see must be read from the device's own timeline).

    Protocol: per (path, batch), `reps` pipelined dispatches inside one
    jax.profiler trace; the path's compiled module is identified in the
    trace as the module name executed >= reps times with the largest
    total device time (input staging/threefry helpers execute once or
    are tiny), and its per-execution spans give mean/p50.
    """
    import tempfile

    import jax
    from cdgvae_tpu.api import LoadedModel
    from cdgvae_tpu.utils.profiling import trace
    from cdgvae_tpu.utils.xplane import load_xspace, module_spans

    m = LoadedModel.load(ckpt)
    rows = {}
    for batch in batches:
        paths = _family_paths(family, m, batch, img_size)
        for name, fn in paths.items():
            jax.block_until_ready(fn())  # warm/compile outside the trace
            tdir = tempfile.mkdtemp(prefix=f"lat_{family}_{name}_{batch}_")
            with trace(tdir):
                outs = [fn() for _ in range(reps)]
                jax.block_until_ready(outs)
            spans = module_spans(load_xspace(tdir))
            per_mod: dict[str, list[float]] = {}
            for mod, ms in spans:
                per_mod.setdefault(mod, []).append(ms)
            cands = {k: v for k, v in per_mod.items()
                     if len(v) >= max(2, int(0.8 * reps))}
            if not cands:
                counts = [(k, len(v)) for k, v in per_mod.items()]
                raise RuntimeError(
                    f"{family}/{name}@{batch}: no module executed ~{reps}"
                    f" times in the trace (got {counts})")
            mod = max(cands, key=lambda k: sum(cands[k]))
            v = sorted(cands[mod])
            row = {"batch": batch, "n_calls": len(v),
                   "device_mean_ms": round(float(np.mean(v)), 4),
                   "device_p50_ms": round(float(v[len(v) // 2]), 4)}
            rows.setdefault(name, []).append(row)
            print(f"{family}/{name}@{batch}: {row}", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="+",
                    default=["pendulum", "celeba", "tabular"])
    ap.add_argument("--batch", type=int, default=1024,
                    help="pendulum serving batch (PERF.md protocol)")
    ap.add_argument("--celeba_batch", type=int, default=128,
                    help="celeba serving batch (128px 8-channel inputs "
                         "are 0.5 MB each — big batches are HBM-bound)")
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--img_size", type=int, default=128)
    ap.add_argument("--latency", action="store_true",
                    help="measure DEVICE-SIDE per-call latency (xplane-"
                         "derived) at --latency_batches for the image "
                         "families instead of throughput")
    ap.add_argument("--latency_batches", type=int, nargs="+",
                    default=[1, 16])
    ap.add_argument("--workdir", default="/tmp/serving_bench")
    ap.add_argument("--out", default="docs/results/serving_r04.json")
    from cdgvae_tpu.cli.common import _platform_arg
    ap.add_argument("--platform", default="", type=_platform_arg)
    args = ap.parse_args()

    import jax
    out_path = args.out if os.path.isabs(args.out) else os.path.join(
        REPO, args.out)
    # partial re-runs (--families X) merge into an existing artifact
    # instead of clobbering the other families' rows
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    results.update({"date": time.strftime("%Y-%m-%d"),
                    "device": jax.devices()[0].device_kind,
                    "reps_pipelined": args.reps})
    for family in args.families:
        ckpt = ensure_checkpoint(args.workdir, family, args.img_size)
        if args.latency:
            if family == "tabular":
                continue  # image families only (the ask's scope)
            results.setdefault(family, {})["device_latency"] = \
                bench_latency(family, ckpt, args.latency_batches,
                              args.reps, args.img_size)
        else:
            batch = args.celeba_batch if family == "celeba" else args.batch
            results.setdefault(family, {}).update(
                bench_family(family, ckpt, batch, args.reps,
                             args.img_size))

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()

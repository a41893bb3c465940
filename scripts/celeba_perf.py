"""CelebA family performance pass: imgs/s/chip, conv MFU, xplane op ranking.

The CelebA CDG-VAE (50M params, SAGAN conv decoders + ResNet encoder) is
the one model in this framework where MXU utilization is the story — the
pendulum/tabular MLPs are latency-bound. This script measures, on the real
chip, at the reference protocol (batch 16, 128px, frozen trunk,
celeba/main.py defaults):

1. train-step throughput (imgs/s/chip) for f32 vs bf16 compute;
2. analytic FLOPs of one train step (XLA ``cost_analysis``) -> MFU
   against the chip's bf16 peak (v5e: 197 TFLOP/s);
3. an xplane device-op ranking of a profiled run (what the chip actually
   spends time on), via cdgvae_tpu.utils.xplane.

Writes docs/results/celeba_perf.json and prints the ranking.
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

# bf16 matmul peak per chip. device_kind -> TFLOP/s
PEAK_BF16_TFLOPS = {"TPU v5 lite": 197.0, "TPU v5e": 197.0,
                    "TPU v4": 275.0, "TPU v5p": 459.0, "TPU v6e": 918.0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--conv_dim", type=int, default=32,
                    help="SAGAN generator base width (reference default "
                         "32). The round-5 idle decomposition attributes "
                         "the MFU plateau to in-op arithmetic intensity; "
                         "widening the convs is one of the two predicted "
                         "levers (the other is batch) — this knob tests "
                         "that prediction")
    ap.add_argument("--img_size", type=int, default=128)
    ap.add_argument("--n_data", type=int, default=512)
    ap.add_argument("--epochs_per_call", type=int, default=10)
    ap.add_argument("--profile_dir", default="/tmp/celeba_perf_trace")
    ap.add_argument("--out", default="docs/results/celeba_perf.json",
                    help="output json, repo-relative")
    ap.add_argument("--stacked", action="store_true",
                    help="A/B knob: the stacked vmapped decoder instead of "
                         "the default per-generator path (measured slower "
                         "— docs/PERF.md round-3 stacked A/B)")
    ap.add_argument("--packed", action="store_true",
                    help="A/B knob: train on the packed small-leaf params "
                         "layout (ops/packing.py — one flat buffer per "
                         "dtype instead of ~1000 tiny tensors, Adam "
                         "moments included; the round-4 DMA-descriptor "
                         "fix for the tiny-tensor staging churn named by "
                         "the round-3 trace decomposition)")
    ap.add_argument("--no_noise", action="store_true",
                    help="measurement-only probe: drop every NoiseInjection "
                         "site (NOT the reference model — sagan.py:75-84 "
                         "always injects). Bounds how much of the step the "
                         "noise RNG+broadcast chains can possibly cost "
                         "(PERF.md candidate (b))")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from cdgvae_tpu.data.celeba import synthetic_celeba
    from cdgvae_tpu.models.celeba import (CelebACDGVAE, celeba_B,
                                          SMILE_NODES)
    from cdgvae_tpu.ops.causal import CausalGraph
    from cdgvae_tpu.train.celeba_steps import celeba_unjitted_step
    from cdgvae_tpu.train.scanned import make_scanned_epochs

    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16_TFLOPS.get(kind)
    print(f"device: {kind} (bf16 peak {peak} TFLOP/s)")

    graph = CausalGraph(celeba_B(SMILE_NODES, 0), scm="linear")
    model = CelebACDGVAE(graph, latent_dim=6, image_size=args.img_size,
                         conv_dim=args.conv_dim,
                         freeze_trunk=True, stacked=args.stacked)
    if args.no_noise:
        assert not args.stacked, "--no_noise probes the default path"
        for g in model.generators:  # flips both init and forward
            g.add_noise = False
    opt = optax.adam(1e-3)

    # the scanned runner donates (params, opt_state) — every pass needs a
    # fresh init (same key -> identical values)
    packer = None
    if args.packed:
        from cdgvae_tpu.ops.packing import Packer
        packer = Packer(model.init(jax.random.key(0)))

    def fresh_params():
        p = model.init(jax.random.key(0))
        return p if packer is None else packer.pack(p)

    x_np, y_np = synthetic_celeba(args.n_data, args.img_size, seed=1)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)
    steps_per_call = (args.n_data // args.batch) * args.epochs_per_call

    results = {"device": kind, "batch": args.batch,
               "img_size": args.img_size, "conv_dim": args.conv_dim,
               "peak_bf16_tflops": peak,
               "stacked": args.stacked, "no_noise": args.no_noise,
               "packed": args.packed}

    for name, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        step = celeba_unjitted_step(model, opt, beta=0.1, lam=5.0,
                                    compute_dtype=dtype, packer=packer)
        run = make_scanned_epochs(step, batch_size=args.batch,
                                  n_epochs_per_call=args.epochs_per_call)
        params = fresh_params()
        p, s, m = run(params, opt.init(fresh_params()), x, y,
                      jax.random.key(1), 0)
        jax.block_until_ready(m["loss"])  # compile + warm
        times = []
        for rep in range(3):
            t0 = time.perf_counter()
            p, s, m = run(p, s, x, y, jax.random.key(1),
                          (rep + 1) * args.epochs_per_call)
            jax.block_until_ready(m["loss"])
            times.append(time.perf_counter() - t0)
        dt = min(times)
        imgs = steps_per_call * args.batch / dt
        ms_per_step = dt / steps_per_call * 1e3

        # analytic FLOPs of ONE step: cost_analysis on the jitted raw step
        # (the scanned runner amortizes dispatch but has the same per-step
        # math). XLA counts each MAC as 2 flops, both fwd and bwd.
        pa = fresh_params()
        jstep = jax.jit(step)
        lowered = jstep.lower(pa, opt.init(pa), x[:args.batch],
                              y[:args.batch], jax.random.key(1))
        cost = lowered.compile().cost_analysis()
        flops = float(cost.get("flops", 0.0))
        tflops_per_s = flops / (dt / steps_per_call) / 1e12
        mfu = tflops_per_s / peak if peak else None
        results[name] = {
            "imgs_per_sec": round(imgs, 1),
            "ms_per_step": round(ms_per_step, 3),
            "step_tflops": round(flops / 1e12, 4),
            "achieved_tflops_per_s": round(tflops_per_s, 2),
            "mfu_vs_bf16_peak": None if mfu is None else round(mfu, 4),
        }
        print(f"{name}: {imgs:,.0f} imgs/s  {ms_per_step:.2f} ms/step  "
              f"{tflops_per_s:.1f} TFLOP/s  "
              f"MFU {mfu:.1%}" if mfu is not None else f"{name}: {imgs}")
        del run, p, s

    # xplane profile of the bf16 scanned run (one call)
    step = celeba_unjitted_step(model, opt, beta=0.1, lam=5.0,
                                compute_dtype=jnp.bfloat16, packer=packer)
    run = make_scanned_epochs(step, batch_size=args.batch,
                              n_epochs_per_call=args.epochs_per_call)
    pp = fresh_params()
    p, s, m = run(pp, opt.init(fresh_params()), x, y, jax.random.key(1), 0)
    jax.block_until_ready(m["loss"])
    with jax.profiler.trace(args.profile_dir):
        p, s, m = run(p, s, x, y, jax.random.key(1), args.epochs_per_call)
        jax.block_until_ready(m["loss"])

    # direct idle/op-count decomposition (round-5: replaces the round-4
    # elimination argument about the MFU residual with a measurement):
    # leaf events = the sequential device ops; leaf_idle = the total
    # inter-op gap time the "per-op scheduling overhead" theory predicts
    # should account for the non-compute fraction of the step.
    from cdgvae_tpu.utils.xplane import (busy_breakdown, load_xspace,
                                         module_spans, rank_ops)
    xsp = load_xspace(args.profile_dir)
    bb = busy_breakdown(xsp)
    mods = module_spans(xsp)
    run_spans = sorted((ms for _, ms in mods), reverse=True)
    # the traced call is ONE scanned-chunk execution; smaller modules in
    # the trace (threefry folds etc.) are not the train program
    chunk_ms = run_spans[0] if run_spans else float("nan")
    n_steps = steps_per_call
    gap_us = (bb["leaf_idle_ms"] / max(bb["n_leaf_events"], 1)) * 1e3
    results["sched_decomposition_bf16"] = {
        "traced_steps": n_steps,
        "chunk_device_span_ms": round(chunk_ms, 3),
        "leaf_ops_per_step": round(bb["n_leaf_events"] / n_steps, 1),
        "leaf_busy_ms_per_step": round(bb["leaf_busy_ms"] / n_steps, 4),
        "leaf_idle_ms_per_step": round(bb["leaf_idle_ms"] / n_steps, 4),
        "idle_frac_of_span": round(
            bb["leaf_idle_ms"] / max(bb["span_ms"], 1e-9), 4),
        "mean_gap_us_per_op": round(gap_us, 3),
    }
    print(f"\nsched decomposition (bf16): "
          f"{results['sched_decomposition_bf16']}")

    ranking = rank_ops(args.profile_dir, top=15)
    # op names carry the full HLO tuple signature (the scan while-loop's is
    # ~90KB) — keep only the op id, which is what a human ranks by
    results["top_device_ops_bf16"] = [
        {"op": r[0].split(" = ")[0], "total_ms": round(r[1], 3)}
        for r in ranking]
    print("\ntop device ops (bf16 scanned run):")
    for r in ranking:
        print(f"  {r[1]:9.3f} ms  {r[0]}")

    out = args.out if os.path.isabs(args.out) else os.path.join(
        REPO, args.out)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\n-> {out}")


if __name__ == "__main__":
    main()

"""Headline benchmark: CDG-VAE pendulum training throughput (images/sec/chip).

Measures the scan-compiled trainer (cdgvae_tpu.train.scanned): whole epochs
of the flagship CDG-VAE pendulum model — forward + ELBO + alignment +
backward + Adam at the reference hyperparameters (batch 128, 64px, node 4,
factor [1,1,2]; reference main.py:93-107) — run as a single fused XLA
program per EPOCHS_PER_CALL epochs on one real chip, on device-rendered
pendulum data.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the PyTorch reference implementation
measured on this host's CPU (the reference has no GPU here and publishes no
speed numbers): 288.8 imgs/s via scripts/bench_reference_torch.py.

``--metric celeba`` benches the second family instead: the 50M-param
dual-latent SAGAN CDG-VAE (128px, batch 16, bf16 compute — the conv/MXU
family where mixed precision pays; reference celeba/main.py defaults),
vs 0.62 imgs/s for the reference transcription on this host's CPU
(scripts/bench_reference_torch_celeba.py).
"""
import argparse
import json
import time

import numpy as np

REFERENCE_IMGS_PER_SEC = 288.8  # scripts/bench_reference_torch.py, this host
REFERENCE_CELEBA_IMGS_PER_SEC = 0.62  # bench_reference_torch_celeba.py

BATCH = 128
N_DATA = 3712  # 29 full batches
# 200 epochs (5800 steps) per device dispatch: the step is latency-bound at
# ~0.25 ms, so the ~25-35 ms tunnel dispatch round trip is ~25% overhead at
# 10 epochs/call, ~6% at 50, and ~2% at 200 (measured sweep 2026-08-18:
# 10 -> 366k, 50 -> 480k, 100 -> 503k, 200 -> 514k imgs/s; extrapolated
# pure-device asymptote ~526k). Same program semantics — whole epochs, one
# scan per dispatch; only the outer scan length changes.
EPOCHS_PER_CALL = 200


def bench_celeba():
    """CelebA family throughput: scan-compiled epochs of the dual-latent
    SAGAN CDG-VAE at the reference protocol (batch 16, 128px, frozen
    trunk), bf16 compute, synthetic data of the real shape."""
    import jax
    import optax
    from cdgvae_tpu.data.celeba import synthetic_celeba
    from cdgvae_tpu.models.celeba import CelebACDGVAE, celeba_B, SMILE_NODES
    from cdgvae_tpu.ops.causal import CausalGraph
    from cdgvae_tpu.train.celeba_steps import celeba_unjitted_step
    from cdgvae_tpu.train.scanned import make_scanned_epochs

    batch, n_data, epochs_per_call = 16, 512, 10
    graph = CausalGraph(celeba_B(SMILE_NODES, 0), scm="linear")
    model = CelebACDGVAE(graph, latent_dim=6, image_size=128,
                         freeze_trunk=True)
    # packed small-leaf params layout — the cli.celeba_main production
    # default (ops/packing.py; A/B'd +1-2% both dtypes after the
    # per-buffer cast change, docs/PERF.md round 4)
    from cdgvae_tpu.ops.packing import Packer
    packer = Packer(model.init(jax.random.key(0)))
    params = packer.pack(model.init(jax.random.key(0)))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    import jax.numpy as jnp
    x_np, y_np = synthetic_celeba(n_data, 128, seed=1)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)

    step = celeba_unjitted_step(model, opt, beta=0.1, lam=5.0,
                                compute_dtype=jnp.bfloat16, packer=packer)
    run = make_scanned_epochs(step, batch_size=batch,
                              n_epochs_per_call=epochs_per_call)

    params, opt_state, m = run(params, opt_state, x, y, jax.random.key(1),
                               0)
    jax.block_until_ready(m["loss"])
    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        params, opt_state, m = run(params, opt_state, x, y,
                                   jax.random.key(1),
                                   (rep + 1) * epochs_per_call)
        jax.block_until_ready(m["loss"])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    steps = (n_data // batch) * epochs_per_call
    imgs_per_sec = steps * batch / dt
    print(json.dumps({
        "metric": "cdgvae_celeba_train_throughput",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / REFERENCE_CELEBA_IMGS_PER_SEC,
                             2),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metric", choices=["pendulum", "celeba"],
                    default="pendulum")
    args = ap.parse_args()

    from cdgvae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.metric == "celeba":
        return bench_celeba()

    import jax
    import jax.numpy as jnp
    import optax
    from cdgvae_tpu.factory import build_pendulum_model
    from cdgvae_tpu.train.scanned import make_scanned_epochs, unjitted_step
    from cdgvae_tpu.data.pendulum import sample_factors_real
    from cdgvae_tpu.ops.renderer import render

    config = dict(model="CDGVAE", node=4, scm="linear", flow_num=1,
                  inverse_loop=100, factor=[1, 1, 2], image_size=64,
                  adjacency_scaling=True)
    model, _ = build_pendulum_model(config)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    factors, _ = sample_factors_real(seed=1, n=N_DATA)
    x = render(jnp.asarray(factors[:, :4], jnp.float32), size=64)
    y = jnp.asarray(np.random.default_rng(0).uniform(
        size=(N_DATA, 5)).astype(np.float32))

    step = unjitted_step(model, opt, beta=0.1, lam=5.0)
    run = make_scanned_epochs(step, batch_size=BATCH,
                              n_epochs_per_call=EPOCHS_PER_CALL)

    # warmup/compile
    params, opt_state, m = run(params, opt_state, x, y, jax.random.key(1),
                               0)
    jax.block_until_ready(m["loss"])

    # best of 5: the tunnel to the chip adds wall noise that is strictly
    # additive (dispatch latency, occasional multi-second stalls measured
    # 2026-08-17), so the minimum is the least-contaminated estimate of
    # the true device throughput; 5 reps bound the stall risk
    times = []
    for rep in range(5):
        t0 = time.perf_counter()
        params, opt_state, m = run(params, opt_state, x, y,
                                   jax.random.key(1),
                                   (rep + 1) * EPOCHS_PER_CALL)
        jax.block_until_ready(m["loss"])
        times.append(time.perf_counter() - t0)
    dt = min(times)

    steps = (N_DATA // BATCH) * EPOCHS_PER_CALL
    imgs_per_sec = steps * BATCH / dt
    print(json.dumps({
        "metric": "cdgvae_pendulum_train_throughput",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / REFERENCE_IMGS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()

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
"""
import json
import time

import numpy as np

REFERENCE_IMGS_PER_SEC = 288.8  # scripts/bench_reference_torch.py, this host

BATCH = 128
N_DATA = 3712  # 29 full batches
# 200 epochs (5800 steps) per device dispatch: the step is latency-bound at
# ~0.25 ms, so the ~25-35 ms tunnel dispatch round trip is ~25% overhead at
# 10 epochs/call, ~6% at 50, and ~2% at 200 (measured sweep 2026-08-18:
# 10 -> 366k, 50 -> 480k, 100 -> 503k, 200 -> 514k imgs/s; extrapolated
# pure-device asymptote ~526k). Same program semantics — whole epochs, one
# scan per dispatch; only the outer scan length changes.
EPOCHS_PER_CALL = 200


def main():
    from cdgvae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

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

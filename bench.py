"""Headline benchmark: CDG-VAE pendulum training throughput (images/sec/chip).

Runs the fully fused jit train step (forward + ELBO + alignment + backward +
Adam) on the flagship CDG-VAE pendulum model at the reference hyperparameters
(batch 128, 64px, node 4, factor [1,1,2]; reference main.py:93-107) on one
real chip, feeding device-rendered pendulum data.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the PyTorch reference implementation measured
on this host's CPU (the reference has no GPU here and publishes no speed
numbers): 288.8 imgs/s, measured by scripts/bench_reference_torch.py.
"""
import json
import time

import jax
import numpy as np

REFERENCE_IMGS_PER_SEC = 288.8  # scripts/bench_reference_torch.py, this host


def main():
    import optax
    from cdgvae_tpu.factory import build_pendulum_model
    from cdgvae_tpu.train.steps import make_train_step
    from cdgvae_tpu.data.pendulum import sample_factors_real
    from cdgvae_tpu.ops.renderer import render

    config = dict(model="CDGVAE", node=4, scm="linear", flow_num=1,
                  inverse_loop=100, factor=[1, 1, 2], image_size=64,
                  adjacency_scaling=True)
    batch = 128

    model, _ = build_pendulum_model(config)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(model, opt, beta=0.1, lam=5.0)

    factors, _ = sample_factors_real(seed=1, n=batch)
    x = render(jax.numpy.asarray(factors[:, :4], jax.numpy.float32), size=64)
    y = jax.numpy.asarray(np.random.default_rng(0).uniform(
        size=(batch, 5)).astype(np.float32))

    # warmup: compile + a few steps
    for i in range(10):
        params, opt_state, m = step(params, opt_state, x, y,
                                    jax.random.key(i))
    jax.block_until_ready(m["loss"])

    n = 200
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, m = step(params, opt_state, x, y,
                                    jax.random.key(i))
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * n / dt
    print(json.dumps({
        "metric": "cdgvae_pendulum_train_throughput",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / REFERENCE_IMGS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()

"""Profile one scanned-epochs dispatch of the flagship trainer and rank XLA
ops by device time (docs/PERF.md method: parse the .xplane.pb directly —
the tensorboard converter is incompatible with this TF build).

Usage: PYTHONPATH=. python scripts/profile_step.py [trace_dir]

CAVEATS on reading the output: the flat summation adds up events from ALL
trace lines of the TPU planes, which nest (module > while-loop > fused op),
so the total double-counts and the per-step figure overstates — use it to
RANK ops, and read absolute step time from the top-level while-loop rows.
Async ``copy-start`` rows measure in-flight time that overlaps compute
(per-dispatch param staging over the tunnel), not critical-path work.
Measured 2026-08-17: the two scan while-loops ≈ 0.41 ms/step, consistent
with docs/PERF.md's latency-bound speed-of-light accounting; no new
hotspot since the band-sliced decoder fix.
"""
import sys

import numpy as np


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof"

    import jax
    import jax.numpy as jnp
    import optax
    from cdgvae_tpu.factory import build_pendulum_model
    from cdgvae_tpu.train.scanned import make_scanned_epochs, unjitted_step
    from cdgvae_tpu.data.pendulum import sample_factors_real
    from cdgvae_tpu.ops.renderer import render
    from cdgvae_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    config = dict(model="CDGVAE", node=4, scm="linear", flow_num=1,
                  inverse_loop=100, factor=[1, 1, 2], image_size=64,
                  adjacency_scaling=True)
    model, _ = build_pendulum_model(config)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    factors, _ = sample_factors_real(seed=1, n=3712)
    x = render(jnp.asarray(factors[:, :4], jnp.float32), size=64)
    y = jnp.asarray(np.random.default_rng(0).uniform(
        size=(3712, 5)).astype(np.float32))
    step = unjitted_step(model, opt, beta=0.1, lam=5.0)
    run = make_scanned_epochs(step, batch_size=128, n_epochs_per_call=10)
    params, opt_state, m = run(params, opt_state, x, y, jax.random.key(1), 0)
    jax.block_until_ready(m["loss"])  # compiled

    with jax.profiler.trace(trace_dir):
        params, opt_state, m = run(params, opt_state, x, y,
                                   jax.random.key(1), 10)
        jax.block_until_ready(m["loss"])

    from cdgvae_tpu.utils.xplane import print_ranking
    print_ranking(trace_dir, top=25, steps=(3712 // 128) * 10)


if __name__ == "__main__":
    main()

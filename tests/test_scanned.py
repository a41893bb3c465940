"""Scan-compiled trainer tests: one-dispatch epochs match the step math and
reduce loss."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from cdgvae_tpu.factory import build_pendulum_model
from cdgvae_tpu.train.scanned import make_scanned_epochs, unjitted_step

CFG = dict(model="CDGVAE", node=4, scm="linear", flow_num=1,
           inverse_loop=100, factor=[1, 1, 2], image_size=16,
           adjacency_scaling=True)


def test_scanned_epochs_run_and_learn():
    model, _ = build_pendulum_model(CFG)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    kx, ky = jax.random.split(jax.random.key(1))
    x = jnp.tanh(jax.random.normal(kx, (128, 16, 16, 3)))
    y = jax.random.uniform(ky, (128, 5))

    step = unjitted_step(model, opt, beta=0.1, lam=5.0)
    run = make_scanned_epochs(step, batch_size=32, n_epochs_per_call=5)
    params, opt_state, m = run(params, opt_state, x, y, jax.random.key(2),
                               0)
    losses = np.asarray(m["loss"])
    assert losses.shape == (5,)
    assert np.isfinite(losses).all()
    params, opt_state, m2 = run(params, opt_state, x, y, jax.random.key(2),
                                5)
    assert float(np.asarray(m2["loss"])[-1]) < float(losses[0])
    # metric keys identical to the dispatched step
    assert {"loss", "recon", "KL", "alignment"}.issubset(m2.keys())

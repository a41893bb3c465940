"""Train-step tests: loss decreases, metric keys match the reference log
schema, semi-supervised and InfoMax variants run, and the DP-sharded step
produces the same result as single-device (on the 8-device CPU mesh)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from cdgvae_tpu.factory import build_pendulum_model
from cdgvae_tpu.parallel.mesh import make_mesh
from cdgvae_tpu.train.steps import (make_train_step, make_infomax_step,
                                    make_semi_step)
from cdgvae_tpu.train.loop import train_epoch, train_epoch_semi, Averager

CFG = dict(model="CDGVAE", node=4, scm="linear", flow_num=1,
           inverse_loop=100, factor=[1, 1, 2], image_size=16,
           adjacency_scaling=True)


def _data(n=32, size=16, node=4, seed=0):
    kx, ky = jax.random.split(jax.random.key(seed))
    x = jnp.tanh(jax.random.normal(kx, (n, size, size, 3)))
    y = jax.random.uniform(ky, (n, node + 1))
    return x, y


def test_train_step_decreases_loss():
    model, _ = build_pendulum_model(CFG)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(model, opt, beta=0.1, lam=5.0)
    x, y = _data()

    losses = []
    for i in range(30):
        params, opt_state, m = step(params, opt_state, x, y,
                                    jax.random.key(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]

    expected_keys = {"loss", "recon", "KL", "alignment"} | {
        f"posterior_variance{i+1}" for i in range(4)}
    assert set(m.keys()) == expected_keys


def test_infomax_step_runs_and_logs_mi():
    cfg = dict(CFG, model="InfoMax")
    model, disc = build_pendulum_model(cfg)
    params = model.init(jax.random.key(0))
    d_params = disc.init(jax.random.key(1))
    opt, opt_d = optax.adam(1e-3), optax.adam(1e-4)
    step = make_infomax_step(model, disc, opt, opt_d, beta=0.1, lam=5.0,
                             gamma=1.0)
    x, y = _data()
    state = (params, d_params, opt.init(params), opt_d.init(d_params))
    for i in range(3):
        *state, m = step(*state, x, y, jax.random.key(i))
    assert "MutualInfo" in m
    assert np.isfinite(m["MutualInfo"])


def test_semi_step_and_epoch():
    model, _ = build_pendulum_model(CFG)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    step = make_semi_step(model, opt, beta=0.1, lam=5.0)
    x_u, _ = _data(48)
    x_l, y_l = _data(12, seed=1)
    state = (params, opt.init(params))
    state, metrics = train_epoch_semi(
        step, state, x_u, x_l, y_l, batch_size=16, batch_size_l=8,
        rng=jax.random.key(2), epoch=0,
        shuffle_rng=np.random.default_rng(0))
    assert np.isfinite(metrics["loss"])


def test_train_epoch_handles_partial_batch():
    model, _ = build_pendulum_model(CFG)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    step = make_train_step(model, opt, beta=0.1, lam=5.0)
    x, y = _data(20)
    state, metrics = train_epoch(step, (params, opt.init(params)), x, y,
                                 batch_size=16, rng=jax.random.key(1),
                                 epoch=0,
                                 shuffle_rng=np.random.default_rng(0))
    assert np.isfinite(metrics["loss"])


@pytest.mark.parametrize("n_dev", [8])
def test_dp_sharded_step_matches_single_device(n_dev):
    """The GSPMD-partitioned step over the dp mesh must be numerically
    equivalent (up to reduction order) to the unsharded step."""
    assert len(jax.devices()) >= n_dev
    mesh = make_mesh(n_dev)
    model, _ = build_pendulum_model(CFG)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    x, y = _data(n=n_dev * 4)

    step1 = make_train_step(model, opt, 0.1, 5.0, mesh=None, donate=False)
    stepN = make_train_step(model, opt, 0.1, 5.0, mesh=mesh, donate=False)

    rng = jax.random.key(7)
    p1, o1, m1 = step1(params, opt.init(params), x, y, rng)
    pN, oN, mN = stepN(params, opt.init(params), x, y, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(mN["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5)


def test_bf16_compute_step():
    """Mixed precision: bf16 network compute, f32 params/optimizer/losses."""
    model, _ = build_pendulum_model(CFG)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    step = make_train_step(model, opt, beta=0.1, lam=5.0,
                           compute_dtype=jnp.bfloat16)
    x, y = _data()
    state = (params, opt.init(params))
    losses = []
    for i in range(10):
        *state, m = step(*state, x, y, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # params stay f32
    assert state[0]["encoder"]["layer0"]["w"].dtype == jnp.float32


def test_averager_single_sync():
    avg = Averager()
    for i in range(3):
        avg.add({"a": jnp.float32(i)})
    assert avg.result() == {"a": 1.0}

"""Online (fresh-data-per-step) trainer: DGP parity and training."""
import numpy as np
import jax
import optax

from cdgvae_tpu.factory import build_pendulum_model
from cdgvae_tpu.data.pendulum import sample_factors_real
from cdgvae_tpu.train.online import (sample_factors_device,
                                     label_norm_stats,
                                     make_online_scanned_steps)

CFG = dict(model="CDGVAE", node=4, scm="linear", flow_num=1,
           inverse_loop=100, factor=[1, 1, 2], image_size=16,
           adjacency_scaling=True)


def test_device_dgp_matches_host_dgp_distribution():
    """The jnp DGP twin draws from the same distribution as the host DGP
    (reference pendulum_real.py:49-81): factor means/stds within
    sampling noise, target rate matched, every-5th corruption pattern."""
    n = 8000
    dev = np.asarray(sample_factors_device(jax.random.key(0), n))
    host, _ = sample_factors_real(seed=0, n=n)
    np.testing.assert_allclose(dev.mean(0), host.mean(0),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(dev.std(0), host.std(0),
                               rtol=0.12, atol=0.05)
    # corrupted rows (every 5th) have uniform-[0,12] shadows INDEPENDENT
    # of the angles: the physics correlation with the light angle must
    # vanish there and stay strong in the clean rows
    corrupt = (np.arange(n) + 1) % 5 == 0
    cc = abs(np.corrcoef(dev[corrupt, 0], dev[corrupt, 2])[0, 1])
    cl = abs(np.corrcoef(dev[~corrupt, 0], dev[~corrupt, 2])[0, 1])
    assert cc < 0.1 and cl > 0.5, (cc, cl)
    assert dev[:, 4].min() >= 0 and dev[:, 4].max() <= 1


def test_online_scanned_steps_train_and_are_deterministic():
    model, _ = build_pendulum_model(CFG)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    run = make_online_scanned_steps(model, opt, beta=0.1, lam=5.0,
                                    batch_size=16, n_steps_per_call=6,
                                    image_size=16)
    p1, o1, m1 = run(params, opt.init(params), jax.random.key(1), 0)
    assert np.all(np.isfinite(np.asarray(m1["loss"])))
    # continues: later steps on fresh data, loss keeps improving vs start
    p2, _, m2 = run(p1, o1, jax.random.key(1), 6)
    assert float(np.asarray(m2["loss"]).mean()) < \
        float(np.asarray(m1["loss"])[0])
    # deterministic: same rng + step offset -> identical metrics
    _, _, m1b = run(params, opt.init(params), jax.random.key(1), 0)
    np.testing.assert_array_equal(np.asarray(m1["loss"]),
                                  np.asarray(m1b["loss"]))
    # distinct step offsets -> distinct data -> distinct losses
    _, _, m3 = run(params, opt.init(params), jax.random.key(1), 100)
    assert not np.array_equal(np.asarray(m1["loss"]),
                              np.asarray(m3["loss"]))


def test_device_dr_dgp_matches_host_dgp_distribution():
    """The jnp DR DGP twin matches the host train-split DGP
    (data/pendulum_dr.py::sample_factors_dr): factor moments within
    sampling noise, and the SPURIOUS train correlation — background rate
    0.8 given target=1, 0.2 given target=0 — reproduced."""
    from cdgvae_tpu.data.pendulum_dr import sample_factors_dr
    from cdgvae_tpu.train.online import (sample_factors_dr_device,
                                         dr_label_norm_stats)
    n = 8000
    mu4, _, _ = dr_label_norm_stats(seed=0, n=n)
    dev = np.asarray(sample_factors_dr_device(jax.random.key(0), n, mu4))
    host, _ = sample_factors_dr(seed=0, n=n)
    np.testing.assert_allclose(dev.mean(0), host.mean(0),
                               rtol=0.06, atol=0.05)
    bg, tau = dev[:, 4], dev[:, 5]
    assert abs(bg[tau == 1].mean() - 0.8) < 0.03
    assert abs(bg[tau == 0].mean() - 0.2) < 0.03


def test_dr_online_scanned_steps_train():
    from cdgvae_tpu.train.online import dr_batch_fn
    cfg = dict(CFG, node=5)
    model, _ = build_pendulum_model(cfg, spurious=True)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    run = make_online_scanned_steps(
        model, opt, beta=0.1, lam=20.0, batch_size=16, n_steps_per_call=5,
        sample_batch=dr_batch_fn(16, image_size=16))
    p1, o1, m1 = run(params, opt.init(params), jax.random.key(1), 0)
    losses = np.asarray(m1["loss"])
    assert np.all(np.isfinite(losses)) and losses[-1] < losses[0]


def test_label_norm_stats_match_dataset_protocol():
    """The frozen constants reproduce the fixed-dataset normalization on
    the dataset's own draw (modules/datasets.py:31-37)."""
    from cdgvae_tpu.data.pendulum import PendulumDataset
    ds = PendulumDataset(image_size=16, train=True, seed=1, n=2000)
    mu, mn, mx = label_norm_stats(seed=1, n=2000)
    y = ((ds.factors - np.asarray(mu)) - np.asarray(mn)) / \
        (np.asarray(mx) - np.asarray(mn))
    np.testing.assert_allclose(y, ds.y_data, rtol=1e-4, atol=1e-4)


def test_dr_label_norm_stats_match_dataset_protocol():
    """The frozen DR constants reproduce the DR dataset's normalization
    of the four physics labels on its own draw
    (data/pendulum_dr.py:113-120); background/target stay raw."""
    from cdgvae_tpu.data.pendulum_dr import PendulumDRDataset
    from cdgvae_tpu.train.online import dr_label_norm_stats
    ds = PendulumDRDataset(image_size=16, train=True, seed=1, n=2000)
    mu4, mn, mx = dr_label_norm_stats(seed=1, n=2000)
    y4 = ((ds.factors[:, :4] - np.asarray(mu4)) - np.asarray(mn)) / \
        (np.asarray(mx) - np.asarray(mn))
    np.testing.assert_allclose(y4, ds.y_data[:, :4], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(ds.y_data[:, 4:], ds.factors[:, 4:])

"""Online (fresh-data-per-step) trainer: DGP parity and training."""
import numpy as np
import pytest
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


def test_corruption_offset_globalizes_positional_mask():
    """The DGP's 20% shadow corruption is positional (every 5th row,
    reference pendulum_real.py:74). ``index_offset`` shifts the mask to
    GLOBAL row indices so sharded per-device draws keep the corruption
    fraction device-count-independent: rows that change between offset 0
    and offset k are exactly those whose (i+1+offset)%5 flag flips."""
    n = 20
    base = np.asarray(sample_factors_device(jax.random.key(3), n))
    shift = np.asarray(sample_factors_device(jax.random.key(3), n,
                                             index_offset=1))
    changed = np.any(base[:, 2:4] != shift[:, 2:4], axis=1)
    m0 = (np.arange(n) + 1) % 5 == 0
    m1 = (np.arange(n) + 2) % 5 == 0
    np.testing.assert_array_equal(changed, m0 | m1)
    # physics columns (uncorrupted inputs) are identical
    np.testing.assert_array_equal(base[:, :2], shift[:, :2])
    # union of per-device local masks at offsets d*local_bs == the global
    # every-5th mask, for any device count
    for n_dev, local in [(8, 2), (4, 5), (2, 10)]:
        masks = [(np.arange(local) + 1 + d * local) % 5 == 0
                 for d in range(n_dev)]
        np.testing.assert_array_equal(
            np.concatenate(masks),
            (np.arange(n_dev * local) + 1) % 5 == 0)


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


@pytest.mark.slow
def test_sharded_online_matches_manual_composition():
    """One multi-chip online call (8-device mesh) equals the hand-built
    composition: per-device DGP draws with the same folded keys, gradient
    mean across devices, Adam update — exact up to collective summation
    order."""
    from cdgvae_tpu.parallel.mesh import make_mesh, replicate
    from cdgvae_tpu.train.online import (make_sharded_online_scanned_steps,
                                         pendulum_batch_fn)
    from cdgvae_tpu.train.scanned import make_supervised_loss_fn

    model, _ = build_pendulum_model(CFG)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    mesh = make_mesh(8)
    n_steps, n_dev, local_bs = 2, 8, 2
    # manual composition FIRST: the sharded runner donates its (replicated)
    # inputs, and replicate() can alias the source buffers
    loss_fn = make_supervised_loss_fn(model, 0.1, 5.0)
    sample = pendulum_batch_fn(local_bs, image_size=16)
    p, o = params, opt.init(params)
    rng = jax.random.key(1)
    step_losses = []
    for step in range(n_steps):
        grads, losses = [], []
        for dev in range(n_dev):
            k_data, k_step = jax.random.split(jax.random.fold_in(
                jax.random.fold_in(rng, step), dev))
            x, y = sample(k_data, dev * local_bs)
            (loss, _), g = jax.value_and_grad(
                loss_fn, has_aux=True)(p, x, y, k_step)
            grads.append(g)
            losses.append(float(loss))
        gmean = jax.tree.map(lambda *gs: sum(gs) / n_dev, *grads)
        updates, o = opt.update(gmean, o, p)
        p = optax.apply_updates(p, updates)
        step_losses.append(np.mean(losses))

    run = make_sharded_online_scanned_steps(
        model, opt, beta=0.1, lam=5.0, mesh=mesh,
        batch_size=n_dev * local_bs, n_steps_per_call=n_steps,
        image_size=16)
    p_sh, _, m_sh = run(replicate(mesh, params),
                        replicate(mesh, opt.init(params)),
                        jax.random.key(1), 0)

    np.testing.assert_allclose(np.asarray(m_sh["loss"]), step_losses,
                               rtol=1e-4)
    # params atol: early Adam steps are ~sign(grad)·lr, so pmean-vs-host
    # summation-order noise on near-zero gradient entries moves params by
    # O(lr)=1e-3; the exact composition is already pinned by the per-step
    # loss equality above (step 2's loss is computed on step 1's params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-3), p_sh, p)


def test_dr_sharded_online_trains():
    from cdgvae_tpu.parallel.mesh import make_mesh, replicate
    from cdgvae_tpu.train.online import (make_sharded_online_scanned_steps,
                                         dr_batch_fn)
    cfg = dict(CFG, node=5)
    model, _ = build_pendulum_model(cfg, spurious=True)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    mesh = make_mesh(8)
    run = make_sharded_online_scanned_steps(
        model, opt, beta=0.1, lam=20.0, mesh=mesh, batch_size=16,
        n_steps_per_call=5,
        sample_batch_builder=lambda bs: dr_batch_fn(bs, image_size=16))
    _, _, m = run(replicate(mesh, params), replicate(mesh, opt.init(params)),
                  jax.random.key(1), 0)
    losses = np.asarray(m["loss"])
    assert np.all(np.isfinite(losses)) and losses[-1] < losses[0]


def test_online_semi_scanned_steps_train_and_are_deterministic():
    """Online semi-sup: infinite unlabeled stream (fresh DGP draw per
    step), fixed labeled set subsampled on device per step."""
    from cdgvae_tpu.data.pendulum import PendulumDataset
    from cdgvae_tpu.train.online import make_online_scanned_steps_semi
    model, _ = build_pendulum_model(CFG)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    ds = PendulumDataset(image_size=16, train=True, labeled_ratio=0.5,
                         seed=1, n=200)
    x_l, y_l = jax.numpy.asarray(ds.x_data), jax.numpy.asarray(ds.y_data)
    run = make_online_scanned_steps_semi(
        model, opt, beta=0.1, lam=5.0, batch_size=16, batch_size_l=8,
        n_steps_per_call=6, image_size=16)
    p1, o1, m1 = run(params, opt.init(params), x_l, y_l,
                     jax.random.key(1), 0)
    losses = np.asarray(m1["loss"])
    assert np.all(np.isfinite(losses))
    _, _, m2 = run(p1, o1, x_l, y_l, jax.random.key(1), 6)
    assert float(np.asarray(m2["loss"]).mean()) < losses[0]
    _, _, m1b = run(params, opt.init(params), x_l, y_l,
                    jax.random.key(1), 0)
    np.testing.assert_array_equal(losses, np.asarray(m1b["loss"]))


def test_sharded_online_semi_trains():
    """Multi-chip online semi-sup: per-device unlabeled DGP draws +
    per-shard labeled subsampling, one gradient pmean per step."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cdgvae_tpu.data.pendulum import PendulumDataset
    from cdgvae_tpu.parallel.mesh import make_mesh, replicate
    from cdgvae_tpu.train.online import make_sharded_online_scanned_steps_semi
    model, _ = build_pendulum_model(CFG)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    mesh = make_mesh(8)
    ds = PendulumDataset(image_size=16, train=True, labeled_ratio=0.5,
                         seed=1, n=200)
    n_l = (len(ds.x_data) // 8) * 8
    sh = NamedSharding(mesh, P("dp"))
    x_l = jax.device_put(ds.x_data[:n_l], sh)
    y_l = jax.device_put(ds.y_data[:n_l], sh)
    run = make_sharded_online_scanned_steps_semi(
        model, opt, beta=0.1, lam=5.0, mesh=mesh, batch_size=16,
        batch_size_l=8, n_steps_per_call=5, image_size=16)
    _, _, m = run(replicate(mesh, params), replicate(mesh, opt.init(params)),
                  x_l, y_l, jax.random.key(1), 0)
    losses = np.asarray(m["loss"])
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


def test_online_run_from_loss_requires_local_bs_under_mesh():
    """Passing a mesh without local_bs must raise at trace time — a silent
    0 offset would zero every device's corruption-mask offset and make the
    sampled distribution device-count-dependent again."""
    import pytest
    from cdgvae_tpu.parallel.mesh import make_mesh
    from cdgvae_tpu.train.online import make_online_run_from_loss

    with pytest.raises(ValueError, match="local_bs"):
        make_online_run_from_loss(lambda p, x, y, r: (0.0, {}),
                                  optax.adam(1e-3),
                                  lambda rng, index_offset=0: (None, None),
                                  4, mesh=make_mesh(8))

"""Scan-compiled trainer tests: one-dispatch epochs match the step math and
reduce loss."""
import numpy as np
import pytest
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


def _jit_decode(u8):
    """The in-step uint8 decode as its own program — XLA compiles
    (x-127.5)/127.5 to the same instruction sequence it uses inside the
    scanned trainer, so this (unlike the eager op-by-op decode, which
    differs by 1 ULP on some pixels) is the bitwise ground truth for the
    uint8-storage exactness tests."""
    return jax.jit(lambda u: (u.astype(jnp.float32) - 127.5) / 127.5)(u8)


def test_scanned_uint8_storage_matches_f32():
    """uint8 dataset storage (quantize_images) trains the SAME trajectory as
    the f32 trainer fed the decoded values: the in-step decode is exact
    ((u8-127.5)/127.5 is the PNG loader's own math), but the u8 scan
    operand changes XLA's downstream fusion choices, so params may drift by
    ULPs per step — the same class of difference as recompiling under a new
    XLA version. Losses must agree tightly; params closely."""
    from cdgvae_tpu.train.scanned import quantize_images

    model, _ = build_pendulum_model(CFG)
    opt = optax.adam(1e-3)
    kx, ky = jax.random.split(jax.random.key(1))
    x = jnp.tanh(jax.random.normal(kx, (128, 16, 16, 3)))
    y = jax.random.uniform(ky, (128, 5))
    x_u8 = quantize_images(x)
    assert x_u8.dtype == jnp.uint8
    x_deq = _jit_decode(x_u8)

    step = unjitted_step(model, opt, beta=0.1, lam=5.0)
    run = make_scanned_epochs(step, batch_size=32, n_epochs_per_call=3)
    outs = []
    for xd in (x_u8, x_deq):
        params = model.init(jax.random.key(0))
        p, _, m = run(params, opt.init(params), xd, y, jax.random.key(2), 0)
        outs.append((jax.device_get(p), np.asarray(m["loss"])))
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][0]),
                    jax.tree_util.tree_leaves(outs[1][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


def test_sharded_scanned_uint8_storage_matches_f32():
    """Same contract on the multi-chip trainer: a uint8-sharded dataset
    trains the dequantized-f32 trajectory (losses tight, params close —
    see the single-device test's docstring for the ULP caveat)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cdgvae_tpu.parallel.mesh import make_mesh
    from cdgvae_tpu.train.scanned import (make_sharded_scanned_epochs,
                                          quantize_images)

    model, _ = build_pendulum_model(CFG)
    mesh = make_mesh(8)
    opt = optax.adam(1e-3)
    run = make_sharded_scanned_epochs(model, opt, 0.1, 5.0, mesh,
                                      batch_size=32, n_epochs_per_call=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.tanh(rng.normal(size=(128, 16, 16, 3))), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(128, 5)), jnp.float32)
    x_u8 = quantize_images(x)
    x_deq = _jit_decode(x_u8)
    ys = jax.device_put(y, NamedSharding(mesh, P("dp")))

    outs = []
    for xd in (x_u8, x_deq):
        xs = jax.device_put(xd, NamedSharding(mesh, P("dp")))
        params = model.init(jax.random.key(0))
        p, _, ms = run(params, opt.init(params), xs, ys, jax.random.key(1),
                       0)
        outs.append((jax.device_get(p), np.asarray(ms["loss"])))
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][0]),
                    jax.tree_util.tree_leaves(outs[1][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


def test_uint8_quantize_png_roundtrip_exact():
    """For PNG-sourced data (the reference's own representation) the u8
    storage round trip is EXACT: quantize(decode(u)) == u for every byte,
    and the in-jit decode matches the png_io loader's values to 1 ULP."""
    from cdgvae_tpu.train.scanned import quantize_images

    u = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, size=(64, 8, 8, 3), dtype=np.uint8))
    x = _jit_decode(u)
    np.testing.assert_array_equal(np.asarray(quantize_images(x)),
                                  np.asarray(u))
    host = (np.asarray(u, np.float32) - 127.5) / 127.5
    np.testing.assert_allclose(np.asarray(x), host, atol=1.3e-7, rtol=0)


def test_scanned_semi_runs_and_improves():
    """Semi-supervised scanned trainer: labeled stream cycles correctly
    (n_l < steps*batch_sizeL forces multiple reshuffles) and loss drops."""
    import optax
    from cdgvae_tpu.factory import build_pendulum_model
    from cdgvae_tpu.train.steps import make_semi_step
    from cdgvae_tpu.train.scanned import make_scanned_epochs_semi

    cfg = dict(model="CDGVAE", node=4, scm="linear", flow_num=1,
               inverse_loop=100, factor=[1, 1, 2], image_size=64,
               adjacency_scaling=True)
    model, _ = build_pendulum_model(cfg)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    rng = np.random.default_rng(0)
    x_u = jnp.asarray(np.tanh(rng.normal(size=(64, 64, 64, 3))),
                      jnp.float32)
    x_l = x_u[:10]
    y_l = jnp.asarray(rng.uniform(size=(10, 5)), jnp.float32)

    raw = make_semi_step(model, opt, beta=0.1, lam=5.0, jit=False)
    run = make_scanned_epochs_semi(raw, batch_size=16, batch_size_l=8,
                                   n_epochs_per_call=3)
    p, o, ms = run(params, opt.init(params), x_u, x_l, y_l,
                   jax.random.key(1), 0)
    losses = np.asarray(ms["loss"])
    assert losses.shape == (3,)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_scanned_raises_on_zero_steps():
    """A dataset smaller than the batch must raise a clear error, not
    silently train nothing / crash on empty concat (regression)."""
    import pytest
    model, _ = build_pendulum_model(CFG)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    x = jnp.zeros((4, 16, 16, 3))
    y = jnp.zeros((4, 5))
    run = make_scanned_epochs(unjitted_step(model, opt, 0.1, 5.0),
                              batch_size=8)
    with pytest.raises(ValueError, match="smaller than batch_size"):
        run(params, opt.init(params), x, y, jax.random.key(1), 0)


@pytest.mark.slow
def test_run_scanned_chunks_clamps_small_dataset_and_exact_boundaries():
    """run_scanned_chunks: (a) clamps batch_size to the dataset size
    (smoke runs), (b) post_epoch fires at pred epochs with the EXACT
    post-epoch state (regression: it used to hand out end-of-chunk state
    for mid-chunk epochs)."""
    from cdgvae_tpu.train.loop import run_scanned_chunks
    from cdgvae_tpu.train.steps import make_train_step

    model, _ = build_pendulum_model(CFG)
    opt = optax.adam(1e-3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.tanh(rng.normal(size=(10, 16, 16, 3))), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(10, 5)), jnp.float32)
    raw = make_train_step(model, opt, 0.1, 5.0, jit=False)

    # (a) batch 128 >> 10 samples: must still run (clamped to 10)
    params = model.init(jax.random.key(0))
    seen = {}
    state = run_scanned_chunks(
        raw, (params, opt.init(params)), x, y, jax.random.key(1),
        epochs=7, batch_size=128, chunk=5,
        post_epoch=lambda s, e: seen.setdefault(e, jax.device_get(s[0])),
        post_epoch_pred=lambda e: e == 2)
    # pred splits a chunk at epoch 2 and gates the callback: the natural
    # chunk end at epoch 6 must NOT fire (regression: ungated callbacks
    # like dr_main's viz used to run off-cadence at every chunk boundary)
    assert set(seen) == {2}

    # without a predicate every natural chunk boundary fires (celeba_main
    # relies on this as its cadence)
    seen_nopred = set()
    run_scanned_chunks(
        raw, (model.init(jax.random.key(0)),
              opt.init(model.init(jax.random.key(0)))),
        x, y, jax.random.key(1), epochs=7, batch_size=128, chunk=5,
        post_epoch=lambda s, e: seen_nopred.add(e))
    assert seen_nopred == {4, 6}

    # (b) exactness: replay the same steps eagerly to epoch 2 and compare
    import jax as _jax
    p, o = model.init(jax.random.key(0)), None
    o = opt.init(p)
    for epoch in range(3):
        ekey = _jax.random.fold_in(jax.random.key(1), epoch)
        perm = _jax.random.permutation(ekey, 10)[:10]
        xb, yb = x[perm], y[perm]
        skey = _jax.random.fold_in(ekey, 0)
        p, o, _ = raw(p, o, xb, yb, skey)
    got = jax.tree_util.tree_leaves(seen[2])
    want = jax.tree_util.tree_leaves(p)
    for g, w in zip(got, want):
        # scan vs eager compile differ by fp reassociation only
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-3, atol=1e-5)


def test_sharded_scanned_epochs_on_mesh():
    """Multi-chip scanned trainer (shard_map + explicit pmean): runs on the
    8-device virtual mesh, loss decreases, result params are replicated and
    deterministic across repeat runs."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cdgvae_tpu.parallel.mesh import make_mesh
    from cdgvae_tpu.train.scanned import make_sharded_scanned_epochs

    model, _ = build_pendulum_model(CFG)
    mesh = make_mesh(8)
    opt = optax.adam(1e-3)
    run = make_sharded_scanned_epochs(model, opt, 0.1, 5.0, mesh,
                                      batch_size=32, n_epochs_per_call=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.tanh(rng.normal(size=(128, 16, 16, 3))), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(128, 5)), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    ys = jax.device_put(y, NamedSharding(mesh, P("dp")))

    outs = []
    for _ in range(2):
        params = model.init(jax.random.key(0))
        p, o, ms = run(params, opt.init(params), xs, ys, jax.random.key(1),
                       0)
        losses = np.asarray(ms["loss"])
        assert np.all(np.isfinite(losses)) and losses[-1] < losses[0]
        outs.append(jax.device_get(p))
    for a, b in zip(jax.tree_util.tree_leaves(outs[0]),
                    jax.tree_util.tree_leaves(outs[1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_from_loss_applies_post_update():
    """The generic sharded trainer (any loss_fn) applies the post_update
    hook after every optimizer update — the TVAE sigma-clamp contract
    (reference tabular/modules/train.py:314)."""
    from cdgvae_tpu.parallel.mesh import make_mesh
    from cdgvae_tpu.train.scanned import make_sharded_scanned_epochs_from_loss
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8)
    opt = optax.adam(0.05)  # big steps: drives sigma well below the floor

    def loss_fn(params, x, y, rng):
        pred = x @ params["w"]
        loss = ((pred - y) ** 2).mean() + params["sigma"].sum()
        return loss, {"loss": loss}

    def clamp(params):
        return dict(params, sigma=jnp.clip(params["sigma"], 0.01, 0.1))

    run = make_sharded_scanned_epochs_from_loss(
        loss_fn, opt, mesh, batch_size=16, n_epochs_per_call=3,
        post_update=clamp)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 4)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    ys = jax.device_put(y, NamedSharding(mesh, P("dp")))
    params = {"w": jnp.zeros((4,)), "sigma": jnp.full((3,), 0.05)}
    p, _, ms = run(params, opt.init(params), xs, ys, jax.random.key(0), 0)
    sigma = np.asarray(p["sigma"])
    # gradient alone would push sigma to 0.05 - 9*0.05 < 0; the clamp holds
    assert np.all(sigma >= 0.01 - 1e-7) and np.all(sigma <= 0.1 + 1e-7)
    assert np.all(np.isfinite(np.asarray(ms["loss"])))


def test_pair_infomax_optimizer_matches_separate():
    """The fused (model, discriminator) pair optimizer produces updates and
    states IDENTICAL to applying the two optimizers separately."""
    from cdgvae_tpu.train.steps import pair_infomax_optimizer

    opt_m, opt_d = optax.adam(1e-3), optax.adam(1e-4)
    pair_tx = pair_infomax_optimizer(opt_m, opt_d)
    rng = np.random.default_rng(0)
    p = {"w": jnp.asarray(rng.normal(size=(3, 2)), jnp.float32)}
    d = {"v": jnp.asarray(rng.normal(size=(4,)), jnp.float32)}
    gp = {"w": jnp.asarray(rng.normal(size=(3, 2)), jnp.float32)}
    gd = {"v": jnp.asarray(rng.normal(size=(4,)), jnp.float32)}

    pair_state = pair_tx.init((p, d))
    sm, sd = opt_m.init(p), opt_d.init(d)
    for _ in range(3):
        (up, ud), pair_state = pair_tx.update((gp, gd), pair_state, (p, d))
        um, sm = opt_m.update(gp, sm, p)
        umd, sd = opt_d.update(gd, sd, d)
        for a, b in zip(jax.tree_util.tree_leaves((up, ud)),
                        jax.tree_util.tree_leaves((um, umd))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        p = optax.apply_updates(p, up)
        d = optax.apply_updates(d, ud)
    for a, b in zip(jax.tree_util.tree_leaves(pair_state),
                    jax.tree_util.tree_leaves((sm, sd))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_marginal_epsilon_roll_never_identity():
    """The 'roll' marginal (used by the sharded InfoMax trainer) never
    pairs a row with its own epsilon — even at local batch 2, where a
    random permutation is the identity half the time."""
    from cdgvae_tpu.train.steps import marginal_epsilon

    for n in (2, 3, 16):
        eps = jnp.arange(n, dtype=jnp.float32)[:, None]
        for seed in range(20):
            rolled = np.asarray(marginal_epsilon(
                eps, jax.random.key(seed), "roll"))
            assert not np.any(rolled[:, 0] == np.arange(n)), (n, seed)
    # permutation mode reproduces the reference's shuffle (a permutation)
    eps = jnp.arange(8, dtype=jnp.float32)[:, None]
    out = np.asarray(marginal_epsilon(eps, jax.random.key(0),
                                      "permutation"))
    assert sorted(out[:, 0].tolist()) == list(range(8))
    # roll with a single-row batch is a trace-time error
    import pytest
    with pytest.raises(ValueError):
        marginal_epsilon(jnp.ones((1, 2)), jax.random.key(0), "roll")


def test_quantize_matches_png_encoder():
    """quantize_images (device) and png_io._to_uint8 (host) implement the
    same encode math from two codebases; assert byte equality over a dense
    sweep incl. overshoot values so they cannot drift (both use
    round-half-to-even)."""
    from cdgvae_tpu.data.png_io import _to_uint8
    from cdgvae_tpu.train.scanned import quantize_images

    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.uniform(-1.1, 1.1, 4096),              # incl. out-of-range
        (np.arange(256) - 127.5) / 127.5,          # every exact byte
        (np.arange(255) - 127.0) / 127.5,          # half-way points
    ]).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(quantize_images(jnp.asarray(x))), _to_uint8(x))


def test_scanned_semi_uint8_storage_matches_f32():
    """Semi-supervised u8 contract (both streams route through
    _unflatten_item): uint8 storage trains the same trajectory as the
    dequantized-f32 streams — losses tight, params close (ULP caveat as in
    the supervised test)."""
    from cdgvae_tpu.train.steps import make_semi_step
    from cdgvae_tpu.train.scanned import (make_scanned_epochs_semi,
                                          quantize_images)

    model, _ = build_pendulum_model(CFG)
    opt = optax.adam(1e-3)
    rng = np.random.default_rng(3)
    x_u = jnp.asarray(np.tanh(rng.normal(size=(64, 16, 16, 3))), jnp.float32)
    x_l = x_u[:16]
    y_l = jnp.asarray(rng.uniform(size=(16, 5)), jnp.float32)
    xu_u8, xl_u8 = quantize_images(x_u), quantize_images(x_l)
    xu_deq, xl_deq = _jit_decode(xu_u8), _jit_decode(xl_u8)

    raw = make_semi_step(model, opt, beta=0.1, lam=5.0, jit=False)
    run = make_scanned_epochs_semi(raw, batch_size=16, batch_size_l=8,
                                   n_epochs_per_call=3)
    outs = []
    for xu, xl in ((xu_u8, xl_u8), (xu_deq, xl_deq)):
        params = model.init(jax.random.key(0))
        p, _, ms = run(params, opt.init(params), xu, xl, y_l,
                       jax.random.key(1), 0)
        outs.append((jax.device_get(p), np.asarray(ms["loss"])))
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][0]),
                    jax.tree_util.tree_leaves(outs[1][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


def test_sharded_semi_uint8_storage_matches_f32():
    """Same u8 contract on the sharded semi trainer (both streams sharded
    over the dp mesh)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cdgvae_tpu.parallel.mesh import make_mesh
    from cdgvae_tpu.train.steps import make_semi_loss_fn
    from cdgvae_tpu.train.scanned import (
        make_sharded_scanned_epochs_semi_from_loss, quantize_images)

    model, _ = build_pendulum_model(CFG)
    mesh = make_mesh(8)
    opt = optax.adam(1e-3)
    loss_fn = make_semi_loss_fn(model, beta=0.1, lam=5.0)
    run = make_sharded_scanned_epochs_semi_from_loss(
        loss_fn, opt, mesh, batch_size=16, batch_size_l=8,
        n_epochs_per_call=2)
    rng = np.random.default_rng(4)
    x_u = jnp.asarray(np.tanh(rng.normal(size=(64, 16, 16, 3))), jnp.float32)
    x_l = x_u[:16]
    y_l = jnp.asarray(rng.uniform(size=(16, 5)), jnp.float32)
    xu_u8, xl_u8 = quantize_images(x_u), quantize_images(x_l)
    xu_deq, xl_deq = _jit_decode(xu_u8), _jit_decode(xl_u8)
    yl_s = jax.device_put(y_l, NamedSharding(mesh, P("dp")))

    outs = []
    for xu, xl in ((xu_u8, xl_u8), (xu_deq, xl_deq)):
        xus = jax.device_put(xu, NamedSharding(mesh, P("dp")))
        xls = jax.device_put(xl, NamedSharding(mesh, P("dp")))
        params = model.init(jax.random.key(0))
        p, _, ms = run(params, opt.init(params), xus, xls, yl_s,
                       jax.random.key(1), 0)
        outs.append((jax.device_get(p), np.asarray(ms["loss"])))
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][0]),
                    jax.tree_util.tree_leaves(outs[1][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


def test_scanned_semi_uint8_storage_matches_f32():
    """The SAME u8 contract on the semi-supervised trainer: BOTH streams
    (unlabeled + labeled) pass through the in-step decode, so quantized
    storage must train the dequantized-f32 trajectory (losses tight,
    params close — ULP caveat as in the supervised test). Closes the
    round-1 advisor gap: the single-device semi builder was the last
    scanned trainer whose uint8 path was documented but untested."""
    import optax
    from cdgvae_tpu.factory import build_pendulum_model
    from cdgvae_tpu.train.steps import make_semi_step
    from cdgvae_tpu.train.scanned import (make_scanned_epochs_semi,
                                          quantize_images)

    model, _ = build_pendulum_model(CFG)
    opt = optax.adam(1e-3)
    kx, ky = jax.random.split(jax.random.key(3))
    x_u = jnp.tanh(jax.random.normal(kx, (64, 16, 16, 3)))
    x_l = x_u[:10]
    y_l = jax.random.uniform(ky, (10, 5))
    u8_u, u8_l = quantize_images(x_u), quantize_images(x_l)
    deq_u, deq_l = _jit_decode(u8_u), _jit_decode(u8_l)

    raw = make_semi_step(model, opt, beta=0.1, lam=5.0, jit=False)
    run = make_scanned_epochs_semi(raw, batch_size=16, batch_size_l=8,
                                   n_epochs_per_call=3)
    outs = []
    for xu, xl in ((u8_u, u8_l), (deq_u, deq_l)):
        params = model.init(jax.random.key(0))
        p, _, m = run(params, opt.init(params), xu, xl, y_l,
                      jax.random.key(2), 0)
        outs.append((jax.device_get(p), np.asarray(m["loss"])))
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][0]),
                    jax.tree_util.tree_leaves(outs[1][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)

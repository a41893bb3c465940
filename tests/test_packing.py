"""Small-leaf parameter packing (ops/packing.py): layout bijection and
exact training equivalence.

The packed layout is a pure re-layout of the params pytree (docs/PERF.md
round-4 DMA pass) — these tests pin the contract: bit-identical values
through pack/unpack, identical training trajectories packed vs unpacked,
and the layout-neutral checkpoint conversion (adam_state_map)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cdgvae_tpu.models.celeba import CelebACDGVAE, celeba_B, SMILE_NODES
from cdgvae_tpu.data.celeba import synthetic_celeba
from cdgvae_tpu.ops.causal import CausalGraph
from cdgvae_tpu.ops.packing import Packer, adam_state_map
from cdgvae_tpu.train.celeba_steps import celeba_unjitted_step


def _tiny_model():
    graph = CausalGraph(celeba_B(SMILE_NODES, 0), scm="linear")
    return CelebACDGVAE(graph, latent_dim=6, image_size=32, conv_dim=4)


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pack_unpack_roundtrip_bitexact():
    model = _tiny_model()
    params = model.init(jax.random.key(0))
    packer = Packer(params)
    packed = packer.pack(params)
    # a real reduction happened: the SAGAN+ResNet tree has ~hundreds of
    # small leaves; the packed form carries only the big ones + flats
    assert packer.n_small > 100
    assert len(jax.tree_util.tree_leaves(packed)) == \
        packer.n_big + len(packed["packed"])
    _tree_equal(packer.unpack(packed), params)


def test_pack_rejects_foreign_structure():
    model = _tiny_model()
    params = model.init(jax.random.key(0))
    packer = Packer(params)
    with pytest.raises(ValueError, match="structure"):
        packer.pack({"encoder": params["encoder"]})


def test_non_float_and_large_leaves_stay_big():
    tree = {"w": jnp.zeros((100, 100)),          # > max_size
            "idx": jnp.arange(5),                 # int: never packed
            "b": jnp.ones((7,), jnp.float32),     # packed
            "h": jnp.ones((3,), jnp.bfloat16)}    # packed, own dtype flat
    packer = Packer(tree, max_size=64)
    packed = packer.pack(tree)
    assert packer.n_small == 2 and packer.n_big == 2
    assert set(packed["packed"]) == {"float32", "bfloat16"}
    _tree_equal(packer.unpack(packed), tree)


def test_packed_loss_and_grads_match_unpacked():
    """At identical params the packed layout computes the same loss and the
    same gradients (up to fp reassociation between the two compiled
    programs). This is the deterministic core of the equivalence —
    trajectories beyond step 1 are chaotic under Adam (update ≈ sign(g)·lr
    for near-zero-gradient elements, so benign fp noise flips signs), and
    are checked loosely in test_packed_training_trajectory_agrees."""
    from cdgvae_tpu.train.celeba_steps import make_celeba_loss_fn
    model = _tiny_model()
    x, y = synthetic_celeba(n=4, img_size=32, seed=0)
    x, y = jnp.asarray(x), jnp.asarray(y)
    params = model.init(jax.random.key(0))
    packer = Packer(params)
    loss_u = make_celeba_loss_fn(model, beta=0.1, lam=5.0)
    rng = jax.random.key(7)

    (lu, mu), gu = jax.jit(jax.value_and_grad(loss_u, has_aux=True))(
        params, x, y, rng)
    (lp, mp), gp = jax.jit(jax.value_and_grad(
        lambda pp, x, y, r: loss_u(packer.unpack(pp), x, y, r),
        has_aux=True))(packer.pack(params), x, y, rng)

    np.testing.assert_allclose(float(lu), float(lp), rtol=1e-5)
    for k in mu:
        np.testing.assert_allclose(np.asarray(mu[k]), np.asarray(mp[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    # grads: pack the unpacked grads (gradients re-layout like params) and
    # compare flat-for-flat / big-for-big
    gu_packed = packer.pack(gu)
    for dk in gp["packed"]:
        np.testing.assert_allclose(
            np.asarray(gu_packed["packed"][dk]),
            np.asarray(gp["packed"][dk]), rtol=1e-3, atol=1e-3,
            err_msg=f"packed flat {dk}")
    for i, (a, b) in enumerate(zip(gu_packed["big"], gp["big"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3,
                                   err_msg=f"big leaf {i}")


@pytest.mark.slow
def test_packed_training_trajectory_agrees():
    """3 Adam steps packed vs unpacked: metrics stay within the chaotic-
    amplification band (sub-percent; see the companion test's docstring for
    why bitwise equality is not expected beyond step 1), and the final
    unpacked params round-trip through the packed run's layout."""
    model = _tiny_model()
    opt = optax.adam(1e-3)
    x, y = synthetic_celeba(n=8, img_size=32, seed=0)
    x, y = jnp.asarray(x), jnp.asarray(y)

    params0 = model.init(jax.random.key(0))
    packer = Packer(params0)

    step_u = jax.jit(celeba_unjitted_step(model, opt, beta=0.1, lam=5.0))
    step_p = jax.jit(celeba_unjitted_step(model, opt, beta=0.1, lam=5.0,
                                          packer=packer))

    pu, su = params0, opt.init(params0)
    pp, sp = packer.pack(params0), opt.init(packer.pack(params0))
    for i in range(3):
        rng = jax.random.key(100 + i)
        pu, su, mu = step_u(pu, su, x[:4], y[:4], rng)
        pp, sp, mp = step_p(pp, sp, x[:4], y[:4], rng)
        for k in mu:
            np.testing.assert_allclose(np.asarray(mu[k]), np.asarray(mp[k]),
                                       rtol=1e-2, atol=1e-3, err_msg=k)
    un = packer.unpack(pp)
    assert jax.tree_util.tree_structure(un) == \
        jax.tree_util.tree_structure(pu)


@pytest.mark.slow
def test_adam_state_map_roundtrip():
    model = _tiny_model()
    params = model.init(jax.random.key(0))
    packer = Packer(params)
    opt = optax.adam(1e-3)
    # build a non-trivial state by running one unpacked step
    step = jax.jit(celeba_unjitted_step(model, opt, beta=0.1, lam=5.0))
    x, y = synthetic_celeba(n=4, img_size=32, seed=1)
    _, state, _ = step(params, opt.init(params), jnp.asarray(x),
                       jnp.asarray(y), jax.random.key(2))
    packed_state = adam_state_map(state, packer.pack)
    # count untouched, moments re-laid out
    assert int(packed_state[0].count) == int(state[0].count)
    assert "packed" in packed_state[0].mu
    back = adam_state_map(packed_state, packer.unpack)
    _tree_equal(back[0].mu, state[0].mu)
    _tree_equal(back[0].nu, state[0].nu)
    # and a packed step accepts the converted state (resume-with-packing)
    step_p = jax.jit(celeba_unjitted_step(model, opt, beta=0.1, lam=5.0,
                                          packer=packer))
    step_p(packer.pack(params), packed_state, jnp.asarray(x),
           jnp.asarray(y), jax.random.key(3))


@pytest.mark.slow
def test_packed_bf16_loss_matches_unpacked_bf16():
    """The packed bf16 path casts the FLAT buffers before unpacking
    (per-buffer casts instead of ~1000 per-leaf casts); cast commutes
    with slicing, so the loss must match the unpacked bf16 path."""
    from cdgvae_tpu.train.celeba_steps import make_celeba_loss_fn
    model = _tiny_model()
    x, y = synthetic_celeba(n=4, img_size=32, seed=0)
    x, y = jnp.asarray(x), jnp.asarray(y)
    params = model.init(jax.random.key(0))
    packer = Packer(params)
    rng = jax.random.key(7)

    lu, mu = jax.jit(make_celeba_loss_fn(model, 0.1, 5.0,
                                         compute_dtype=jnp.bfloat16))(
        params, x, y, rng)
    lp, mp = jax.jit(make_celeba_loss_fn(model, 0.1, 5.0,
                                         compute_dtype=jnp.bfloat16,
                                         packer=packer))(
        packer.pack(params), x, y, rng)
    np.testing.assert_allclose(float(lu), float(lp), rtol=2e-2)
    for k in mu:
        np.testing.assert_allclose(np.asarray(mu[k]), np.asarray(mp[k]),
                                   rtol=2e-2, atol=2e-2, err_msg=k)

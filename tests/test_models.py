"""Model forward-pass tests: shapes, API parity, GAM decoder equivalence to
per-block evaluation, and mask disjointness guarantees."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cdgvae_tpu import nn
from cdgvae_tpu.factory import build_pendulum_model, pendulum_B
from cdgvae_tpu.models.vae import pendulum_masks
from cdgvae_tpu.models.classifier import (Discriminator, FactorClassifier,
                                          DownstreamClassifier)

CFG = dict(model="CDGVAE", node=4, scm="linear", flow_num=1,
           inverse_loop=100, factor=[1, 1, 2], image_size=64,
           adjacency_scaling=True)


def test_pendulum_B_scaling():
    B = pendulum_B(4)
    assert B[0, 2] == 0.5 and B[1, 3] == 0.5
    B = pendulum_B(4, adjacency_scaling=False)
    assert B[0, 2] == 1.0


@pytest.mark.parametrize("name", ["VAE", "CDGVAE"])
def test_forward_shapes(name):
    cfg = dict(CFG, model=name)
    model, _ = build_pendulum_model(cfg)
    params = model.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (8, 64, 64, 3))
    out = model(params, x, rng=jax.random.key(2))
    assert out.mean.shape == (8, 4)
    assert out.logvar.shape == (8, 4)
    assert out.latent.shape == (8, 4)
    assert out.align_latent.shape == (8, 4)
    assert out.xhat.shape == (8, 64, 64, 3)
    assert float(jnp.abs(out.xhat).max()) <= 1.0
    if name == "CDGVAE":
        assert out.xhat_separated.shape == (3, 8, 3 * 64 * 64)

    # deterministic encode: epsilon == mean
    out_det = model(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_det.epsilon),
                                  np.asarray(out_det.mean))
    # alignment branch == deterministic latent
    np.testing.assert_allclose(np.asarray(out_det.align_latent),
                               np.asarray(out_det.latent), rtol=1e-5)


def test_stacked_gam_decoder_equals_per_block_mlps():
    """The single batched-matmul GAM decoder must equal evaluating each
    block's MLP separately (the reference's Python loop semantics)."""
    cfg = dict(CFG)
    model, _ = build_pendulum_model(cfg)
    params = model.init(jax.random.key(0))
    latent = jax.random.normal(jax.random.key(1), (5, 4))

    xhat_sep, xhat = model.decode(params, latent)

    blocks = [latent[:, [0]], latent[:, [1]], latent[:, [2, 3]]]
    dec = params["decoder"]
    n_hidden = sum(1 for key in dec if key.startswith("layer"))
    for k, blk in enumerate(blocks):
        # pad block to kmax, then run that slice of the stacked params
        pad = jnp.pad(blk, ((0, 0), (0, model.kmax - blk.shape[1])))
        h = pad
        for i in range(n_hidden):
            W = dec[f"layer{i}"]["w"][k]
            b = dec[f"layer{i}"]["b"][k, 0]
            h = jax.nn.elu(h @ W + b)
        # band-sliced final layer: live columns match the per-block MLP,
        # masked-out columns are exactly zero
        c0, c1 = model._bands[k]
        h = h @ dec["out"][f"w{k}"] + dec["out"][f"b{k}"]
        np.testing.assert_allclose(np.asarray(xhat_sep[k, :, c0:c1]),
                                   np.asarray(h), rtol=2e-2, atol=2e-5)
        dead = np.delete(np.asarray(xhat_sep[k]), np.s_[c0:c1], axis=1)
        np.testing.assert_array_equal(dead, 0.0)

    masks = pendulum_masks(64)
    manual = np.tanh(sum(
        np.asarray(xhat_sep[k]).reshape(-1, 64, 64, 3) * masks[k]
        for k in range(3)))
    np.testing.assert_allclose(np.asarray(xhat), manual, rtol=1e-4,
                               atol=1e-5)


def test_decode_fast_matches_masked_decode():
    """Band-sliced decode must equal the reference-style masked sum decode
    exactly, for both the plain and DR (spurious) wirings."""
    for spurious, node in [(False, 4), (True, 5)]:
        cfg = dict(CFG, node=node)
        model, _ = build_pendulum_model(cfg, spurious=spurious)
        assert model._bands is not None
        params = model.init(jax.random.key(0))
        latent = jax.random.normal(jax.random.key(1), (6, node))
        _, xhat = model.decode(params, latent)
        xhat_fast = model.decode_fast(params, latent)
        np.testing.assert_allclose(np.asarray(xhat_fast), np.asarray(xhat),
                                   rtol=1e-5, atol=1e-6)

        out_fast = model(params, jnp.tanh(jax.random.normal(
            jax.random.key(2), (4, 64, 64, 3))), rng=jax.random.key(3),
            fast=True)
        assert out_fast.xhat_separated is None


def test_masks_partition_image():
    masks = pendulum_masks(64)
    np.testing.assert_array_equal(masks.sum(axis=0), np.ones((64, 64, 3)))


def test_dr_block_indices_wire_spurious_latent():
    cfg = dict(CFG, node=5)
    model, _ = build_pendulum_model(cfg, spurious=True)
    assert model.block_indices == [[0, 4], [1, 4], [2, 3, 4]]
    params = model.init(jax.random.key(0))
    latent = jax.random.normal(jax.random.key(1), (3, 5))
    _, xhat = model.decode(params, latent)
    # spurious latent influences every block
    latent2 = latent.at[:, 4].add(1.0)
    _, xhat2 = model.decode(params, latent2)
    d = np.abs(np.asarray(xhat2 - xhat))
    assert d[:, :20].max() > 0 and d[:, 20:51].max() > 0 \
        and d[:, 51:].max() > 0


def test_auxiliary_models():
    disc = Discriminator(node=4, image_size=32)
    dp = disc.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (6, 32, 32, 3))
    z = jax.random.normal(jax.random.key(2), (6, 4))
    assert disc(dp, x, z).shape == (6, 1)

    masks = pendulum_masks(32, k=3)
    masks4 = np.concatenate([masks, masks[-1:]], axis=0)
    clf = FactorClassifier(masks4, node=4, image_size=32)
    cp = clf.init(jax.random.key(3))
    assert clf(cp, x).shape == (6, 4)

    down = DownstreamClassifier(4)
    dpp = down.init(jax.random.key(4))
    out = down(dpp, z)
    assert out.shape == (6, 1)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_stacked_classifier_equals_loop():
    """FactorClassifier's stacked evaluation == per-node masked MLPs."""
    masks = pendulum_masks(16, k=3)
    masks = np.concatenate([masks, masks[-1:]], axis=0)
    clf = FactorClassifier(masks, node=4, image_size=16)
    p = clf.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (4, 16, 16, 3))
    got = np.asarray(clf(p, x))
    for j in range(4):
        h = (x * masks[j]).reshape(4, -1)
        sub = {f"layer{i}": {"w": p["classify"][f"layer{i}"]["w"][j],
                             "b": p["classify"][f"layer{i}"]["b"][j, 0]}
               for i in range(3)}
        expect = nn.mlp(sub, h)
        np.testing.assert_allclose(got[:, j], np.asarray(expect)[:, 0],
                                   rtol=2e-2, atol=2e-5)

"""High-level API tests: train tiny -> checkpoint -> load -> infer."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from cdgvae_tpu.factory import build_pendulum_model
from cdgvae_tpu.utils.checkpoint import save_checkpoint
from cdgvae_tpu.api import LoadedModel

CFG = dict(model="CDGVAE", node=4, scm="linear", flow_num=1,
           inverse_loop=100, factor=[1, 1, 2], image_size=16,
           adjacency_scaling=True)


def test_loaded_model_roundtrip(tmp_path):
    model, _ = build_pendulum_model(CFG)
    params = model.init(jax.random.key(0))
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, params, config=CFG)

    m = LoadedModel.load(ckpt)
    x = np.tanh(np.random.default_rng(0).normal(
        size=(4, 16, 16, 3))).astype(np.float32)

    z = m.encode(x)
    assert z.shape == (4, 4)
    xr = m.reconstruct(x)
    assert xr.shape == (4, 16, 16, 3)
    xs = m.sample(6)
    assert xs.shape == (6, 16, 16, 3)

    # counterfactual on a sink factor leaves the light band unchanged
    xc = m.counterfactual(x, do_index=3, value=2.0)
    bands = 16 * 20 // 64  # light rows at 16px
    np.testing.assert_allclose(xc[:, :bands], xr[:, :bands], atol=1e-6)


def test_api_no_retrace_across_calls(tmp_path):
    """counterfactual()/sample() must not retrace per call (each retrace is
    a fresh 30-450s compile on the TPU backend) — the jitted fns are built
    once at load."""
    model, _ = build_pendulum_model(CFG)
    params = model.init(jax.random.key(0))
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, params, config=CFG)
    m = LoadedModel.load(ckpt)
    x = np.zeros((4, 16, 16, 3), np.float32)
    m.counterfactual(x, do_index=1, value=0.5)
    m.sample(4, rng=jax.random.key(0))
    n_cf = m._cf._cache_size()
    n_gen = m._gen._cache_size()
    m.counterfactual(x, do_index=1, value=0.9)  # same shape+do_index
    m.sample(4, rng=jax.random.key(1))
    assert m._cf._cache_size() == n_cf
    assert m._gen._cache_size() == n_gen

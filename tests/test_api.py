"""High-level API tests: train tiny -> checkpoint -> load -> infer."""
import numpy as np
import pytest
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


def _tiny_celeba_loaded_model(tmp_path, init_key=0):
    """Save+load a tiny random-init celeba checkpoint through the full
    LoadedModel path (shared by the dispatch and leakage tests)."""
    from cdgvae_tpu.models.celeba import (CelebACDGVAE, celeba_B,
                                          SMILE_NODES)
    from cdgvae_tpu.ops.causal import CausalGraph

    cfg = dict(model="CDGVAE", causal_structure=0, node=6, latent_dim=6,
               scm="linear", flow_num=1, inverse_loop=100,
               adjacency_scaling=True, img_size=32, conv_dim=4)
    B = celeba_B(SMILE_NODES, 0, True)
    graph = CausalGraph(B, scm="linear", flow_num=1, inverse_loop=100)
    model = CelebACDGVAE(graph, latent_dim=6, image_size=32, conv_dim=4)
    params = model.init(jax.random.key(init_key))
    ckpt = str(tmp_path / "celeba_ck")
    save_checkpoint(ckpt, params, config=cfg)
    return LoadedModel.load(ckpt)


@pytest.mark.slow
def test_loaded_model_celeba(tmp_path):
    """LoadedModel dispatches celeba checkpoints (dual latent, per-sample
    masks from the input channels); sampling is rejected with a clear
    message since it needs segmentation masks."""
    import pytest

    m = _tiny_celeba_loaded_model(tmp_path)
    x = np.random.default_rng(0).uniform(
        size=(2, 32, 32, 8)).astype(np.float32)
    z = m.encode(x)
    assert z.shape == (2, 6)
    xr = m.reconstruct(x)
    assert xr.shape == (2, 32, 32, 3)
    xc = m.counterfactual(x, do_index=0, value=0.5)
    assert xc.shape == (2, 32, 32, 3)
    with pytest.raises(ValueError, match="segmentation masks"):
        m.sample(4)
    # bucketing is forced OFF for celeba: its BatchNorms use batch
    # statistics, so zero-pad rows would shift real outputs
    assert m.bucket_batches is False
    x3 = x[:1].repeat(3, axis=0)
    assert m.reconstruct(x3).shape == (3, 32, 32, 3)


@pytest.mark.slow
def test_celeba_do_leakage_outside_masks_is_zero(tmp_path):
    """End-to-end structural invariant through the serving do-operator:
    do(z_j) may only change pixels inside the segmentation masks of the
    decoder blocks whose parent group contains j or a causal descendant
    of j — every other pixel is bit-unchanged (the masked-GAM sum; the
    celeba analog of the pendulum CDM structural zeros,
    scripts/celeba_study.py measures the trained version)."""
    m = _tiny_celeba_loaded_model(tmp_path, init_key=1)

    # disjoint binary part masks in channels 3..7
    x = np.random.default_rng(1).uniform(
        size=(1, 32, 32, 8)).astype(np.float32)
    x[..., 3:] = 0.0
    for b in range(5):
        x[:, 6 * b: 6 * b + 5, :, 3 + b] = 1.0

    # node 5 (Narrow_Eyes) is a sink: only block 3 ([0, 1, 5]) sees it
    a = m.counterfactual(x, do_index=5, value=-1.5)
    b_ = m.counterfactual(x, do_index=5, value=1.5)
    diff = np.abs(a - b_)[0].max(axis=-1)
    allowed = x[0, :, :, 3 + 3] > 0
    assert diff[allowed].max() > 0  # the intervention does something
    assert diff[~allowed].max() == 0.0


def test_loaded_model_mesh_serving(tmp_path):
    """mesh= shards serving batches over the dp axis; outputs match the
    single-device paths (all per-sample ops, no collectives)."""
    from cdgvae_tpu.parallel.mesh import make_mesh

    model, _ = build_pendulum_model(CFG)
    params = model.init(jax.random.key(0))
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, params, config=CFG)

    m1 = LoadedModel.load(ckpt)
    m8 = LoadedModel.load(ckpt, mesh=make_mesh(8))
    x = np.tanh(np.random.default_rng(0).normal(
        size=(16, 16, 16, 3))).astype(np.float32)
    np.testing.assert_allclose(m8.reconstruct(x), m1.reconstruct(x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(m8.encode(x), m1.encode(x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        m8.counterfactual(x, 1, 0.7), m1.counterfactual(x, 1, 0.7),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(m8.sample(16), m1.sample(16),
                               rtol=1e-5, atol=1e-5)


def test_api_bucketing_reuses_programs(tmp_path):
    """Ragged batch sizes bucket to powers of two: exact results, and
    sizes within a bucket share one compiled program."""
    model, _ = build_pendulum_model(CFG)
    params = model.init(jax.random.key(0))
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, params, config=CFG)
    m = LoadedModel.load(ckpt)
    mref = LoadedModel.load(ckpt, bucket_batches=False)

    rng = np.random.default_rng(0)
    x9 = np.tanh(rng.normal(size=(9, 16, 16, 3))).astype(np.float32)
    np.testing.assert_allclose(m.reconstruct(x9), mref.reconstruct(x9),
                               rtol=1e-6, atol=1e-6)
    n0 = m._fwd._cache_size()
    m.reconstruct(np.concatenate([x9, x9])[:13])  # 13 -> same 16-bucket
    assert m._fwd._cache_size() == n0


def test_api_mesh_small_batch_buckets_to_device_multiple(tmp_path):
    """A 3-row batch on an 8-device mesh pads to a device-divisible
    bucket instead of failing the sharding constraint."""
    from cdgvae_tpu.parallel.mesh import make_mesh

    model, _ = build_pendulum_model(CFG)
    params = model.init(jax.random.key(0))
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, params, config=CFG)
    m8 = LoadedModel.load(ckpt, mesh=make_mesh(8))
    x = np.tanh(np.random.default_rng(0).normal(
        size=(3, 16, 16, 3))).astype(np.float32)
    assert m8.reconstruct(x).shape == (3, 16, 16, 3)
    assert m8.encode(x).shape == (3, 4)


@pytest.mark.slow
def test_loaded_model_tvae_decodes_to_data_space(tmp_path):
    """TVAE checkpoints must decode through tanh + DataTransformer inverse
    (reference tabular/inference_tvae.py:286-310), not return the raw
    transformer-encoded concat."""
    import pandas as pd
    from cdgvae_tpu.data.tabular.datasets import load_tabular_tvae
    from cdgvae_tpu.factory import build_tabular_model, tvae_block_mask
    from cdgvae_tpu.utils.checkpoint import atomic_write
    import pickle

    data = load_tabular_tvae("loan", random_state=8, synthetic_n=1500)
    config = dict(model="TVAE", dataset="loan", scm="linear", flow_num=1,
                  inverse_loop=100, adjacency_scaling=True,
                  input_dim=data.transformer.output_dimensions,
                  tvae_mask=tvae_block_mask(
                      "loan", data.transformer.output_info_list))
    model, _ = build_tabular_model(config)
    params = model.init(jax.random.key(0))
    ckpt = str(tmp_path / "tvae_ck")
    save_checkpoint(ckpt, params, config=config)
    atomic_write(ckpt + "/transformer.pkl", "wb",
                 lambda f: pickle.dump(data.transformer, f))

    m = LoadedModel.load(ckpt)
    xr = m.reconstruct(data.x_data[:4])
    xs = m.sample(8)
    cols = list(data.transformer._column_raw_dtypes.index)
    for df, n in ((xr, 4), (xs, 8)):
        assert isinstance(df, pd.DataFrame)
        assert len(df) == n
        assert list(df.columns) == cols
    assert m.encode(data.x_data[:4]).shape == (4, 3)

    # direct construction without the transformer must refuse loudly
    import pytest
    with pytest.raises(ValueError, match="transformer"):
        LoadedModel(model, params, config)


def test_loaded_model_plain_node5_not_mistaken_for_dr(tmp_path):
    """A non-DR node=5 pendulum checkpoint must reload with plain block
    wiring: the family marker (config['spurious']) decides, not node==5."""
    cfg = dict(CFG, node=5, factor=[1, 1, 3], spurious=False)
    model, _ = build_pendulum_model(cfg)
    params = model.init(jax.random.key(0))
    ckpt = str(tmp_path / "ck5")
    save_checkpoint(ckpt, params, config=cfg)

    m = LoadedModel.load(ckpt)
    x = np.tanh(np.random.default_rng(0).normal(
        size=(2, 16, 16, 3))).astype(np.float32)
    assert m.encode(x).shape == (2, 5)
    assert m.reconstruct(x).shape == (2, 16, 16, 3)


def test_checkpoint_write_is_atomic(tmp_path):
    """A crash mid-write must not destroy the previous good checkpoint."""
    import pickle as _pickle
    from cdgvae_tpu.utils import checkpoint as ck

    ckpt = str(tmp_path / "at")
    save_checkpoint(ckpt, {"w": np.ones(3)}, config={"v": 1})

    class Boom(Exception):
        pass

    real_dump = _pickle.dump

    def exploding_dump(obj, f):
        f.write(b"partial garbage")
        raise Boom()

    _pickle.dump = exploding_dump
    try:
        import pytest
        with pytest.raises(Boom):
            save_checkpoint(ckpt, {"w": np.zeros(3)}, config={"v": 2})
    finally:
        _pickle.dump = real_dump

    from cdgvae_tpu.utils.checkpoint import load_checkpoint
    payload = load_checkpoint(ckpt)  # must still be the epoch-1 state
    np.testing.assert_array_equal(payload["params"]["w"], np.ones(3))
    assert payload["config"] == {"v": 1}

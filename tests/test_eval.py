"""Eval-path tests, including the paper's sharpest structural property:
CDM interventional-robustness entries are EXACTLY zero for CDG-VAE whenever
the checked factor's decoder block is untouched by the intervention
(appendix Table 10 — zero for all parent-leakage pairs; see BASELINE.md)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cdgvae_tpu.factory import build_pendulum_model
from cdgvae_tpu.models.classifier import FactorClassifier
from cdgvae_tpu.models.vae import pendulum_masks
from cdgvae_tpu.eval.inference import (encode_dataset, latent_ranges,
                                       do_grid, do_sweep)
from cdgvae_tpu.eval.metric import cdm_matrices
from cdgvae_tpu.eval import downstream

CFG = dict(model="CDGVAE", node=4, scm="linear", flow_num=1,
           inverse_loop=100, factor=[1, 1, 2], image_size=32,
           adjacency_scaling=True)


def _setup(scm="linear"):
    cfg = dict(CFG, scm=scm)
    model, _ = build_pendulum_model(cfg)
    params = model.init(jax.random.key(0))
    x = jnp.tanh(jax.random.normal(jax.random.key(1), (24, 32, 32, 3)))
    return model, params, x


def test_encode_dataset_and_ranges():
    model, params, x = _setup()
    enc = encode_dataset(model, params, x, batch_size=10)
    assert enc["latent"].shape == (24, 4)
    omin, omax, lmin, lmax = latent_ranges(enc)
    assert (omin <= omax).all() and (lmin <= lmax).all()
    # deterministic: epsilon == mean
    np.testing.assert_array_equal(enc["epsilon"], enc["mean"])


@pytest.mark.parametrize("scm", ["linear", "nonlinear"])
def test_cdm_structural_zeros(scm):
    """Even with UNTRAINED params, the masked GAM decoder forces CDM == 0
    for every (source, checked) pair where the checked factor's block is not
    downstream of the intervention:
      do(length) / do(position) cannot move light or angle scores;
      do(light) cannot move angle; do(angle) cannot move light."""
    model, params, x = _setup(scm)
    masks = pendulum_masks(32, k=3)
    masks4 = np.concatenate([masks, masks[-1:]], axis=0)
    clf = FactorClassifier(masks4, node=4, image_size=32)
    clf_params = clf.init(jax.random.key(5))

    lower, upper = cdm_matrices(model, params, clf, clf_params, x,
                                batch_size=12)
    # indices: 0 light, 1 angle, 2 length, 3 position
    # the decode in the checked factor's band is bit-identical under these
    # interventions, so the score diff is EXACTLY zero (not just small)
    structural_zero_pairs = [(2, 0), (2, 1), (3, 0), (3, 1), (0, 1), (1, 0)]
    for s, c in structural_zero_pairs:
        assert upper[s, c] == 0.0, (s, c, upper[s, c])
        assert lower[s, c] == 0.0, (s, c, lower[s, c])
    # and the intervened factor itself must move its own score (tiny for an
    # untrained model, but strictly nonzero)
    assert upper[0, 0] > 0
    assert upper[1, 1] > 0


def test_do_grid_shapes_and_sink_invariance():
    model, params, x = _setup()
    enc = encode_dataset(model, params, x)
    _, _, lmin, lmax = latent_ranges(enc)
    grid = do_grid(model, params, x[:1], lmin, lmax, n_values=3)
    assert grid.shape == (4, 3, 32, 32, 3)

    # sweeping a sink factor (position) leaves the light band untouched
    sweep = do_sweep(model, params, x[:1], 3, [float(lmin[3]),
                                               float(lmax[3])])
    assert np.abs(sweep[0][:10] - sweep[1][:10]).max() < 1e-6


def test_downstream_sample_efficiency_smoke():
    model, params, x = _setup()
    rng = np.random.default_rng(0)
    y = rng.uniform(size=(24, 5)).astype(np.float32)
    res = downstream.sample_efficiency(model, params, x, y, x, y, seed=0,
                                       repeats=1)
    assert 0 <= res["accuracy_all"] <= 1
    assert res["sample_efficiency"] > 0


def test_worst_group_accuracy():
    from cdgvae_tpu.models.classifier import DownstreamClassifier
    clf = DownstreamClassifier(4)
    p = clf.init(jax.random.key(0))
    reps = np.random.default_rng(0).normal(size=(10, 4)).astype(np.float32)
    targets = np.ones((10, 1), dtype=np.float32)
    groups = np.array([0] * 5 + [1] * 5)
    avg, worst = downstream.worst_group_accuracy(clf, p, reps, targets,
                                                 groups)
    assert 0 <= worst <= avg <= 1

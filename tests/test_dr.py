"""DR family tests: spurious DGP, dataset normalization, robustness eval
plumbing, and the toy DR experiment's qualitative conclusion."""
import numpy as np
import pytest

from cdgvae_tpu.data.pendulum_dr import sample_factors_dr, PendulumDRDataset
from cdgvae_tpu.cli import toy_dr


def test_dr_dgp_spurious_correlation():
    train, test = sample_factors_dr(seed=1, n=4000)
    # columns: light, angle, length, position, background, target
    assert train.shape[1] == 6
    # spurious correlation present in train, absent in test
    tr_corr = np.corrcoef(train[:, 4], train[:, 5])[0, 1]
    te_corr = np.corrcoef(test[:, 4], test[:, 5])[0, 1]
    assert tr_corr > 0.4
    assert abs(te_corr) < 0.15
    # P(bg=1 | tau=1) ~ 0.8 in train
    p = train[train[:, 5] == 1, 4].mean()
    assert 0.7 < p < 0.9


def test_dr_dataset_normalization_touches_first4_only():
    ds = PendulumDRDataset(image_size=16, train=True, n=200, seed=1)
    assert ds.x_data.shape[1:] == (16, 16, 3)
    y = ds.y_data
    assert y[:, :4].min() >= 0.0 and y[:, :4].max() <= 1.0
    assert set(np.unique(y[:, 4])) <= {0.0, 1.0}
    assert set(np.unique(y[:, 5])) <= {0.0, 1.0}


def test_dr_background_renders_blue():
    ds = PendulumDRDataset(image_size=16, train=True, n=80, seed=1)
    bg = ds.y_data[:, 4] == 1.0
    assert bg.any() and (~bg).any()
    rgb = (ds.x_data + 1) / 2
    # blue backgrounds fill the AXES WINDOW only (matplotlib set_facecolor,
    # DR/modules/pendulum_DR.py:164): in-window pixel [3,3] at 16px is blue
    # for bg images and white otherwise; the figure margin (corner [0,0])
    # stays white for everyone
    inside = rgb[:, 3, 3]
    np.testing.assert_allclose(inside[bg][:, 2], 1.0, atol=1e-5)
    np.testing.assert_allclose(inside[bg][:, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(inside[~bg], 1.0, atol=1e-5)
    corner = rgb[:, 0, 0]
    np.testing.assert_allclose(corner, 1.0, atol=1e-5)


@pytest.mark.slow
def test_toy_dr_disentangled_is_robust():
    """The headline qualitative result of appendix Table 9: the disentangled
    classifier keeps its accuracy under the shift; ERM collapses."""
    x, z, y = toy_dr.generate(0, 4000, ratio=0.9)
    tx, tz, ty = toy_dr.generate(1, 4000, ratio=0.5)

    w = toy_dr.fit_logistic(z[:, :1], y)
    dis_train = toy_dr.logistic_acc(w, z[:, :1], y)
    dis_test = toy_dr.logistic_acc(w, tz[:, :1], ty)

    w = toy_dr.fit_logistic(x, y)
    erm_train = toy_dr.logistic_acc(w, x, y)
    erm_test = toy_dr.logistic_acc(w, tx, ty)

    # ERM exploits the spurious feature: great train, poor test
    assert erm_train > 0.85
    assert erm_test < 0.70
    # disentangled: stable across the shift
    assert abs(dis_train - dis_test) < 0.05
    assert dis_test > 0.74


def test_robustness_return_detail_consistency():
    """return_detail exposes per-repeat accuracies whose means equal the
    reported aggregates (the round-4 λ=20 dip-diagnosis plumbing)."""
    import jax
    import numpy as np
    from cdgvae_tpu.factory import build_pendulum_model
    from cdgvae_tpu.eval.downstream import robustness

    config = dict(model="CDGVAE", node=5, scm="linear", flow_num=1,
                  inverse_loop=10, factor=[1, 1, 2], image_size=32,
                  adjacency_scaling=True)
    model, _ = build_pendulum_model(config, spurious=True)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (40, 32, 32, 3)).astype(np.float32)
    y = np.concatenate([rng.uniform(0, 1, (40, 4)),
                        rng.integers(0, 2, (40, 2))],
                       axis=1).astype(np.float32)
    res = robustness(model, params, x, y, x, y, repeats=3, epochs=5,
                     return_detail=True)
    assert len(res["per_repeat_avg"]) == 3
    assert len(res["per_repeat_worst"]) == 3
    np.testing.assert_allclose(np.mean(res["per_repeat_avg"]),
                               res["avg_accuracy"], atol=1e-3)
    np.testing.assert_allclose(np.mean(res["per_repeat_worst"]),
                               res["worst_group_accuracy"], atol=1e-3)
    # detail off: aggregate-only contract unchanged
    res2 = robustness(model, params, x, y, x, y, repeats=2, epochs=5)
    assert set(res2) == {"avg_accuracy", "worst_group_accuracy"}

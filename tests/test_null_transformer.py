"""NullTransformer / GaussianNormalizer tests."""
import numpy as np

from cdgvae_tpu.data.tabular.null import NullTransformer, GaussianNormalizer


def test_null_transformer_mean_fill_and_indicator():
    data = np.array([1.0, np.nan, 3.0, np.nan])
    nt = NullTransformer(model_missing_values=True).fit(data)
    assert nt.null_rate == 0.5
    t = nt.transform(data)
    assert t.shape == (4, 2)
    np.testing.assert_allclose(t[:, 0], [1.0, 2.0, 3.0, 2.0])
    np.testing.assert_array_equal(t[:, 1], [0, 1, 0, 1])
    rec = nt.reverse_transform(t)
    assert np.isnan(rec[1]) and np.isnan(rec[3])
    assert rec[0] == 1.0


def test_null_transformer_reinjects_at_rate():
    data = np.array([1.0, np.nan, 3.0, 4.0] * 100)
    nt = NullTransformer().fit(data)
    filled = nt.transform(data)
    assert not np.isnan(filled).any()
    rec = nt.reverse_transform(filled, rng=np.random.default_rng(0))
    rate = np.isnan(rec).mean()
    assert 0.15 < rate < 0.35  # fitted rate 0.25


def test_gaussian_normalizer_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.exponential(2.0, 2000)
    gn = GaussianNormalizer().fit(data)
    z = gn.transform(data)
    # transformed data is ~N(0,1)
    assert abs(z.mean()) < 0.05 and abs(z.std() - 1) < 0.1
    rec = gn.reverse_transform(z)
    np.testing.assert_allclose(rec, data, rtol=0.05, atol=0.05)

"""Tabular family tests: transformer round-trip, interleave labels, dataset
plumbing, models, train steps, PC algorithm, SHD, ML efficacy."""
import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp
import optax
import pytest

from cdgvae_tpu.data.tabular.transformer import (DataTransformer,
                                                 ClusterBasedNormalizer,
                                                 OneHotEncoder)
from cdgvae_tpu.data.tabular.datasets import (interleave_float, load_tabular,
                                              load_tabular_tvae,
                                              DATASET_SPECS)
from cdgvae_tpu.factory import build_tabular_model, tabular_B, tvae_block_mask
from cdgvae_tpu.train.tabular_steps import (make_recon_fn, make_tabular_step,
                                            make_tvae_step)
from cdgvae_tpu.utils.pc import pc, cpdag_shd
from cdgvae_tpu.ops.causal import is_dag


def test_interleave_float():
    # binary-float-exact inputs give the clean digit interleave
    assert abs(interleave_float(0.5, 0.25) - 0.5205) < 1e-12
    assert interleave_float(0.0, 0.0) == 0.0
    # inexact decimals drift exactly like the reference implementation
    # (same float algorithm); the result is deterministic
    assert abs(interleave_float(0.12, 0.34)
               - interleave_float(0.12, 0.34)) == 0.0


def test_onehot_roundtrip():
    s = pd.Series(["a", "b", "a", "c"])
    ohe = OneHotEncoder().fit(s)
    oh = ohe.transform(s)
    assert oh.shape == (4, 3)
    np.testing.assert_array_equal(ohe.reverse_transform(oh), s.to_numpy())


def test_cluster_normalizer_roundtrip():
    rng = np.random.default_rng(0)
    data = np.concatenate([rng.normal(-5, 1, 400), rng.normal(5, 0.5, 400)])
    cbn = ClusterBasedNormalizer(random_state=0).fit(data)
    assert 2 <= cbn.num_components <= 10
    t = cbn.transform(data)
    rec = cbn.reverse_transform(t)
    # round trip within the 0.99-clip tolerance
    assert np.abs(rec - data).mean() < 0.2


def test_data_transformer_roundtrip_and_spans():
    rng = np.random.default_rng(1)
    df = pd.DataFrame({
        "x": np.concatenate([rng.normal(0, 1, 300),
                             rng.normal(10, 1, 300)]),
        "cat": rng.choice(["u", "v", "w"], 600),
    })
    tr = DataTransformer()
    tr.fit(df, discrete_columns=["cat"], random_state=0)
    enc = tr.transform(df)
    assert enc.shape == (600, tr.output_dimensions)
    # span structure: [tanh, softmax] for x, [softmax] for cat
    spans = tr.output_info_list
    assert spans[0][0].activation_fn == "tanh"
    assert spans[0][1].activation_fn == "softmax"
    assert spans[1][0].activation_fn == "softmax"
    assert spans[1][0].dim == 3

    dec = tr.inverse_transform(enc)
    assert np.abs(dec["x"].to_numpy() - df["x"].to_numpy()).mean() < 0.5
    assert (dec["cat"].to_numpy() == df["cat"].to_numpy()).all()


@pytest.mark.parametrize("dataset", ["loan", "adult", "covtype"])
@pytest.mark.slow
def test_load_tabular_synthetic(dataset):
    spec = DATASET_SPECS[dataset]
    n = {"loan": 5000, "adult": 45000, "covtype": 12000}[dataset]
    train = load_tabular(dataset, train=True, synthetic_n=n)
    test = load_tabular(dataset, train=False, synthetic_n=n)
    assert train.x_data.shape[1] == spec["input_dim"]
    assert train.label.shape[1] == spec["node"]
    assert len(test.x_data) > 0
    # labels are near [0, 1]; the max row of a minmaxed column interleaves
    # digit '10' so pairs can slightly exceed 1 (reference has the same)
    assert train.label.min() >= 0.0 and train.label.max() <= 1.5
    assert len(train.flatten_topology) == spec["input_dim"]


def test_tabular_B_dags():
    for ds in ("loan", "adult", "covtype"):
        assert is_dag(tabular_B(ds))


@pytest.mark.parametrize("dataset", ["loan", "adult", "covtype"])
@pytest.mark.parametrize("model_name", ["VAE", "CDGVAE"])
def test_tabular_models_and_step(dataset, model_name):
    spec = DATASET_SPECS[dataset]
    config = dict(model=model_name, dataset=dataset, scm="linear",
                  flow_num=1, inverse_loop=100, adjacency_scaling=True,
                  node=spec["node"], factor=list(spec["factor"]),
                  input_dim=spec["input_dim"])
    model, _ = build_tabular_model(config)
    params = model.init(jax.random.key(0))

    n = 64
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, spec["input_dim"])).astype(np.float32)
    if dataset == "covtype":
        x[:, 7] = rng.integers(1, 8, n)
    if dataset == "adult":
        flat = [spec["continuous"].index(c) for g in spec["topology"]
                for c in g]
        x[:, flat[2]] = rng.integers(0, 2, n)  # income in {0,1}
    y = rng.uniform(size=(n, spec["node"])).astype(np.float32)

    out = model(params, jnp.asarray(x), rng=jax.random.key(1))
    assert out.mean.shape == (n, spec["node"])
    expected_out = {"loan": 5, "adult": 5, "covtype": 14}[dataset]
    assert out.xhat.shape == (n, expected_out)

    flat = [spec["continuous"].index(c) for g in spec["topology"] for c in g]
    recon_fn = make_recon_fn(dataset, flat)
    opt = optax.adam(1e-2)
    step = make_tabular_step(model, opt, beta=0.01, lam=10.0,
                             recon_fn=recon_fn)
    state = (params, opt.init(params))
    losses = []
    for i in range(20):
        *state, m = step(*state, jnp.asarray(x), jnp.asarray(y),
                         jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_tvae_end_to_end_loan():
    data = load_tabular_tvae("loan", random_state=8, synthetic_n=1500)
    config = dict(model="TVAE", dataset="loan", scm="linear", flow_num=1,
                  inverse_loop=100, adjacency_scaling=True,
                  node=3, factor=[1, 1, 1],
                  input_dim=data.transformer.output_dimensions,
                  tvae_mask=tvae_block_mask(
                      "loan", data.transformer.output_info_list))
    model, _ = build_tabular_model(config)
    params = model.init(jax.random.key(0))
    assert params["sigma"].shape == (config["input_dim"],)

    opt = optax.adam(1e-3)
    step = make_tvae_step(model, opt, lam=5.0,
                          output_info_list=data.transformer.output_info_list)
    x = jnp.asarray(data.x_data[:128])
    y = jnp.asarray(data.label[:128])
    state = (params, opt.init(params))
    for i in range(5):
        *state, m = step(*state, x, y, jax.random.key(i))
    assert np.isfinite(m["loss"])
    # sigma clamp applied
    s = np.asarray(state[0]["sigma"])
    assert (s >= 0.01 - 1e-6).all() and (s <= 0.1 + 1e-6).all()


def test_pc_recovers_simple_chain():
    """x -> y -> z : PC must remove the x-z edge given y and orient a chain
    or leave it undirected (Markov-equivalent), never a false x-z edge."""
    rng = np.random.default_rng(0)
    n = 4000
    x = rng.normal(size=n)
    y = 2 * x + rng.normal(size=n)
    z = 1.5 * y + rng.normal(size=n)
    G, _ = pc(np.stack([x, y, z], 1), alpha=0.05)
    assert G[0, 2] == 0 and G[2, 0] == 0  # no x-z edge
    assert G[0, 1] != 0 and G[1, 2] != 0  # chain edges present


def test_pc_recovers_v_structure():
    rng = np.random.default_rng(1)
    n = 4000
    x = rng.normal(size=n)
    z = rng.normal(size=n)
    y = x + z + 0.5 * rng.normal(size=n)
    G, _ = pc(np.stack([x, y, z], 1), alpha=0.05)
    # collider x -> y <- z : directed edges into y
    assert G[0, 1] == -1 and G[1, 0] == 1
    assert G[2, 1] == -1 and G[1, 2] == 1
    assert G[0, 2] == 0


def test_cpdag_shd():
    G1 = np.array([[0, -1, 0], [1, 0, -1], [0, 1, 0]])
    assert cpdag_shd(G1, G1) == 0
    G2 = np.zeros((3, 3), dtype=int)
    assert cpdag_shd(G1, G2) > 0


def test_ml_efficacy_smoke():
    from cdgvae_tpu.eval.ml_efficacy import (regression_eval,
                                             classification_eval)
    rng = np.random.default_rng(0)
    df = pd.DataFrame({"a": rng.normal(size=200),
                       "b": rng.normal(size=200)})
    df["t"] = df["a"] * 2 + rng.normal(size=200) * 0.1
    res = regression_eval(df.iloc[:150], df.iloc[150:], "t")
    assert all(r2 > 0.5 for _, r2 in res)

    df["c"] = (df["a"] > 0).astype(int)
    res = classification_eval(df[["a", "b", "c"]].iloc[:150],
                              df[["a", "b", "c"]].iloc[150:], "c")
    assert all(f1 > 0.8 for _, f1 in res)


def test_pc_chisq_recovers_discrete_v_structure():
    rng = np.random.default_rng(0)
    n = 4000
    x = rng.integers(0, 3, n)
    z = rng.integers(0, 3, n)
    noise = rng.integers(0, 2, n)
    y = np.clip(x + z + noise, 0, 4)  # discrete additive collider
    G, _ = pc(np.stack([x, y, z], 1).astype(float), alpha=0.05,
              indep_test="chisq")
    assert G[0, 2] == 0 and G[2, 0] == 0  # x indep z marginally
    assert G[0, 1] != 0 and G[2, 1] != 0


def test_pc_removes_edge_separated_by_other_endpoints_neighbors():
    """The separating set of (0,1) below is {2,3} ⊂ adj(1): 0->2, 3->2,
    2->1, 3->1. A skeleton that only conditions on adj(0) can never remove
    the spurious 0-1 edge (conditioning on {2} opens the collider
    0->2<-3->1). The PC loop must test both endpoints' neighborhoods."""
    from cdgvae_tpu.utils.pc import pc

    rng = np.random.default_rng(0)
    n = 20000
    x0 = rng.normal(size=n)
    x3 = rng.normal(size=n)
    # unequal weights: the naive equal-weight DGP is coincidentally
    # unfaithful for the 2-3 edge (its partial correlation given {0,1}
    # cancels to ~0, so any correct PC drops it)
    x2 = 1.0 * x0 + 0.7 * x3 + 0.5 * rng.normal(size=n)
    x1 = 0.6 * x2 + 1.3 * x3 + 0.5 * rng.normal(size=n)
    data = np.stack([x0, x1, x2, x3], axis=1)
    G, _ = pc(data, alpha=0.01)  # causallearn encoding
    assert G[0, 1] == 0 and G[1, 0] == 0, "spurious 0-1 edge not removed"
    # the true adjacencies all survive
    for a, b in [(0, 2), (3, 2), (2, 1), (3, 1)]:
        assert G[a, b] != 0 or G[b, a] != 0


def test_dag_discovery_uses_reference_indep_tests(monkeypatch, tmp_path):
    """chisq for loan/adult (reference dag_loan.py:37/:83,
    dag_adult.py:48/:102), fisherz for covtype (dag_covertype.py:53) —
    on BOTH the raw-column and interleaved-label PC runs."""
    from cdgvae_tpu.cli import dag_discovery

    calls = []

    def fake_pc(data, alpha=0.05, indep_test="fisherz"):
        calls.append(indep_test)
        d = data.shape[1]
        return np.zeros((d, d)), None

    monkeypatch.setattr(dag_discovery, "pc", fake_pc)
    monkeypatch.setattr(dag_discovery, "viz_graph",
                        lambda *a, **k: None)
    monkeypatch.setattr(
        dag_discovery, "load_tabular",
        lambda dataset, train, data_dir: load_tabular(
            dataset, train=train, synthetic_n=400))

    dag_discovery.main(["--dataset", "loan",
                        "--assets_dir", str(tmp_path)])
    dag_discovery.main(["--dataset", "covtype",
                        "--assets_dir", str(tmp_path)])
    assert calls == ["chisq", "chisq", "fisherz", "fisherz"]


# ---------------- FloatFormatter reverse fidelity (numerical.py:95-182)


def test_learn_rounding_digits():
    from cdgvae_tpu.data.tabular.transformer import learn_rounding_digits
    assert learn_rounding_digits(np.array([1.0, 2.0, 3.0])) is None
    assert learn_rounding_digits(np.array([1.25, 2.5])) == 2
    assert learn_rounding_digits(np.array([0.123, 4.5, 6.0])) == 3
    # beyond float64's resolvable decimals -> None (reference MAX_DECIMALS)
    assert learn_rounding_digits(np.array([1 / 3])) is None
    assert learn_rounding_digits(np.array([])) is None


def test_integer_column_roundtrips_exactly():
    # integer-dtype columns must come back as exact integers (rounded, not
    # truncated by the dtype cast) through transform -> inverse_transform,
    # regardless of the learn_rounding_scheme flag
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"n": rng.integers(10, 500, 800)})
    tr = DataTransformer().fit(df, random_state=0)
    dec = tr.inverse_transform(tr.transform(df))
    assert dec["n"].dtype == df["n"].dtype
    # every reversed value is a true round (no off-by-one truncation):
    # compare against the float reverse path rounded explicitly
    info = tr._column_transform_info_list[0]
    enc = tr.transform(df)
    pair = np.stack([enc[:, 0], np.argmax(enc[:, 1:], axis=1)], axis=1)
    float_rev = (pair[:, 0].clip(-1, 1) * 4
                 * np.sqrt(info.transform._bgm.covariances_).reshape(-1)[
                     info.transform.valid_component_indicator][
                         pair[:, 1].astype(int)]
                 + info.transform._bgm.means_.reshape(-1)[
                     info.transform.valid_component_indicator][
                         pair[:, 1].astype(int)])
    np.testing.assert_array_equal(dec["n"].to_numpy(),
                                  np.round(float_rev, 0).astype(df["n"].dtype))


def test_learn_rounding_scheme_on_floats():
    rng = np.random.default_rng(6)
    vals = np.round(rng.normal(50, 10, 600), 2)
    df = pd.DataFrame({"price": vals})
    tr = DataTransformer(learn_rounding_scheme=True).fit(df, random_state=0)
    dec = tr.inverse_transform(tr.transform(df))
    out = dec["price"].to_numpy()
    # every reversed value respects the learned 2-decimal grid
    np.testing.assert_array_equal(out, np.round(out, 2))


def test_enforce_min_max_values():
    rng = np.random.default_rng(7)
    vals = rng.uniform(10.0, 20.0, 500)
    df = pd.DataFrame({"v": vals})
    tr = DataTransformer(enforce_min_max_values=True).fit(df, random_state=0)
    enc = tr.transform(df)
    # force extreme normalized scalars so the raw reverse would overshoot
    enc[:, 0] = np.where(np.arange(len(enc)) % 2 == 0, 1.0, -1.0)
    dec = tr.inverse_transform(enc)["v"].to_numpy()
    assert dec.min() >= vals.min() - 1e-12
    assert dec.max() <= vals.max() + 1e-12

"""Causal layer tests: SEM solve ≡ ancestral propagation, do-operator
semantics, adjacency scaling, DAG checks (SURVEY.md §4 test plan)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cdgvae_tpu.ops.causal import CausalGraph, is_dag, scale_adjacency


def pendulum_B(scaled=True):
    """light/angle -> length/position (reference main.py:137-147)."""
    B = np.zeros((4, 4))
    B[0, 2] = B[0, 3] = B[1, 2] = B[1, 3] = 1.0
    return scale_adjacency(B) if scaled else B


def test_is_dag():
    assert is_dag(pendulum_B())
    C = np.zeros((3, 3))
    C[0, 1] = C[1, 2] = C[2, 0] = 1.0
    assert not is_dag(C)


def test_scale_adjacency():
    B = scale_adjacency(pendulum_B(scaled=False))
    np.testing.assert_allclose(B[:, 2].sum(), 1.0)
    np.testing.assert_allclose(B[0, 2], 0.5)
    np.testing.assert_allclose(B[:, 0].sum(), 0.0)


@pytest.mark.parametrize("scm", ["linear", "nonlinear"])
def test_sem_solve_equals_ancestral_propagation(scm):
    """z = eps @ (I-B)^{-1} must equal iterating z_j = z_parents @ B[:,j] + eps_j
    in topological order — the core identity the do-operator relies on."""
    g = CausalGraph(pendulum_B(), scm=scm)
    eps = jax.random.normal(jax.random.key(0), (32, 4))
    params = g.init(jax.random.key(1))

    orig_latent, _, _ = g.transform(params, eps)

    z = np.zeros((32, 4), dtype=np.float32)
    Bn = np.asarray(g.B)
    en = np.asarray(eps)
    for j in range(4):
        z[:, j] = z[:, :j] @ Bn[:j, j] + en[:, j]
    np.testing.assert_allclose(np.asarray(orig_latent), z, rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("scm", ["linear", "nonlinear"])
def test_do_intervention_identity_when_value_unchanged(scm):
    """do(z_j := z_j) must be a no-op (up to fixed-point tolerance)."""
    g = CausalGraph(pendulum_B(), scm=scm)
    params = g.init(jax.random.key(2))
    eps = jax.random.normal(jax.random.key(3), (8, 4)) * 0.5
    _, latent, _ = g.transform(params, eps)

    for do_index in range(4):
        z_do = g.do_intervention(params, latent, eps, do_index,
                                 latent[:, do_index])
        np.testing.assert_allclose(np.asarray(z_do), np.asarray(latent),
                                   rtol=1e-3, atol=1e-3)


def test_do_intervention_root_affects_children_only():
    """Intervening a root node must change its descendants but not the other
    root; intervening a sink must change nothing else."""
    g = CausalGraph(pendulum_B(), scm="linear")
    params = g.init(jax.random.key(4))
    eps = jax.random.normal(jax.random.key(5), (8, 4))
    _, latent, _ = g.transform(params, eps)

    # do on root node 0 (light): node 1 (angle, other root) must be unchanged
    z_do = g.do_intervention(params, latent, eps, 0, 99.0)
    np.testing.assert_allclose(np.asarray(z_do[:, 1]),
                               np.asarray(latent[:, 1]), rtol=1e-5)
    assert not np.allclose(np.asarray(z_do[:, 2]), np.asarray(latent[:, 2]))
    assert not np.allclose(np.asarray(z_do[:, 3]), np.asarray(latent[:, 3]))

    # do on sink node 3 (position): nothing else changes
    z_do = g.do_intervention(params, latent, eps, 3, -7.0)
    np.testing.assert_allclose(np.asarray(z_do[:, :3]),
                               np.asarray(latent[:, :3]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(z_do[:, 3]), -7.0, rtol=1e-5)


def test_do_intervention_matches_reference_algorithm():
    """Step-for-step replication of reference metric.py:230-252 in numpy."""
    g = CausalGraph(pendulum_B(), scm="linear")
    params = g.init(jax.random.key(6))
    eps = jax.random.normal(jax.random.key(7), (5, 4))
    _, latent, _ = g.transform(params, eps)

    do_index, val = 1, 2.5
    z_do = g.do_intervention(params, latent, eps, do_index, val)

    # naive reference algorithm
    p = np.asarray(params["flows"]["p"])
    B = np.asarray(g.B)
    lat = np.asarray(latent).copy()
    lat[:, do_index] = val
    z = (lat - p[:, 1]) / p[:, 0]  # affine inverse
    e = np.asarray(eps)
    for j in range(4):
        if j == do_index:
            continue
        z[:, j] = z[:, :j] @ B[:j, j] + e[:, j]
    z = p[:, 0] * z + p[:, 1]  # affine forward
    np.testing.assert_allclose(np.asarray(z_do), z, rtol=1e-5, atol=1e-5)


def test_cyclic_B_rejected():
    C = np.zeros((2, 2))
    C[0, 1] = C[1, 0] = 1.0
    with pytest.raises(ValueError):
        CausalGraph(C)


def test_ancestral_propagate_rejects_unordered_dag():
    """A valid DAG whose nodes are not topologically ordered (edge 1->0,
    like covtype's below-diagonal edges) must be REJECTED by the
    ancestral-propagation do-operator path — silently dropping the
    below-diagonal edges would produce wrong counterfactuals. Construction
    still succeeds (covtype never runs do-interventions)."""
    import pytest

    B = np.zeros((2, 2))
    B[1, 0] = 1.0  # 1 -> 0: valid DAG, not topologically ordered
    g = CausalGraph(B, scm="linear")
    assert not g.topo_ordered
    z = jnp.zeros((3, 2))
    with pytest.raises(ValueError, match="topologically ordered"):
        g.ancestral_propagate(z, z, do_index=0)

"""Unit tests for the invertible per-node flows (SURVEY.md §4 test plan):
inverse round-trip (incl. the planar Picard fixed point) and logdet vs the
autodiff jacobian."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cdgvae_tpu.ops import flows


@pytest.mark.parametrize("scm", ["linear", "nonlinear"])
def test_inverse_roundtrip(scm):
    node = 4
    f = flows.SCMFlows(scm, node, flow_num=2, inverse_loop=100)
    params = f.init(jax.random.key(0))
    eps = jax.random.normal(jax.random.key(1), (16, node))
    z, _ = f.forward(params, eps)
    eps_rec = f.inverse(params, z)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(eps),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("scm", ["linear", "nonlinear"])
def test_logdet_matches_autodiff(scm):
    node = 3
    f = flows.SCMFlows(scm, node, flow_num=2)
    params = f.init(jax.random.key(2))
    eps = jax.random.normal(jax.random.key(3), (3, node))

    _, logdet = f.forward(params, eps)

    # flows act elementwise per node: jacobian is diagonal, so
    # logdet per node = log |d z_j / d eps_j|
    def scalar_fwd(e_scalar, j):
        e = jnp.zeros((1, node)).at[0, j].set(e_scalar)
        z, _ = f.forward(params, e)
        return z[0, j]

    for b in range(eps.shape[0]):
        for j in range(node):
            g = jax.grad(scalar_fwd)(eps[b, j], j)
            np.testing.assert_allclose(float(logdet[b, j]),
                                       float(jnp.log(jnp.abs(g))),
                                       rtol=1e-3, atol=2e-4)


def test_planar_forward_matches_naive_reference_math():
    """Vectorised planar flow == naive per-node scalar loop (the reference
    algorithm, modules/model.py:87-100)."""
    node, flow_num = 4, 3
    params = flows.planar_init(jax.random.key(4), node, flow_num)
    eps = jax.random.normal(jax.random.key(5), (10, node))

    z, logdet = flows.planar_forward(params, eps)

    w, b, u = (np.asarray(params[k]) for k in ("w", "b", "u"))
    e = np.asarray(eps)
    expect = np.zeros_like(e)
    expect_ld = np.zeros_like(e)
    for n in range(node):
        h = e[:, n].copy()
        ld = np.zeros_like(h)
        for j in range(flow_num):
            wu = w[n, j] * u[n, j]
            u_hat = u[n, j] + ((-1 + np.log1p(np.exp(wu))) - wu) * (
                w[n, j] / w[n, j] ** 2)
            pre = h * w[n, j] + b[n, j]
            elu = np.where(pre > 0, pre, np.exp(pre) - 1)
            grad = np.where(pre > 0, 1.0, np.exp(pre))
            ld += np.log(np.abs(1 + grad * w[n, j] * u_hat))
            h = h + u_hat * elu
        expect[:, n] = h
        expect_ld[:, n] = ld

    np.testing.assert_allclose(np.asarray(z), expect, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logdet), expect_ld, rtol=1e-5,
                               atol=1e-6)


def test_flows_jit_and_grad():
    f = flows.SCMFlows("nonlinear", 4, flow_num=1)
    params = f.init(jax.random.key(0))
    eps = jax.random.normal(jax.random.key(1), (8, 4))

    @jax.jit
    def loss(p):
        z, ld = f.forward(p, eps)
        return (z ** 2).sum() + ld.sum()

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))

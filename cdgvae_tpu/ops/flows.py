"""Per-node invertible 1-D flows, vectorised across the causal-node axis.

The reference keeps one flow *module per node* and maps a Python loop over
per-node column splits (reference: modules/model.py:125-129, :156, :264-267).
Here the per-node parameters are stacked into arrays with a leading ``node``
axis, so the forward/inverse/logdet of ALL nodes is a handful of fused
elementwise VPU ops on ``[batch, node]`` tensors — no Python loop over nodes,
no [batch,1] splits, one XLA fusion.

Two flow families (parity with reference modules/model.py):

* ``affine``  — InvertiblePriorLinear (modules/model.py:8-29):
  ``z = p0 * eps + p1`` with analytic inverse and logdet ``log|p0|``.
* ``planar``  — PlanarFlows with ELU nonlinearity (modules/model.py:31-100),
  specialised to input_dim=1 (the only configuration the reference ever
  instantiates: one scalar latent per node, modules/model.py:129). The
  invertibility construction ``build_u`` (modules/model.py:70-75) and the
  Picard fixed-point inverse with ``inverse_loop`` iterations
  (modules/model.py:77-85) are reproduced as closed-form scalar math under
  ``lax.fori_loop`` — jit/grad/vmap-safe and TPU-resident.

All functions take/return ``[batch, node]`` arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Params = dict


# ---------------------------------------------------------------------------
# Affine flow (linear SCM)
# ---------------------------------------------------------------------------

def affine_init(key: jax.Array, node: int, dtype=jnp.float32) -> Params:
    """p ~ U(0, 0.1), matching torch.rand([2]) * 0.1 per node
    (reference modules/model.py:18)."""
    p = jax.random.uniform(key, (node, 2), dtype, 0.0, 0.1)
    return {"p": p}


def affine_forward(params: Params, eps: jax.Array):
    p = params["p"]
    z = p[:, 0] * eps + p[:, 1]
    logdet = jnp.broadcast_to(jnp.log(jnp.abs(p[:, 0])), eps.shape)
    return z, logdet


def affine_inverse(params: Params, z: jax.Array) -> jax.Array:
    p = params["p"]
    return (z - p[:, 1]) / p[:, 0]


# ---------------------------------------------------------------------------
# Planar flow (nonlinear SCM), scalar (input_dim=1) specialisation
# ---------------------------------------------------------------------------

def planar_init(key: jax.Array, node: int, flow_num: int,
                dtype=jnp.float32) -> Params:
    """w, b, u ~ N(0, 0.1^2), matching torch.randn(...) * 0.1
    (reference modules/model.py:60-68). Shapes: [node, flow_num]."""
    kw, kb, ku = jax.random.split(key, 3)
    shape = (node, flow_num)
    return {
        "w": jax.random.normal(kw, shape, dtype) * 0.1,
        "b": jax.random.normal(kb, shape, dtype) * 0.1,
        "u": jax.random.normal(ku, shape, dtype) * 0.1,
    }


def _build_u(u: jax.Array, w: jax.Array) -> jax.Array:
    """Sufficient condition for invertibility (reference modules/model.py:70-75).

    Scalar case of u_hat = u + (softplus(w·u) - 1 - w·u) * w / ||w||^2.
    """
    wu = w * u
    term1 = -1.0 + jax.nn.softplus(wu)  # -1 + log(1 + exp(wu))
    return u + (term1 - wu) * (w / (w * w))


def planar_forward(params: Params, eps: jax.Array, alpha: float = 1.0):
    """[batch, node] -> ([batch, node], [batch, node] logdet).

    Per flow layer j: h <- h + u_hat_j * elu(h * w_j + b_j)
    logdet += log|1 + elu'(pre) * w_j * u_hat_j|   (modules/model.py:87-100)
    """
    w, b, u = params["w"], params["b"], params["u"]
    flow_num = w.shape[1]
    h = eps
    logdet = jnp.zeros_like(eps)
    for j in range(flow_num):  # flow_num is tiny & static: unrolled
        wj, bj, uj = w[:, j], b[:, j], u[:, j]
        u_hat = _build_u(uj, wj)
        pre = h * wj + bj
        grad = jnp.where(pre > 0, 1.0, alpha * jnp.exp(pre))
        logdet = logdet + jnp.log(jnp.abs(1.0 + grad * wj * u_hat))
        h = h + u_hat * jax.nn.elu(pre, alpha)
    return h, logdet


def planar_inverse(params: Params, z: jax.Array, inverse_loop: int = 100,
                   alpha: float = 1.0) -> jax.Array:
    """Picard fixed-point inverse, ``inverse_loop`` iterations per layer
    (reference modules/model.py:77-85), as a lax.fori_loop."""
    w, b, u = params["w"], params["b"], params["u"]
    flow_num = w.shape[1]
    h = z
    for j in reversed(range(flow_num)):
        wj, bj = w[:, j], b[:, j]
        u_hat = _build_u(u[:, j], wj)

        def body(_, zk, h=h, u_hat=u_hat, wj=wj, bj=bj):
            return h - u_hat * jax.nn.elu(zk * wj + bj, alpha)

        h = jax.lax.fori_loop(0, inverse_loop, body, h)
    return h


# ---------------------------------------------------------------------------
# Dispatch table
# ---------------------------------------------------------------------------

class SCMFlows:
    """Static wrapper choosing the flow family per the ``scm`` config string.

    ``scm='linear'`` -> affine, ``scm='nonlinear'`` -> planar
    (reference modules/model.py:124-131).
    """

    def __init__(self, scm: str, node: int, flow_num: int = 1,
                 inverse_loop: int = 100):
        if scm not in ("linear", "nonlinear"):
            raise ValueError("Not supported SCM!")
        self.scm = scm
        self.node = node
        self.flow_num = flow_num
        self.inverse_loop = inverse_loop

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        if self.scm == "linear":
            return affine_init(key, self.node, dtype)
        return planar_init(key, self.node, self.flow_num, dtype)

    def forward(self, params: Params, eps: jax.Array):
        if self.scm == "linear":
            return affine_forward(params, eps)
        return planar_forward(params, eps)

    def inverse(self, params: Params, z: jax.Array) -> jax.Array:
        if self.scm == "linear":
            return affine_inverse(params, z)
        return planar_inverse(params, z, self.inverse_loop)

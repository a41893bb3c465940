"""Causal latent layer: linear SEM solve + per-node flows + do-operator.

The latent generating process of CDG-VAE (reference modules/model.py:227-268):

    z_orig = eps @ (I - B)^{-1}          (linear SEM, solved in closed form)
    z      = f(z_orig)                    (per-node invertible 1-D flow)

``B`` is the fixed user-specified weighted adjacency (upper-triangular in
topological order). ``(I - B)^{-1}`` is computed ONCE on host at graph build
(reference computes torch.inverse at module init, modules/model.py:230) and
baked into the jitted computation as a constant. NOTE the reference
right-multiplies by ``inverse(I - B)`` even though its comment says
``(I-B^T)^{-1}`` — we replicate the code, not the comment
(see SURVEY.md §7 "Hard parts").

The do-intervention operator reproduces the ancestral re-propagation of
reference inference.py:298-327 / metric.py:230-252:

    z_struct = flow^{-1}(z) with z[do] := value
    for j != do (topological order): z_struct[:, j] = z_struct[:, :j] @ B[:j, j] + eps[:, j]
    z_do = flow(z_struct)

Node counts are tiny and static (3-6), so the propagation unrolls into a few
fused vector ops inside one jit — no per-step host round trips like the
reference's eager loop.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .flows import SCMFlows


def scale_adjacency(B: np.ndarray) -> np.ndarray:
    """In-degree column scaling (reference main.py:143-147)."""
    B = np.asarray(B, dtype=np.float64).copy()
    indegree = B.sum(axis=0)
    mask = indegree != 0
    B[:, mask] = B[:, mask] / indegree[mask]
    return B


def is_dag(W: np.ndarray) -> bool:
    """DAG check on a weighted adjacency matrix.

    Replaces the reference's igraph dependency (modules/simulation.py:21-29)
    with a nilpotency test: W is a DAG iff its binarised adjacency is
    nilpotent (no cycles => A^n = 0).
    """
    A = (np.abs(np.asarray(W, dtype=np.float64)) > 0).astype(np.float64)
    n = A.shape[0]
    M = A.copy()
    for _ in range(n):
        if not M.any():
            return True
        M = M @ A
    return not M.any()


class CausalGraph:
    """Static causal structure: adjacency, SEM solve, flows, do-operator."""

    def __init__(self, B: np.ndarray, scm: str = "linear", flow_num: int = 1,
                 inverse_loop: int = 100, dtype=jnp.float32):
        B = np.asarray(B, dtype=np.float64)
        if not is_dag(B):
            raise ValueError("B must be a DAG")
        # ancestral_propagate assumes nodes come in topological order
        # (strictly upper-triangular B) — true for every pendulum/DR/celeba
        # graph but NOT covtype (reference tabular/main.py:152-159), which
        # never runs do-interventions. Checked lazily so covtype graphs
        # still construct.
        self.topo_ordered = bool(np.allclose(np.tril(B), 0.0))
        self.node = B.shape[0]
        self.B = jnp.asarray(B, dtype=dtype)
        # host-side solve, once (reference modules/model.py:230)
        self.I_B_inv = jnp.asarray(
            np.linalg.inv(np.eye(self.node) - B), dtype=dtype)
        self.flows = SCMFlows(scm, self.node, flow_num, inverse_loop)
        self.dtype = dtype

    # -- params ------------------------------------------------------------
    def init(self, key: jax.Array) -> dict:
        return {"flows": self.flows.init(key, self.dtype)}

    # -- core ops ----------------------------------------------------------
    def transform(self, params: dict, eps: jax.Array, *_, **__):
        """eps [batch, node] -> (orig_latent, latent, logdet), all [batch, node].

        Parity: reference ``transform`` (modules/model.py:261-268); the
        per-node Python map over [batch,1] splits becomes one matmul + one
        vectorised flow over the node axis.
        """
        # tiny [B, n] @ [n, n] solve: force full f32 precision — the MXU's
        # default bf16 passes would perturb the latents for no speed gain.
        # The constant follows eps's dtype so mixed-precision callers don't
        # get silently promoted back to f32 mid-network.
        orig_latent = jnp.dot(eps, self.I_B_inv.astype(eps.dtype),
                              precision=jax.lax.Precision.HIGHEST)
        latent, logdet = self.flows.forward(params["flows"], orig_latent)
        return orig_latent, latent, logdet

    def inverse(self, params: dict, latent: jax.Array) -> jax.Array:
        """latent [batch, node] -> pre-flow structural values (reference
        ``model.inverse``, modules/model.py:252-254)."""
        return self.flows.inverse(params["flows"], latent)

    def ancestral_propagate(self, z_struct: jax.Array, eps: jax.Array,
                            do_index: int) -> jax.Array:
        """Re-propagate exogenous noise through the SEM holding node
        ``do_index`` fixed (reference inference.py:309-315).

        z_struct: [batch, node] structural (pre-flow) values where column
        ``do_index`` holds the intervened value; eps: original exogenous noise.
        """
        if not self.topo_ordered:
            raise ValueError(
                "ancestral_propagate requires a topologically ordered "
                "(strictly upper-triangular) B: column j may only depend on "
                "columns < j. Reorder the nodes; a valid-but-unordered DAG "
                "would silently drop its below-diagonal edges here.")
        cols = [z_struct[:, j] for j in range(self.node)]
        for j in range(self.node):  # static unroll; node <= 6
            if j == do_index:
                continue
            if j == 0:
                cols[j] = eps[:, 0]
            else:
                parents = jnp.stack(cols[:j], axis=1)
                cols[j] = parents @ self.B[:j, j].astype(parents.dtype) \
                    + eps[:, j]
        return jnp.stack(cols, axis=1)

    def do_intervention(self, params: dict, latent: jax.Array,
                        eps: jax.Array, do_index: int,
                        value: jax.Array) -> jax.Array:
        """Full do-operator: returns intervened latent [batch, node].

        Parity: reference metric.py:230-252 (inverse -> ancestral
        re-propagation -> flows forward). ``do_index`` is static;
        ``value`` may be a scalar or [batch] array.
        """
        value = jnp.broadcast_to(jnp.asarray(value, latent.dtype),
                                 (latent.shape[0],))
        latent_do = latent.at[:, do_index].set(value)
        z_struct = self.inverse(params, latent_do)
        z_struct = self.ancestral_propagate(z_struct, eps, do_index)
        z_do, _ = self.flows.forward(params["flows"], z_struct)
        return z_do

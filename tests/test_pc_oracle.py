"""Oracle-grade validation of the PC implementation (utils/pc.py).

The PC CPDAGs back every SHD headline in docs/RESULTS.md, so PC itself
must be defended, not just spot-checked.  Strategy:

1. ``d_separated`` — exact graphical oracle (ancestral moralization),
   sanity-checked on textbook structures here.
2. ``dag_to_cpdag`` — Chickering's compelled-edge algorithm: an
   INDEPENDENT route to the true CPDAG (no Meek rules, no skeleton
   search), checked on known equivalence classes.
3. The property suite: for hundreds of random DAGs (d = 4..10, sparse to
   dense), run ``pc`` with the d-separation oracle as its CI test and
   assert the returned CPDAG is exactly ``dag_to_cpdag(truth)``.  Any bug
   in the skeleton phase, the sepset bookkeeping, the v-structure rule,
   or the Meek closure shows up as a mismatch against the Chickering
   labeling.
4. Finite-sample regressions with known answers for fisherz and chisq.

Reference parity anchor: /root/reference/tabular/inference.py:184-197
(causallearn pc usage) and :255-261 (custom SHD).
"""
import numpy as np
import pytest

from cdgvae_tpu.utils.pc import (
    cpdag_shd,
    d_separated,
    dag_to_cpdag,
    oracle_ci_test,
    pc,
    random_dag,
)


def dag(d, *edges):
    m = np.zeros((d, d), dtype=bool)
    for a, b in edges:
        m[a, b] = True
    return m


# ---------------------------------------------------------------- oracle


class TestDSeparation:
    def test_chain_marginal_dependence(self):
        # X -> Y -> Z: X and Z dependent marginally, independent given Y
        g = dag(3, (0, 1), (1, 2))
        assert not d_separated(g, 0, 2, ())
        assert d_separated(g, 0, 2, (1,))

    def test_fork(self):
        # X <- Y -> Z: same pattern as the chain
        g = dag(3, (1, 0), (1, 2))
        assert not d_separated(g, 0, 2, ())
        assert d_separated(g, 0, 2, (1,))

    def test_collider_opens_on_conditioning(self):
        # X -> Y <- Z: independent marginally, DEPENDENT given Y
        g = dag(3, (0, 1), (2, 1))
        assert d_separated(g, 0, 2, ())
        assert not d_separated(g, 0, 2, (1,))

    def test_collider_descendant_opens(self):
        # X -> Y <- Z, Y -> W: conditioning on the descendant W also opens
        g = dag(4, (0, 1), (2, 1), (1, 3))
        assert d_separated(g, 0, 2, ())
        assert not d_separated(g, 0, 2, (3,))

    def test_blocked_long_path(self):
        # X -> A -> B -> Z blocked by either intermediate
        g = dag(4, (0, 1), (1, 2), (2, 3))
        assert not d_separated(g, 0, 3, ())
        assert d_separated(g, 0, 3, (1,))
        assert d_separated(g, 0, 3, (2,))

    def test_endpoint_in_cond_rejected(self):
        g = dag(2, (0, 1))
        with pytest.raises(ValueError):
            d_separated(g, 0, 1, (0,))


# ------------------------------------------------------------ dag_to_cpdag


class TestDagToCpdag:
    def test_chain_all_undirected(self):
        # X -> Y -> Z has no v-structure: CPDAG is the undirected chain
        g = dag(3, (0, 1), (1, 2))
        cp = dag_to_cpdag(g)
        assert cp[0, 1] == -1 and cp[1, 0] == -1
        assert cp[1, 2] == -1 and cp[2, 1] == -1
        assert cp[0, 2] == 0 and cp[2, 0] == 0

    def test_collider_all_directed(self):
        # X -> Y <- Z is its own equivalence class
        g = dag(3, (0, 1), (2, 1))
        cp = dag_to_cpdag(g)
        assert cp[0, 1] == -1 and cp[1, 0] == 1
        assert cp[2, 1] == -1 and cp[1, 2] == 1

    def test_meek_r1_propagation(self):
        # X -> Y <- Z plus Y -> W: Y -> W is compelled (else new
        # v-structure at Y), even though it is in no v-structure itself
        g = dag(4, (0, 1), (2, 1), (1, 3))
        cp = dag_to_cpdag(g)
        assert cp[1, 3] == -1 and cp[3, 1] == 1

    def test_complete_dag_all_reversible(self):
        # a complete DAG has no v-structures; everything is reversible
        g = dag(3, (0, 1), (0, 2), (1, 2))
        cp = dag_to_cpdag(g)
        for i in range(3):
            for j in range(3):
                if i != j:
                    assert cp[i, j] == -1

    def test_cyclic_input_rejected(self):
        g = dag(2, (0, 1))
        g[1, 0] = True
        with pytest.raises(ValueError):
            dag_to_cpdag(g)

    def test_markov_equivalent_dags_share_cpdag(self):
        # X -> Y -> Z and X <- Y <- Z and X <- Y -> Z are one class
        variants = [dag(3, (0, 1), (1, 2)),
                    dag(3, (1, 0), (2, 1)),
                    dag(3, (1, 0), (1, 2))]
        cps = [dag_to_cpdag(g) for g in variants]
        assert all((cp == cps[0]).all() for cp in cps)


# -------------------------------------------------- the property suite


class TestPCOracleProperty:
    """pc(oracle CI) must return exactly the true CPDAG, for random DAGs
    across sizes and densities.  240 graphs total."""

    @pytest.mark.parametrize("d", [4, 5, 6, 7, 8, 9, 10])
    @pytest.mark.parametrize("edge_prob", [0.2, 0.4, 0.7])
    def test_random_dags(self, d, edge_prob):
        rng = np.random.default_rng(1000 * d + int(edge_prob * 100))
        n_mismatch = 0
        for _ in range(12):
            truth = random_dag(rng, d, edge_prob)
            expected = dag_to_cpdag(truth)
            got, _ = pc(None, indep_test=oracle_ci_test(truth), num_vars=d)
            if not (got == expected).all():
                n_mismatch += 1
        assert n_mismatch == 0

    def test_empty_graph(self):
        truth = np.zeros((5, 5), dtype=bool)
        got, _ = pc(None, indep_test=oracle_ci_test(truth), num_vars=5)
        assert (got == 0).all()

    def test_reference_topologies(self):
        # the exact Bs the framework ships for loan/adult/covtype
        # (tabular/main.py:138-159): PC with a perfect oracle must recover
        # their CPDAGs with SHD 0
        from cdgvae_tpu.factory import tabular_B
        for name in ("loan", "adult", "covtype"):
            B = np.asarray(tabular_B(name)) != 0
            expected = dag_to_cpdag(B)
            got, _ = pc(None, indep_test=oracle_ci_test(B),
                        num_vars=B.shape[0])
            assert cpdag_shd(got, expected) == 0, name


# ------------------------------------------- finite-sample regressions


class TestFiniteSample:
    def test_fisherz_chain(self):
        # linear-Gaussian chain: CPDAG is the undirected chain
        rng = np.random.default_rng(0)
        n = 4000
        x = rng.normal(size=n)
        y = 0.8 * x + rng.normal(size=n)
        z = 0.8 * y + rng.normal(size=n)
        got, _ = pc(np.stack([x, y, z], 1), alpha=0.05)
        expected = dag_to_cpdag(dag(3, (0, 1), (1, 2)))
        assert (got == expected).all()

    def test_fisherz_collider(self):
        rng = np.random.default_rng(1)
        n = 4000
        x = rng.normal(size=n)
        z = rng.normal(size=n)
        y = 0.8 * x + 0.8 * z + rng.normal(size=n)
        got, _ = pc(np.stack([x, y, z], 1), alpha=0.05)
        expected = dag_to_cpdag(dag(3, (0, 1), (2, 1)))
        assert (got == expected).all()

    def test_fisherz_diamond(self):
        # X -> {A, B} -> Y: two colliderless paths plus a collider at Y
        rng = np.random.default_rng(2)
        n = 8000
        x = rng.normal(size=n)
        a = 0.7 * x + rng.normal(size=n)
        b = 0.7 * x + rng.normal(size=n)
        y = 0.6 * a + 0.6 * b + rng.normal(size=n)
        got, _ = pc(np.stack([x, a, b, y], 1), alpha=0.01)
        expected = dag_to_cpdag(dag(4, (0, 1), (0, 2), (1, 3), (2, 3)))
        assert (got == expected).all()

    def test_chisq_collider(self):
        # binary collider: A, B fair coins, C = A OR B with 10% noise.
        # (NOT xor: xor of fair coins is pairwise-independent — a
        # faithfulness violation no constraint-based method can recover.)
        rng = np.random.default_rng(3)
        n = 8000
        a = rng.integers(0, 2, size=n)
        b = rng.integers(0, 2, size=n)
        noise = rng.random(size=n) < 0.1
        c = np.where(noise, rng.integers(0, 2, size=n), a | b)
        got, _ = pc(np.stack([a, c, b], 1).astype(float), alpha=0.05,
                    indep_test="chisq")
        expected = dag_to_cpdag(dag(3, (0, 1), (2, 1)))
        assert (got == expected).all()

    def test_chisq_independent(self):
        rng = np.random.default_rng(4)
        n = 4000
        data = rng.integers(0, 3, size=(n, 3)).astype(float)
        got, _ = pc(data, alpha=0.01, indep_test="chisq")
        assert (got == 0).all()


# ------------------------------------------------ count_accuracy metrics


class TestCountAccuracy:
    """Hand-computed cases for the NOTEARS-lineage structure metrics
    (reference modules/simulation.py:31-76; rewritten on boolean masks)."""

    def test_perfect_recovery(self):
        from cdgvae_tpu.utils.simulation import count_accuracy
        truth = dag(3, (0, 1), (1, 2)).astype(int)
        m = count_accuracy(truth, truth)
        assert m == {"fdr": 0.0, "tpr": 1.0, "fpr": 0.0, "shd": 0, "nnz": 2}

    def test_reversed_edge(self):
        from cdgvae_tpu.utils.simulation import count_accuracy
        truth = dag(3, (0, 1), (1, 2)).astype(int)
        est = dag(3, (1, 0), (1, 2)).astype(int)  # first edge flipped
        m = count_accuracy(truth, est)
        assert m["shd"] == 1          # one reversal
        assert m["tpr"] == 0.5        # one of two edges oriented right
        assert m["fdr"] == 0.5        # flipped edge counts against precision
        assert m["nnz"] == 2

    def test_spurious_and_missing(self):
        from cdgvae_tpu.utils.simulation import count_accuracy
        truth = dag(4, (0, 1), (1, 2)).astype(int)
        est = dag(4, (0, 1), (2, 3)).astype(int)   # missing (1,2), extra (2,3)
        m = count_accuracy(truth, est)
        assert m["shd"] == 2
        assert m["tpr"] == 0.5
        assert m["fdr"] == 0.5
        # fpr = wrong / (d(d-1)/2 - |truth|) = 1 / (6 - 2)
        assert m["fpr"] == pytest.approx(0.25)

    def test_rejects_non_binary_and_cyclic(self):
        from cdgvae_tpu.utils.simulation import count_accuracy
        truth = dag(2, (0, 1)).astype(int)
        with pytest.raises(ValueError):
            count_accuracy(truth, truth * 2)
        cyc = np.array([[0, 1], [1, 0]])
        with pytest.raises(ValueError):
            count_accuracy(truth, cyc)

    def test_empty_estimate(self):
        from cdgvae_tpu.utils.simulation import count_accuracy
        truth = dag(3, (0, 1)).astype(int)
        m = count_accuracy(truth, np.zeros((3, 3), dtype=int))
        assert m == {"fdr": 0.0, "tpr": 0.0, "fpr": 0.0, "shd": 1, "nnz": 0}

"""Golden-value tests of each loss term against hand-computed small tensors
(SURVEY.md §4 test plan)."""
import jax.numpy as jnp
import numpy as np

from cdgvae_tpu.ops import losses


def test_gaussian_recon_golden():
    x = jnp.zeros((2, 2, 2, 3))
    xhat = jnp.ones((2, 2, 2, 3))
    # 0.5 * sum over 12 pixels of 1, batch mean => 6.0
    assert float(losses.gaussian_recon(xhat, x)) == 6.0


def test_l1_recon_golden():
    x = jnp.zeros((2, 4))
    xhat = jnp.full((2, 4), -0.5)
    assert float(losses.l1_recon(xhat, x)) == 2.0


def test_kl_golden():
    mean = jnp.array([[1.0, 0.0]])
    logvar = jnp.array([[0.0, 0.0]])
    # 0.5 * (1 - 0 + 1 - 1  +  0 - 0 + 1 - 1) = 0.5
    np.testing.assert_allclose(float(losses.kl_std_normal(mean, logvar)), 0.5)

    # KL of exact prior is 0
    assert float(losses.kl_std_normal(jnp.zeros((3, 4)),
                                      jnp.zeros((3, 4)))) == 0.0


def test_alignment_bce_matches_naive_sigmoid_form():
    rng = np.random.default_rng(0)
    z = rng.normal(size=(6, 4)).astype(np.float32)
    y = rng.uniform(size=(6, 4)).astype(np.float32)
    p = 1 / (1 + np.exp(-z))
    naive = (-(y * np.log(p) + (1 - y) * np.log(1 - p))).sum(axis=1).mean()
    ours = float(losses.alignment_bce(jnp.asarray(z), jnp.asarray(y)))
    np.testing.assert_allclose(ours, naive, rtol=1e-5)


def test_infomax_mi_golden():
    dj = jnp.array([[1.0], [1.0]])
    dm = jnp.array([[1.0], [1.0]])
    # -(1 - exp(0)) = 0
    np.testing.assert_allclose(float(losses.infomax_mi(dj, dm)), 0.0,
                               atol=1e-7)


def test_posterior_variance():
    logvar = jnp.log(jnp.array([[1.0, 4.0], [1.0, 4.0]]))
    np.testing.assert_allclose(np.asarray(losses.posterior_variance(logvar)),
                               [1.0, 4.0], rtol=1e-6)


def test_clipped_bce_probs_matches_manual_form():
    """The probability-space BCE (torch BCELoss analogue) used by the
    downstream-classifier fits, toyDR, and the alignment-CE diagnostic."""
    from cdgvae_tpu.ops.losses import clipped_bce_probs

    rng = np.random.default_rng(3)
    p = rng.uniform(size=(16, 4)).astype(np.float32)
    y = (rng.uniform(size=(16, 4)) > 0.5).astype(np.float32)
    got = np.asarray(clipped_bce_probs(jnp.asarray(p), jnp.asarray(y)))
    pc = np.clip(p, 1e-7, 1 - 1e-7)
    want = -(y * np.log(pc) + (1 - y) * np.log(1 - pc))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # clipping keeps saturated probabilities finite (the reference's
    # BCELoss clamp behavior)
    sat = np.asarray(clipped_bce_probs(jnp.asarray([0.0, 1.0]),
                                       jnp.asarray([1.0, 0.0])))
    assert np.all(np.isfinite(sat))


def test_free_bits_kl_reduces_to_standard_at_zero_and_floors():
    """kl_std_normal_free_bits: at free_bits=0 it equals kl_std_normal
    exactly; above 0 each dim contributes at least the floor, and dims
    already above the floor are unchanged (hand-computed 2-dim case)."""
    from cdgvae_tpu.ops.losses import kl_std_normal, kl_std_normal_free_bits

    rng = np.random.default_rng(7)
    mean = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
    logvar = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32) * 0.3)
    np.testing.assert_allclose(
        float(kl_std_normal_free_bits(mean, logvar, 0.0)),
        float(kl_std_normal(mean, logvar)), rtol=1e-6)

    # dim 0 collapsed (mean 0, logvar 0 -> KL 0), dim 1 far above floor
    mean2 = jnp.asarray([[0.0, 3.0]] * 8, jnp.float32)
    logvar2 = jnp.zeros((8, 2), jnp.float32)
    kl_dim1 = 0.5 * 9.0  # 0.5 * mean^2
    got = float(kl_std_normal_free_bits(mean2, logvar2, 0.5))
    np.testing.assert_allclose(got, 0.5 + kl_dim1, rtol=1e-6)
    # floor larger than every dim: total = n_dims * floor
    got_hi = float(kl_std_normal_free_bits(mean2, logvar2, 10.0))
    np.testing.assert_allclose(got_hi, 20.0, rtol=1e-6)

"""Device-side pendulum renderer + DGP tests: band structure (the decoder
masks' spatial assumption), value range, and DGP physics."""
import numpy as np
import jax.numpy as jnp

from cdgvae_tpu.ops.renderer import render
from cdgvae_tpu.data.pendulum import (
    sample_factors_real, grid_factors, shadow_physics, PendulumDataset,
    normalize_labels)


def test_render_shapes_and_range():
    factors, _ = sample_factors_real(seed=1, n=8)
    imgs = render(jnp.asarray(factors[:, :4], jnp.float32), size=64)
    assert imgs.shape == (8, 64, 64, 3)
    x = np.asarray(imgs)
    assert x.min() >= -1.0 and x.max() <= 1.0
    # scene must actually contain non-white content
    assert (x < 0.9).any()


def test_render_band_structure():
    """Sun only in the light band (rows<20), shadow only in rows>=51 — the
    property the CDG-VAE masked GAM decoder relies on (main.py:167-179)."""
    factors, _ = grid_factors(5)
    imgs = np.asarray(render(jnp.asarray(factors[:, :4], jnp.float32), 64))
    rgb = (imgs + 1) / 2
    # orange pixels (sun): R high, G mid, B low
    orange = (rgb[..., 0] > 0.8) & (rgb[..., 1] > 0.4) & (rgb[..., 1] < 0.9) \
        & (rgb[..., 2] < 0.3)
    rows = np.where(orange.any(axis=(0, 2)))[0]
    assert len(rows) > 0 and rows.max() < 20

    # dark pixels below row 51 = shadow band content
    dark = (rgb.sum(-1) < 1.0)
    assert dark[:, 51:, :].any()
    # firebrick ball in the angle band [20, 51)
    ball = (rgb[..., 0] > 0.5) & (rgb[..., 0] < 0.85) & (rgb[..., 1] < 0.3)
    rows = np.where(ball.any(axis=(0, 2)))[0]
    assert len(rows) > 0 and rows.min() >= 20 and rows.max() < 51


def test_sun_moves_with_light_angle():
    f1 = jnp.asarray([[np.pi / 4, 0.3, 5.0, 8.0]], jnp.float32)
    f2 = jnp.asarray([[np.pi / 2, 0.3, 5.0, 8.0]], jnp.float32)
    i1, i2 = np.asarray(render(f1)), np.asarray(render(f2))
    # images differ only in the light band
    assert np.abs(i1[:, :20] - i2[:, :20]).max() > 0.5
    assert np.abs(i1[:, 20:] - i2[:, 20:]).max() < 1e-5


def test_shadow_physics_matches_reference_formula():
    import math
    light, angle = np.array([1.0]), np.array([0.5])
    length, pos = shadow_physics(light, angle)
    cx, cy, l, b = 10, 10.5, 9.5, -0.5
    x1 = cx + l * math.sin(0.5)
    y1 = cy - l * math.cos(0.5)
    ref_len = (x1 - (y1 - b) / math.tan(1.0)) - (cx - (cy - b) / math.tan(1.0))
    ref_pos = ((x1 - (y1 - b) / math.tan(1.0)) +
               (cx - (cy - b) / math.tan(1.0))) / 2
    np.testing.assert_allclose(length[0], ref_len, rtol=1e-9)
    np.testing.assert_allclose(pos[0], ref_pos, rtol=1e-9)


def test_dgp_corruption_and_split():
    factors, is_test = sample_factors_real(seed=1, n=100)
    assert is_test.sum() == 25  # every 4th
    # corrupted rows (every 5th) have shadow factors in U(0,12)
    corrupt = (np.arange(100) + 1) % 5 == 0
    assert (factors[corrupt, 2] >= 0).all() and (factors[corrupt, 2] <= 12).all()
    assert set(np.unique(factors[:, 4])) <= {0.0, 1.0}


def test_dataset_and_label_normalization():
    ds = PendulumDataset(n=80, train=True, seed=1)
    assert ds.x_data.shape == (60, 64, 64, 3)
    assert ds.y_data.shape == (60, 5)
    assert ds.y_data.min() >= 0.0 and ds.y_data.max() <= 1.0
    assert ds.name == ["light", "angle", "length", "position", "target"]

    ds_down = PendulumDataset(n=80, train=True, downstream=True, seed=1)
    assert ds_down.y_data[:, 0].max() > 1.0  # raw angles, not normalized

    lab = np.arange(12, dtype=float).reshape(6, 2)
    norm, std = normalize_labels(lab.copy())
    assert norm.min() == 0.0 and norm.max() == 1.0

    # labeled_ratio truncation
    ds_semi = PendulumDataset(n=80, train=True, labeled_ratio=0.5, seed=1)
    assert len(ds_semi) == 30


def test_pallas_renderer_matches_xla():
    """The Pallas TPU kernel (ops/renderer_pallas.py) must reproduce the XLA
    renderer exactly (1e-5, fp reassociation only) — including the DR blue
    background and non-TILE_B-multiple batch padding. Runs the kernel in
    interpret mode so the parity check works on CPU."""
    from cdgvae_tpu.ops.renderer_pallas import render_pallas

    factors, _ = sample_factors_real(seed=3, n=13)  # 13: exercises padding
    f = jnp.asarray(factors[:, :4], jnp.float32)
    bg = jnp.asarray(np.random.default_rng(0).integers(0, 2, 13),
                     jnp.float32)

    a = render(f, size=64)
    b = render_pallas(f, size=64, interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)

    a = render(f, size=64, background=bg)
    b = render_pallas(f, size=64, background=bg, interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)

"""Pallas TPU kernel for the device-side pendulum renderer.

The XLA renderer (ops/renderer.py) composites the scene in ~10 stages of
[batch, H, W, 3] elementwise ops — each a full HBM round trip (≈12 dataset
passes). This kernel paints each image in ONE pass that never leaves VMEM:
per grid step a tile of ``TILE_B`` images is rasterised entirely on the VPU
(sun, rod, ball, shadow composited in the reference's artist order) and the
finished channel planes are written out once.

Layout notes (the reason the kernel exists at all, see docs/PERF.md):
* Compute and output are channel-PLANAR ``[batch, 3, H, W]`` — the minor two
  dims (H, W) = (64, 64) tile onto (8, 128) VPU registers with only 2× lane
  padding, versus ~42× for HWC's minor dim of 3. The public wrapper
  transposes once to the reference's channels-last [batch, H, W, 3]
  (modules/datasets.py:43) — one cheap XLA pass.
* Per-image scene scalars ride in a small [TILE_B, 8] VMEM block; geometry
  constants fold at trace time.

Exactly matches ops/renderer.render (same geometry, anti-aliasing and paint
order — unit-tested to 1e-5). No gradients are needed (data generation), so
no custom VJP is defined.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .renderer import (_AX_X0, _AX_Y0, _AX_W, _AX_H, _XLIM, _YLIM,
                       _LINEWIDTH_PT, CENTER, ROD_LEN, GROUND)

TILE_B = 8

_COL_ORANGE = (1.0, 165 / 255.0, 0.0)
_COL_FIREBRICK = (178 / 255.0, 34 / 255.0, 34 / 255.0)
_COL_BLACK = (0.0, 0.0, 0.0)
_COL_WHITE = (1.0, 1.0, 1.0)
_COL_BLUE = (0.0, 0.0, 1.0)


def _make_kernel(size: int):
    # trace-time geometry constants (mirror renderer._data_to_px/_scales)
    sx = _AX_W * size / (_XLIM[1] - _XLIM[0])
    sy = _AX_H * size / (_YLIM[1] - _YLIM[0])
    x0 = _AX_X0 * size - _XLIM[0] * sx            # px = x0 + sx * x_data
    y0 = (1.0 - _AX_Y0) * size + _YLIM[0] * sy    # py = y0 - sy * y_data
    lw_half = 0.5 * _LINEWIDTH_PT / 72.0 * size
    sxy = (sx * sy) ** 0.5

    def kernel(scal_ref, out_ref):
        # scal_ref: [TILE_B, 8] VMEM (lx, bx, by, s3, s4, bg, 0, 0)
        # out_ref:  [TILE_B, 3, size, size] VMEM, channel-planar, in [-1, 1]
        def col(j):
            return scal_ref[:, j].reshape(TILE_B, 1, 1)

        lx, bx, by = col(0), col(1), col(2)
        s3, s4, bg = col(3), col(4), col(5)

        # mosaic iota must be integer-typed; cast to f32 for pixel centers
        py = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_B, size, size), 1).astype(jnp.float32) + 0.5
        px = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_B, size, size), 2).astype(jnp.float32) + 0.5

        def coverage(dist_px):
            return jnp.clip(0.5 - dist_px, 0.0, 1.0)

        # axes-window clip mask (matplotlib clips artists + facecolor to
        # the axes bbox; mirrors renderer.render's `window`)
        wx0, wx1 = x0 + sx * _XLIM[0], x0 + sx * _XLIM[1]
        wy0, wy1 = y0 - sy * _YLIM[1], y0 - sy * _YLIM[0]
        window = (jnp.clip(jnp.minimum(px - wx0, wx1 - px) + 0.5, 0.0, 1.0)
                  * jnp.clip(jnp.minimum(py - wy0, wy1 - py) + 0.5,
                             0.0, 1.0))

        def ellipse_cov(cx, cy, r):
            dx = (px - (x0 + sx * cx)) / (r * sx)
            dy = (py - (y0 - sy * cy)) / (r * sy)
            rho = jnp.sqrt(dx * dx + dy * dy + 1e-12)
            return coverage((rho - 1.0) * r * sxy)

        def segment_cov(ax, ay, bx_, by_, extra):
            pax, pay = x0 + sx * ax, y0 - sy * ay
            vx, vy = sx * (bx_ - ax), -sy * (by_ - ay)
            wx, wy = px - pax, py - pay
            t = jnp.clip((wx * vx + wy * vy)
                         / (vx * vx + vy * vy + 1e-12), 0.0, 1.0)
            dx, dy = wx - t * vx, wy - t * vy
            return coverage(jnp.sqrt(dx * dx + dy * dy + 1e-12) - extra)

        # artist order: background, sun, rod, ball, shadow (all clipped)
        cov_bg = window * (bg > 0.5)
        cov_sun = window * ellipse_cov(lx, 20.5, 3.0)
        cov_rod = window * segment_cov(
            jnp.full_like(bx, CENTER[0]),
            jnp.full_like(by, CENTER[1]), bx, by, lw_half)
        cov_ball = window * ellipse_cov(bx, by, 1.5)
        cov_shadow = window * segment_cov(
            s4 - s3 / 2.0, jnp.full_like(s4, GROUND),
            s4 + s3 / 2.0, jnp.full_like(s4, GROUND), lw_half)

        for c in range(3):
            plane = jnp.ones((TILE_B, size, size), jnp.float32) \
                * _COL_WHITE[c]
            for cov, color in ((cov_bg, _COL_BLUE),
                               (cov_sun, _COL_ORANGE),
                               (cov_rod, _COL_BLACK),
                               (cov_ball, _COL_FIREBRICK),
                               (cov_shadow, _COL_BLACK)):
                plane = plane * (1.0 - cov) + color[c] * cov
            out_ref[:, c] = plane * 2.0 - 1.0

    return kernel


@partial(jax.jit, static_argnames=("size", "interpret"))
def render_pallas(factors: jax.Array, size: int = 64,
                  background: jax.Array | None = None,
                  interpret: bool = False) -> jax.Array:
    """Drop-in replacement for ops.renderer.render (same signature and
    output: [batch, size, size, 3] float32 in [-1, 1], channels-last)."""
    n = factors.shape[0]
    xi1, xi2, xi3, xi4 = (factors[:, i].astype(jnp.float32)
                          for i in range(4))
    if background is None:
        bg = jnp.zeros(n, jnp.float32)
    else:
        bg = background.astype(jnp.float32)

    light_x = CENTER[0] + 10.0 / jnp.tan(xi1)
    ball_x = CENTER[0] + (ROD_LEN - 1.5) * jnp.sin(xi2)
    ball_y = CENTER[1] - (ROD_LEN - 1.5) * jnp.cos(xi2)
    scal = jnp.stack([light_x, ball_x, ball_y, xi3, xi4, bg,
                      jnp.zeros(n, jnp.float32),
                      jnp.zeros(n, jnp.float32)], axis=1)

    pad = (-n) % TILE_B
    if pad:
        scal = jnp.concatenate(
            [scal, jnp.ones((pad, 8), jnp.float32)], axis=0)
    n_pad = n + pad

    planar = pl.pallas_call(
        _make_kernel(size),
        grid=(n_pad // TILE_B,),
        in_specs=[pl.BlockSpec((TILE_B, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE_B, 3, size, size),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 3, size, size), jnp.float32),
        interpret=interpret,
    )(scal)
    return jnp.transpose(planar[:n], (0, 2, 3, 1))

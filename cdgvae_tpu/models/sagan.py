"""SAGAN building blocks in functional JAX, NHWC (TPU-native layout).

Re-designs reference celeba/module/sagan.py: spectral-norm conv/linear
wrappers, self-attention, noise injection, residual upsampling generator
blocks, the 4x4 -> image_size Generator, and the (training-unused but
shipped) discriminator blocks.

Deviations from the torch original, both deliberate and documented:
* Spectral norm is STATEFUL like torch's (torch.nn.utils.spectral_norm),
  but the power-iteration state update lives OUTSIDE the autodiff'd
  forward: each SN site stores (u, v); the forward computes
  ``sigma = u @ W @ v`` with u, v as stop-gradient constants (torch
  detaches them identically), and :func:`sn_refresh` advances u, v by one
  power iteration per optimizer step as a post-update hook on the params
  pytree (wired into every CelebA training path). This removes the
  round-1 design's 3 serialized power-iteration matvec chains from
  inside every forward — profiled at ~10 ms/step (~6% of the batch-64
  wall) across the ~100 SN sites of the 5-generator decoder — while
  matching torch's semantics more closely (warm-started u tracks the
  leading singular vector as weights drift; cold fixed-u estimation
  degrades). Checkpoints from the stateless era (no stored "v") still
  load: sites without "v" fall back to the legacy in-forward estimate.
* BatchNorm uses batch statistics in all modes (the reference never
  switches its celeba model to eval mode, celeba/main.py has no model.eval()
  or save); no running averages are kept.
* Weight init is orthogonal with zero bias (sagan.py:15-17), matching the
  reference's init_weights applied over the whole Generator.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import batchnorm, bn_init  # shared batch-stats BN

SN_POWER_ITERS = 3

Params = dict


def _orthogonal(key, shape, dtype=jnp.float32):
    """Orthogonal init over (fan_in, fan_out) flattening, like torch
    orthogonal_ on a conv/linear weight."""
    if len(shape) == 2:
        flat = shape
    else:  # HWIO conv kernel: torch orthogonal_ flattens all but dim 0 of
        # OIHW; equivalent here: rows = O, cols = H*W*I
        flat = (shape[3], shape[0] * shape[1] * shape[2])
    a = jax.random.normal(key, (max(flat), min(flat)), dtype)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))
    q = q[: flat[0], : flat[1]] if flat[0] >= flat[1] else \
        q[: flat[1], : flat[0]].T
    if len(shape) == 2:
        return q.reshape(shape)
    return q.reshape(shape[3], shape[0], shape[1], shape[2]).transpose(
        1, 2, 3, 0)


def _w2d(w: jax.Array) -> jax.Array:
    """[out, flattened-in] view of an SN weight (linear [in,out] or HWIO
    conv kernel)."""
    if w.ndim == 2:
        return w.T
    return w.reshape(-1, w.shape[-1]).T  # [out, h*w*in]


def _power_iterate(w2d: jax.Array, u: jax.Array, iters: int):
    """``iters`` power iterations from u; returns (u, v) normalized."""
    if iters < 1:
        raise ValueError("power iteration needs iters >= 1")
    for _ in range(iters):
        v = w2d.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = w2d @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
    return u, v


def _sn_sigma(w2d: jax.Array, u: jax.Array) -> jax.Array:
    """Legacy stateless estimate (pre-"v" checkpoints): power-iterate in
    the forward from the fixed stored u."""
    u, v = _power_iterate(w2d, u, SN_POWER_ITERS)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    return u @ w2d @ v


def _sigma(p: Params, w2d: jax.Array) -> jax.Array:
    """Spectral-norm estimate of an SN site. Stateful sites (stored "v",
    refreshed each step by :func:`sn_refresh`) pay only the sigma
    contraction in the autodiff'd forward — u, v are constants there,
    exactly torch's detached-u/v semantics."""
    if "v" in p:
        u = jax.lax.stop_gradient(p["u"])
        v = jax.lax.stop_gradient(p["v"])
        return u @ w2d @ v
    return _sn_sigma(w2d, p["u"])


def _is_sn_site(node) -> bool:
    return isinstance(node, dict) and "u" in node and "w" in node


def sn_site_refresh(p: Params, iters: int = 1) -> Params:
    """Advance one SN site's (u, v) by ``iters`` power iterations from the
    CURRENT weight — torch spectral_norm's per-forward state update, run
    once per optimizer step outside autodiff. Sites stacked by
    :func:`stack_generator_params` (u carries a leading K axis) refresh
    each slice independently via vmap."""
    if p["u"].ndim == 2:  # stacked site: every leaf has a leading K axis
        return jax.vmap(lambda q: sn_site_refresh(q, iters))(p)
    u, v = _power_iterate(_w2d(p["w"]), p["u"], iters)
    return {**p, "u": u, "v": v}


def sn_refresh(params, iters: int = 1):
    """Post-update params hook: refresh every STATEFUL SN site's (u, v) in
    a params pytree (dicts holding "w", "u" and "v"). Legacy sites (no
    stored "v" — checkpoints from the stateless era) pass through
    untouched so the pytree STRUCTURE is invariant — required for use as
    a lax.scan carry update (those sites keep estimating in-forward).
    Pure function, safe inside jit/scan/shard_map (the update is
    deterministic, so replicated params stay replicated)."""
    if _is_sn_site(params):
        return sn_site_refresh(params, iters) if "v" in params else params
    if isinstance(params, dict):
        return {k: sn_refresh(v, iters) for k, v in params.items()}
    return params


def snlinear_init(key, in_f, out_f, dtype=jnp.float32) -> Params:
    kw, ku = jax.random.split(key)
    p = {"w": _orthogonal(kw, (in_f, out_f), dtype),
         "b": jnp.zeros((out_f,), dtype),
         "u": jax.random.normal(ku, (out_f,), dtype)}
    return sn_site_refresh(p, SN_POWER_ITERS)  # warm-start u, v


def snlinear(p: Params, x: jax.Array) -> jax.Array:
    sigma = _sigma(p, _w2d(p["w"]))
    return x @ (p["w"] / sigma) + p["b"]


def snconv_init(key, in_ch, out_ch, kernel, dtype=jnp.float32) -> Params:
    kw, ku = jax.random.split(key)
    p = {"w": _orthogonal(kw, (kernel, kernel, in_ch, out_ch), dtype),
         "b": jnp.zeros((out_ch,), dtype),
         "u": jax.random.normal(ku, (out_ch,), dtype)}
    return sn_site_refresh(p, SN_POWER_ITERS)  # warm-start u, v


def snconv2d(p: Params, x: jax.Array, stride: int = 1,
             padding="SAME") -> jax.Array:
    w = p["w"]
    sigma = _sigma(p, _w2d(w))
    y = jax.lax.conv_general_dilated(
        x, w / sigma, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

def self_attn_init(key, in_ch, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "theta": snconv_init(ks[0], in_ch, in_ch // 8, 1, dtype),
        "phi": snconv_init(ks[1], in_ch, in_ch // 8, 1, dtype),
        "g": snconv_init(ks[2], in_ch, in_ch // 2, 1, dtype),
        "attn": snconv_init(ks[3], in_ch // 2, in_ch, 1, dtype),
        "sigma": jnp.zeros((1,), dtype),
    }


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def self_attn(p: Params, x: jax.Array) -> jax.Array:
    """Spatial self-attention (sagan.py:31-73). x: [B, H, W, C]."""
    B, H, W, C = x.shape
    theta = snconv2d(p["theta"], x).reshape(B, H * W, C // 8)
    phi = _maxpool2(snconv2d(p["phi"], x)).reshape(B, H * W // 4, C // 8)
    attn = jax.nn.softmax(
        jnp.einsum("bqc,bkc->bqk", theta, phi), axis=-1)
    g = _maxpool2(snconv2d(p["g"], x)).reshape(B, H * W // 4, C // 2)
    attn_g = jnp.einsum("bqk,bkc->bqc", attn, g).reshape(B, H, W, C // 2)
    attn_g = snconv2d(p["attn"], attn_g)
    return x + p["sigma"] * attn_g


def noise_injection_init(ch, dtype=jnp.float32) -> Params:
    return {"weight": jnp.zeros((1, 1, 1, ch), dtype)}


def noise_injection(p: Params, x: jax.Array, rng) -> jax.Array:
    noise = jax.random.normal(rng, x.shape[:3] + (1,), x.dtype)
    return x + p["weight"] * noise




def _upsample2(x):
    """Nearest-neighbor 2x upsample as broadcast+reshape. Bit-identical to
    ``jax.image.resize(..., method="nearest")`` at integer 2x (output pixel
    (i, j) reads input (i//2, j//2)), but lowers to a fusible broadcast
    instead of resize's gather — the resize version left ~8 ms/step of
    layout-change copies on [B,2H,2W,C] tensors in the batch-64 CelebA
    trace (docs/PERF.md round-3 MFU pass)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


def gen_ini_block_init(key, z_dim, out_ch, add_noise=True,
                       dtype=jnp.float32) -> Params:
    p = {"linear": snlinear_init(key, z_dim, out_ch * 4 * 4, dtype)}
    if add_noise:
        p["noise"] = noise_injection_init(out_ch, dtype)
    return p


def gen_ini_block(p: Params, z: jax.Array, rng, add_noise=True) -> jax.Array:
    x = snlinear(p["linear"], z).reshape(z.shape[0], 4, 4, -1)
    if add_noise:
        x = noise_injection(p["noise"], x, rng)
    return x


def gen_block_init(key, in_ch, out_ch, add_noise=True,
                   dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 3)
    p = {
        "conv1": snconv_init(ks[0], in_ch, out_ch, 3, dtype),
        "conv2": snconv_init(ks[1], out_ch, out_ch, 3, dtype),
        "conv0": snconv_init(ks[2], in_ch, out_ch, 1, dtype),
        "bn1": bn_init(in_ch, dtype),
        "bn2": bn_init(out_ch, dtype),
    }
    if add_noise:
        p["noise1"] = noise_injection_init(out_ch, dtype)
        p["noise2"] = noise_injection_init(out_ch, dtype)
    return p


def gen_block(p: Params, x: jax.Array, rng, add_noise=True) -> jax.Array:
    """Residual upsample block (sagan.py:103-135)."""
    r1, r2 = jax.random.split(rng)
    x0 = x
    h = jax.nn.relu(batchnorm(x, p["bn1"]["scale"], p["bn1"]["bias"]))
    h = _upsample2(h)
    h = snconv2d(p["conv1"], h)
    if add_noise:
        h = noise_injection(p["noise1"], h, r1)
    h = jax.nn.relu(batchnorm(h, p["bn2"]["scale"], p["bn2"]["bias"]))
    h = snconv2d(p["conv2"], h)
    if add_noise:
        h = noise_injection(p["noise2"], h, r2)
    x0 = snconv2d(p["conv0"], _upsample2(x0))
    return h + x0


class Generator:
    """SAGAN Generator 4x4 -> image_size (sagan.py:137-210), z -> tanh image.

    Supports image_size 64/128/256/512 with the reference's channel
    schedule and attention placement after block3.
    """

    def __init__(self, latent_dim: int, conv_dim: int = 32,
                 image_size: int = 128, out_channels: int = 3,
                 add_noise: bool = True, attn: bool = True,
                 dtype=jnp.float32):
        self.latent_dim = latent_dim
        self.conv_dim = conv_dim
        self.image_size = image_size
        self.out_channels = out_channels
        self.add_noise = add_noise
        self.attn = attn
        self.dtype = dtype
        cd = conv_dim
        if image_size == 16:  # small sizes for tests/debug (not in reference)
            self.blocks = [(cd * 16, cd * 16), (cd * 16, cd * 8)]
            self.attn_after = 1
            self.final_ch = cd * 8
        elif image_size == 32:
            self.blocks = [(cd * 16, cd * 16), (cd * 16, cd * 8),
                           (cd * 8, cd * 4)]
            self.attn_after = 2
            self.final_ch = cd * 4
        elif image_size == 64:
            self.blocks = [(cd * 16, cd * 16), (cd * 16, cd * 8),
                           (cd * 8, cd * 4), (cd * 4, cd * 2)]
            self.attn_after = 2
            self.final_ch = cd * 2
        elif image_size == 128:
            self.blocks = [(cd * 16, cd * 16), (cd * 16, cd * 8),
                           (cd * 8, cd * 4), (cd * 4, cd * 2),
                           (cd * 2, cd)]
            self.attn_after = 2
            self.final_ch = cd
        else:
            n_extra = 1 if image_size == 256 else 2
            self.blocks = [(cd * 16, cd * 16), (cd * 16, cd * 8),
                           (cd * 8, cd * 8), (cd * 8, cd * 4),
                           (cd * 4, cd * 2), (cd * 2, cd)]
            if n_extra == 2:
                self.blocks.append((cd, cd))
            self.attn_after = 3
            self.final_ch = cd

    def init(self, key) -> Params:
        ks = jax.random.split(key, len(self.blocks) + 3)
        p = {"block0": gen_ini_block_init(ks[0], self.latent_dim,
                                          self.conv_dim * 16,
                                          self.add_noise, self.dtype)}
        for i, (ic, oc) in enumerate(self.blocks):
            p[f"block{i + 1}"] = gen_block_init(ks[1 + i], ic, oc,
                                                self.add_noise, self.dtype)
        if self.attn:
            attn_ch = self.blocks[self.attn_after][1]
            p["self_attn1"] = self_attn_init(ks[-2], attn_ch, self.dtype)
        p["bn"] = bn_init(self.final_ch, self.dtype)
        p["toRGB"] = snconv_init(ks[-1], self.final_ch, self.out_channels,
                                 3, self.dtype)
        return p

    def __call__(self, params: Params, z: jax.Array, rng) -> jax.Array:
        """z [B, latent_dim] -> [B, H, W, out_channels] in (-1, 1)."""
        rngs = jax.random.split(rng, len(self.blocks) + 1)
        x = gen_ini_block(params["block0"], z, rngs[0], self.add_noise)
        for i in range(len(self.blocks)):
            x = gen_block(params[f"block{i + 1}"], x, rngs[i + 1],
                          self.add_noise)
            if self.attn and i == self.attn_after:
                x = self_attn(params["self_attn1"], x)
        x = jax.nn.relu(batchnorm(x, params["bn"]["scale"],
                                  params["bn"]["bias"]))
        return jnp.tanh(snconv2d(params["toRGB"], x))


# ---------------------------------------------------------------------------
# Stacked generators: K same-architecture Generators as ONE vmapped program
# ---------------------------------------------------------------------------

def _pad_gen_input(p: Params, zmax: int) -> Params:
    """Zero-pad one generator's input linear (block0) to ``zmax`` input
    rows. Padded rows only ever multiply zero-padded z entries, so outputs
    AND gradients are unchanged (grad of a row = z_row · δ = 0; Adam keeps
    a zero-grad row at zero), and the largest singular value — hence the
    SN sigma — is invariant under zero-row padding. The stored power-
    iteration "v" (dim = input) pads with zeros consistently: the refresh
    v ∝ w2d.T @ u lands exactly 0 in padded slots."""
    lin = p["block0"]["linear"]
    zd = lin["w"].shape[0]
    if zd == zmax:
        return p
    lin = dict(lin)
    lin["w"] = jnp.zeros((zmax,) + lin["w"].shape[1:],
                         lin["w"].dtype).at[:zd].set(lin["w"])
    if "v" in lin:
        lin["v"] = jnp.zeros((zmax,), lin["v"].dtype).at[:zd].set(lin["v"])
    return {**p, "block0": {**p["block0"], "linear": lin}}


def stack_generator_params(params_list, zmax: int) -> Params:
    """Stack K per-generator param pytrees (identical structure modulo the
    block0 input width, which is zero-padded to ``zmax``) into one pytree
    whose every leaf carries a leading K axis."""
    padded = [_pad_gen_input(p, zmax) for p in params_list]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *padded)


class StackedGenerator:
    """K same-architecture SAGAN Generators evaluated as ONE vmapped
    program over a stacked parameter pytree.

    Motivation (docs/PERF.md round-3 MFU pass): the per-generator CelebA
    GAM decoder stages ~100 SN sites' tiny parameter tensors (f32[32],
    f32[1,1,1,32], …) as individual HBM→VMEM DMAs — latency-bound churn
    that left the batch-64 step ~75% idle. Stacking turns 5 generators'
    tensors into one-fifth the DMA descriptors and batches their convs,
    the same move that won 2× on the pendulum stacked GAM decoder
    (models/vae.py::nn.stacked_dense).

    MEASURED OUTCOME (docs/PERF.md round-3 stacked A/B): on the conv
    family the move LOSES ~8-10% at batch 16 AND 64 — XLA lowers the
    vmapped convs to feature-group_count=5 grouped convolutions, and the
    TPU grouped-conv emitter is slower than 5 sequential dense convs by
    more than the DMA batching saves (the scan while-loop itself got
    ~12% slower in-trace). Kept as an opt-in
    (``CelebACDGVAE(stacked=True)`` / ``--stacked_decoder true``) with
    exact functional equivalence, checkpoint-format interop both ways,
    and the A/B record — the default stays per-generator.

    ``z_dims`` may differ per generator (reference parent groups are 2/2/
    2/3-wide plus the 6-wide style generator, celeba/module/model.py:
    189-195); inputs are zero-padded to ``max(z_dims)`` with exact
    functional equivalence (see :func:`_pad_gen_input`).
    """

    def __init__(self, z_dims, conv_dim: int = 32, image_size: int = 128,
                 out_channels: int = 3, add_noise: bool = True,
                 attn: bool = True, dtype=jnp.float32):
        self.z_dims = tuple(z_dims)
        self.zmax = max(self.z_dims)
        self.K = len(self.z_dims)
        self._cfg = dict(conv_dim=conv_dim, image_size=image_size,
                         out_channels=out_channels, add_noise=add_noise,
                         attn=attn, dtype=dtype)
        self.gen = Generator(self.zmax, **self._cfg)

    def init(self, key) -> Params:
        """Initialize each generator at its TRUE input width (bit-identical
        per-slice values to K independent ``Generator.init`` calls on the
        same keys), then stack."""
        ks = jax.random.split(key, self.K)
        ps = [Generator(zd, **self._cfg).init(k)
              for zd, k in zip(self.z_dims, ks)]
        return stack_generator_params(ps, self.zmax)

    def __call__(self, params: Params, z: jax.Array, rngs) -> jax.Array:
        """z [K, B, zmax] (zero-padded per slice), rngs [K] keys ->
        [K, B, H, W, out_channels]."""
        return jax.vmap(self.gen)(params, z, rngs)


# ---------------------------------------------------------------------------
# Discriminator (shipped for completeness; unused by CDG-VAE training, like
# the reference's sagan.py:212-414)
# ---------------------------------------------------------------------------

class Discriminator:
    """SAGAN discriminator: strided snconv downsampling stack + attention +
    global-sum features -> scalar."""

    def __init__(self, conv_dim: int = 32, image_size: int = 128,
                 in_channels: int = 3, dtype=jnp.float32):
        self.conv_dim = conv_dim
        self.image_size = image_size
        self.in_channels = in_channels
        self.dtype = dtype
        cd = conv_dim
        # downsample to 4x4
        chans = [in_channels, cd, cd * 2, cd * 4, cd * 8, cd * 16]
        n_down = {64: 4, 128: 5, 256: 6}[image_size]
        while len(chans) - 1 < n_down:
            chans.append(cd * 16)
        self.chans = chans[: n_down + 1]

    def init(self, key) -> Params:
        ks = jax.random.split(key, len(self.chans) + 1)
        p = {}
        for i in range(len(self.chans) - 1):
            p[f"conv{i}"] = snconv_init(ks[i], self.chans[i],
                                        self.chans[i + 1], 4, self.dtype)
        p["attn"] = self_attn_init(ks[-2], self.chans[2], self.dtype)
        p["fc"] = snlinear_init(ks[-1], self.chans[-1], 1, self.dtype)
        return p

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i in range(len(self.chans) - 1):
            x = jax.nn.leaky_relu(
                snconv2d(params[f"conv{i}"], x, stride=2), 0.1)
            if i == 1:
                x = self_attn(params["attn"], x)
        feat = x.sum(axis=(1, 2))
        return snlinear(params["fc"], feat)


def _sn_res_mlp_block_init(key, channels, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {"fc1": snlinear_init(k1, channels, channels, dtype),
            "fc2": snlinear_init(k2, channels, channels, dtype)}


def _sn_res_mlp_block(p: Params, x: jax.Array) -> jax.Array:
    """Spectral-norm residual MLP block (reference sagan.py:345-360):
    relu(fc2(relu(fc1(x))) + x)."""
    out = snlinear(p["fc2"], jax.nn.relu(snlinear(p["fc1"], x)))
    return jax.nn.relu(out + x)


class DiscriminatorMLP:
    """Spectral-norm residual MLP discriminator (reference
    sagan.py:362-395 ``Discriminator_MLP``; training-unused there too,
    shipped for inventory completeness). ``out_feature=True`` returns
    (logit, penultimate features) like the reference."""

    def __init__(self, in_channels: int, out_channels: int,
                 out_feature: bool = True, num_block: int = 3,
                 dtype=jnp.float32):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.out_feature = out_feature
        self.num_block = num_block
        self.dtype = dtype

    def init(self, key) -> Params:
        ks = jax.random.split(key, self.num_block + 2)
        p = {"fc1": snlinear_init(ks[0], self.in_channels,
                                  self.out_channels, self.dtype)}
        for i in range(self.num_block):
            p[f"block{i + 1}"] = _sn_res_mlp_block_init(
                ks[i + 1], self.out_channels, self.dtype)
        p["fc4"] = snlinear_init(ks[-1], self.out_channels, 1, self.dtype)
        return p

    def __call__(self, params: Params, z: jax.Array):
        f = jax.nn.relu(snlinear(params["fc1"], z))
        for i in range(self.num_block):
            f = _sn_res_mlp_block(params[f"block{i + 1}"], f)
        out = snlinear(params["fc4"], f)
        if self.out_feature:
            return out, f
        return out


class DCDiscriminator:
    """DCGAN-style discriminator (reference sagan.py:398-414): three plain
    5x5/stride-2 convs + LeakyReLU, flatten, linear -> logit. NHWC here.

    Deviation: the reference hardcodes the fc input as conv_dim*4*4*4,
    which only matches image_size=32 (its default 64 would crash at
    runtime — dead code); the fc here is sized from the actual
    post-conv spatial dims so every image_size divisible by 8 works."""

    def __init__(self, conv_dim: int = 64, image_size: int = 64,
                 image_channel: int = 3, dtype=jnp.float32):
        if image_size % 8 != 0:
            raise ValueError("image_size must be divisible by 8")
        self.conv_dim = conv_dim
        self.image_size = image_size
        self.image_channel = image_channel
        self.dtype = dtype
        self.chans = [image_channel, conv_dim, conv_dim * 2, conv_dim * 4]

    def init(self, key) -> Params:
        from ..nn import conv_init, dense_init
        ks = jax.random.split(key, 4)
        p = {}
        for i in range(3):
            p[f"conv{i}"] = conv_init(ks[i], self.chans[i],
                                      self.chans[i + 1], 5, dtype=self.dtype)
        feat = self.conv_dim * 4 * (self.image_size // 8) ** 2
        p["fc"] = dense_init(ks[3], feat, 1, dtype=self.dtype)
        return p

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        from ..nn import conv2d, dense
        for i in range(3):
            # torch LeakyReLU default slope 0.01
            x = jax.nn.leaky_relu(conv2d(params[f"conv{i}"], x, stride=2),
                                  0.01)
        return dense(params["fc"], x.reshape(x.shape[0], -1))

"""ResNet-18/34/50 encoder in functional JAX, NHWC.

The reference uses torchvision's ImageNet-pretrained resnet18 with all layers
frozen except a new fc head (celeba/module/model.py:117-125); it also ships
its own full ResNet reimplementation as dead code (celeba/module/resnet.py).
Pretrained ImageNet weights are not available offline in this environment, so
this encoder initializes randomly; the trunk can still be frozen
(``freeze_trunk=True``, the reference's configuration — making it a fixed
random-feature extractor) or trained end-to-end (``freeze_trunk=False``,
usually the better offline choice). DEVIATION from reference: random trunk
weights instead of ImageNet weights — but when a user supplies a torchvision
state dict, :meth:`ResNetEncoder.load_torch_weights` imports it (OIHW->HWIO
kernel mapping, BN running stats honored via eval-mode normalization), fully
restoring the reference configuration.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import (batchnorm as _batchnorm,  # shared batch-stats BN
                 bn_init as _bn_init)

Params = dict


def _kaiming_conv(key, shape, dtype=jnp.float32):
    fan_out = shape[0] * shape[1] * shape[3]
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape, dtype) * std


def _conv_init(key, in_ch, out_ch, k, dtype=jnp.float32):
    return {"w": _kaiming_conv(key, (k, k, in_ch, out_ch), dtype)}


def _conv(p, x, stride=1):
    # explicit symmetric padding (k//2 each side) rather than XLA "SAME":
    # identical for stride 1, and for stride 2 it aligns the conv windows
    # with torch's — required for imported torchvision weights to compute
    # the same features ("SAME" pads asymmetrically on even inputs)
    k = p["w"].shape[0]
    pad = k // 2
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(p, x):
    if "mean" in p:
        # imported running statistics (torchvision eval-mode BN): a frozen
        # pretrained trunk must normalize with the stats the weights were
        # trained against, not per-batch stats
        return ((x - p["mean"]) * jax.lax.rsqrt(p["var"] + 1e-5)
                * p["scale"] + p["bias"])
    return _batchnorm(x, p["scale"], p["bias"])


def _basic_block_init(key, in_ch, out_ch, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": _conv_init(ks[0], in_ch, out_ch, 3, dtype),
        "bn1": _bn_init(out_ch, dtype),
        "conv2": _conv_init(ks[1], out_ch, out_ch, 3, dtype),
        "bn2": _bn_init(out_ch, dtype),
    }
    if in_ch != out_ch:
        p["down_conv"] = _conv_init(ks[2], in_ch, out_ch, 1, dtype)
        p["down_bn"] = _bn_init(out_ch, dtype)
    return p


def _basic_block(p, x, stride=1):
    identity = x
    h = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x, stride)))
    h = _bn(p["bn2"], _conv(p["conv2"], h))
    if "down_conv" in p:
        identity = _bn(p["down_bn"], _conv(p["down_conv"], x, stride))
    return jax.nn.relu(h + identity)


def _bottleneck_init(key, in_ch, out_ch, dtype=jnp.float32):
    """ResNet-50 bottleneck: 1x1 reduce -> 3x3 -> 1x1 expand (x4)."""
    mid = out_ch // 4
    ks = jax.random.split(key, 4)
    p = {
        "conv1": _conv_init(ks[0], in_ch, mid, 1, dtype),
        "bn1": _bn_init(mid, dtype),
        "conv2": _conv_init(ks[1], mid, mid, 3, dtype),
        "bn2": _bn_init(mid, dtype),
        "conv3": _conv_init(ks[2], mid, out_ch, 1, dtype),
        "bn3": _bn_init(out_ch, dtype),
    }
    if in_ch != out_ch:
        p["down_conv"] = _conv_init(ks[3], in_ch, out_ch, 1, dtype)
        p["down_bn"] = _bn_init(out_ch, dtype)
    return p


def _bottleneck(p, x, stride=1):
    identity = x
    h = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x)))
    h = jax.nn.relu(_bn(p["bn2"], _conv(p["conv2"], h, stride)))
    h = _bn(p["bn3"], _conv(p["conv3"], h))
    if "down_conv" in p:
        identity = _bn(p["down_bn"], _conv(p["down_conv"], x, stride))
    return jax.nn.relu(h + identity)


_LAYERS = {"resnet18": [2, 2, 2, 2], "resnet34": [3, 4, 6, 3],
           "resnet50": [3, 4, 6, 3]}
_WIDTHS = [64, 128, 256, 512]
_BOTTLENECK = {"resnet18": False, "resnet34": False, "resnet50": True}


class ResNetEncoder:
    """ResNet trunk + linear head, NHWC input in [0, 1] or [-1, 1]."""

    def __init__(self, out_dim: int, depth: str = "resnet18",
                 in_channels: int = 3, freeze_trunk: bool = True,
                 dtype=jnp.float32):
        self.out_dim = out_dim
        self.layers = _LAYERS[depth]
        self.bottleneck = _BOTTLENECK[depth]
        self.expansion = 4 if self.bottleneck else 1
        self.in_channels = in_channels
        self.freeze_trunk = freeze_trunk
        self.dtype = dtype

    def init(self, key) -> Params:
        n_blocks = sum(self.layers)
        ks = jax.random.split(key, n_blocks + 2)
        p = {"stem_conv": _conv_init(ks[0], self.in_channels, 64, 7,
                                     self.dtype),
             "stem_bn": _bn_init(64, self.dtype)}
        ki = 1
        in_ch = 64
        block_init = _bottleneck_init if self.bottleneck \
            else _basic_block_init
        for li, (n, width) in enumerate(zip(self.layers, _WIDTHS)):
            for bi in range(n):
                p[f"layer{li}_{bi}"] = block_init(
                    ks[ki], in_ch, width * self.expansion, self.dtype)
                in_ch = width * self.expansion
                ki += 1
        feat_dim = 512 * self.expansion
        bound = 1.0 / math.sqrt(feat_dim)
        kw, kb = jax.random.split(ks[-1])
        p["fc"] = {
            "w": jax.random.uniform(kw, (feat_dim, self.out_dim), self.dtype,
                                    -bound, bound),
            "b": jax.random.uniform(kb, (self.out_dim,), self.dtype,
                                    -bound, bound),
        }
        return p

    def load_torch_weights(self, params: Params, state_dict,
                           use_running_stats: bool = True) -> Params:
        """Import a torchvision-layout ResNet state dict into this pytree.

        Closes the reference's pretrained-encoder gap
        (celeba/module/model.py:117-125: frozen ImageNet resnet18 + new fc):
        when a user supplies torchvision weights (a ``state_dict`` of torch
        tensors or numpy arrays keyed ``conv1.weight``, ``bn1.*``,
        ``layer{1-4}.{i}.{conv,bn}{1-3}.*``, ``downsample.{0,1}.*``), this
        maps conv kernels OIHW -> HWIO and BatchNorm affine params onto the
        matching entries of ``params``.

        ``use_running_stats=True`` additionally stores each BN's running
        mean/var, which switches that BN to eval-mode normalization (see
        :func:`_bn`) — the correct semantics for a frozen pretrained trunk.
        The fc head is NOT imported (the reference replaces it); the caller
        keeps its freshly initialized head. Returns a new params pytree.
        """
        def to_np(v):
            return (v.detach().cpu().numpy() if hasattr(v, "detach")
                    else np.asarray(v))

        def conv(prefix):
            w = to_np(state_dict[prefix + ".weight"])
            return {"w": jnp.asarray(
                w.transpose(2, 3, 1, 0), self.dtype)}  # OIHW -> HWIO

        def bn(prefix):
            p = {"scale": jnp.asarray(to_np(state_dict[prefix + ".weight"]),
                                      self.dtype),
                 "bias": jnp.asarray(to_np(state_dict[prefix + ".bias"]),
                                     self.dtype)}
            if use_running_stats:
                p["mean"] = jnp.asarray(
                    to_np(state_dict[prefix + ".running_mean"]), self.dtype)
                p["var"] = jnp.asarray(
                    to_np(state_dict[prefix + ".running_var"]), self.dtype)
            return p

        new = dict(params)
        new["stem_conv"] = conv("conv1")
        new["stem_bn"] = bn("bn1")
        n_inner = 3 if self.bottleneck else 2
        for li, n in enumerate(self.layers):
            for bi in range(n):
                src = f"layer{li + 1}.{bi}"
                blk = dict(params[f"layer{li}_{bi}"])
                for ci in range(1, n_inner + 1):
                    blk[f"conv{ci}"] = conv(f"{src}.conv{ci}")
                    blk[f"bn{ci}"] = bn(f"{src}.bn{ci}")
                if "down_conv" in blk:
                    blk["down_conv"] = conv(f"{src}.downsample.0")
                    blk["down_bn"] = bn(f"{src}.downsample.1")
                new[f"layer{li}_{bi}"] = blk

        # shape guard: every pre-existing leaf must keep its shape
        import jax.tree_util as jtu
        for key, old_sub in params.items():
            if key == "fc":
                continue
            for path, old_leaf in jtu.tree_flatten_with_path(old_sub)[0]:
                new_leaf = new[key]
                for p in path:
                    new_leaf = new_leaf[p.key]
                if new_leaf.shape != old_leaf.shape:
                    raise ValueError(
                        f"shape mismatch at {key}{jtu.keystr(path)}: "
                        f"imported {new_leaf.shape} vs {old_leaf.shape}")
        return new

    def features(self, params: Params, x: jax.Array) -> jax.Array:
        """The trunk's pooled features ([B, 512] for resnet18) — the
        quantity the reference's frozen-encoder regime feeds its new fc
        (celeba/module/model.py:117-125). Exposed for linear-probe
        analyses of the frozen-feature ceiling (scripts/celeba_probe.py)."""
        trunk = {k: v for k, v in params.items() if k != "fc"}
        if self.freeze_trunk:
            trunk = jax.lax.stop_gradient(trunk)
        h = jax.nn.relu(_bn(trunk["stem_bn"],
                            _conv(trunk["stem_conv"], x, stride=2)))
        # maxpool 3x3/2 with torch's symmetric padding (see _conv)
        h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                  (1, 3, 3, 1), (1, 2, 2, 1),
                                  ((0, 0), (1, 1), (1, 1), (0, 0)))
        block = _bottleneck if self.bottleneck else _basic_block
        for li, n in enumerate(self.layers):
            for bi in range(n):
                stride = 2 if (li > 0 and bi == 0) else 1
                h = block(trunk[f"layer{li}_{bi}"], h, stride)
        return h.mean(axis=(1, 2))  # global average pool

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        feat = self.features(params, x)
        return feat @ params["fc"]["w"] + params["fc"]["b"]

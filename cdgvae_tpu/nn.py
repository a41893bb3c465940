"""Minimal functional NN core.

Parameters are plain pytrees (nested dicts of jnp arrays); every layer is an
``init(key, ...) -> params`` plus a pure ``apply(params, x) -> y`` function, so
models compose freely under ``jax.jit`` / ``jax.vmap`` / ``shard_map`` without
any framework object graph. Weight init matches torch ``nn.Linear`` defaults
(uniform ±1/sqrt(fan_in) for both weight and bias) so training dynamics are
comparable to the reference at equal hyperparameters
(reference: modules/model.py uses default-initialised nn.Linear stacks).
"""
from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

Params = dict
default_dtype = jnp.float32


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------

def dense_init(key: jax.Array, in_dim: int, out_dim: int,
               dtype=default_dtype) -> Params:
    """torch nn.Linear-compatible init: U(-1/sqrt(in), 1/sqrt(in)) for w and b."""
    bound = 1.0 / math.sqrt(in_dim)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -bound, bound),
    }


def dense(params: Params, x: jax.Array) -> jax.Array:
    return x @ params["w"] + params["b"]


# ---------------------------------------------------------------------------
# MLP
# ---------------------------------------------------------------------------

def mlp_init(key: jax.Array, sizes: Sequence[int], dtype=default_dtype) -> Params:
    """Stack of Dense layers; sizes = [in, h1, ..., out]."""
    keys = jax.random.split(key, len(sizes) - 1)
    return {
        f"layer{i}": dense_init(k, sizes[i], sizes[i + 1], dtype)
        for i, k in enumerate(keys)
    }


def mlp(params: Params, x: jax.Array,
        activation: Callable = jax.nn.elu,
        final_activation: Callable | None = None) -> jax.Array:
    n = len(params)
    for i in range(n):
        x = dense(params[f"layer{i}"], x)
        if i < n - 1:
            x = activation(x)
    if final_activation is not None:
        x = final_activation(x)
    return x


# ---------------------------------------------------------------------------
# Stacked (grouped) MLP — K independent MLPs evaluated as ONE batched matmul.
#
# The reference evaluates its K per-factor GAM decoders with a Python loop of
# separate nn.Sequential modules (modules/model.py:284). On TPU we instead
# stack the K parameter sets along a leading axis and evaluate all decoders
# with a single [K,B,i] @ [K,i,o] batched matmul that tiles onto the MXU.
# ---------------------------------------------------------------------------

def stacked_dense_init(key: jax.Array, k: int, in_dim: int, out_dim: int,
                       dtype=default_dtype) -> Params:
    bound = 1.0 / math.sqrt(in_dim)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (k, in_dim, out_dim), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (k, 1, out_dim), dtype, -bound, bound),
    }


def stacked_dense(params: Params, x: jax.Array) -> jax.Array:
    """x: [K, B, in] -> [K, B, out] via one batched matmul."""
    return jax.lax.dot_general(
        x, params["w"],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=x.dtype,
    ) + params["b"]


def stacked_mlp_init(key: jax.Array, k: int, sizes: Sequence[int],
                     dtype=default_dtype) -> Params:
    keys = jax.random.split(key, len(sizes) - 1)
    return {
        f"layer{i}": stacked_dense_init(kk, k, sizes[i], sizes[i + 1], dtype)
        for i, kk in enumerate(keys)
    }


def stacked_mlp(params: Params, x: jax.Array,
                activation: Callable = jax.nn.elu) -> jax.Array:
    n = len(params)
    for i in range(n):
        x = stacked_dense(params[f"layer{i}"], x)
        if i < n - 1:
            x = activation(x)
    return x


# ---------------------------------------------------------------------------
# Conv (NHWC, TPU-native layout) — used by the CelebA family.
# ---------------------------------------------------------------------------

def conv_init(key: jax.Array, in_ch: int, out_ch: int, kernel: int,
              dtype=default_dtype) -> Params:
    fan_in = in_ch * kernel * kernel
    bound = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (kernel, kernel, in_ch, out_ch), dtype,
                                -bound, bound),
        "b": jax.random.uniform(kb, (out_ch,), dtype, -bound, bound),
    }


def conv2d(params: Params, x: jax.Array, stride: int = 1,
           padding: str | Sequence = "SAME") -> jax.Array:
    """x: [B, H, W, C] NHWC; weights HWIO — the native TPU conv layout."""
    y = jax.lax.conv_general_dilated(
        x, params["w"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + params["b"]


def bn_init(ch, dtype=default_dtype) -> Params:
    return {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}


def batchnorm(x: jax.Array, scale, bias, eps: float = 1e-5) -> jax.Array:
    """Batch-statistics BatchNorm over NHWC (mean/var across N,H,W).

    Single shared implementation for the ResNet encoder and the SAGAN
    generators (documented deviation from torch's running stats —
    models/sagan.py module docstring).
    """
    mean = x.mean(axis=(0, 1, 2), keepdims=True)
    var = x.var(axis=(0, 1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def count_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))

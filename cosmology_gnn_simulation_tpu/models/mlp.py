"""MLP building blocks as pure functions over param pytrees.

Mirrors the reference's ``build_mlp`` architecture
(``/root/reference/graph_network.py:15-32``): ``num_hidden_layers`` x
(Linear -> ReLU) followed by a final Linear, optionally wrapped in LayerNorm
(encoder/processor variants, ``graph_network.py:133-135``; decoders have no
LayerNorm, ``:151-152``).

Initialization follows torch's ``nn.Linear`` default (uniform
±1/sqrt(fan_in) for both weight and bias) so weight-scale statistics match
the reference at init.

Mixed precision: ``dtype=jnp.bfloat16`` casts matmul operands to bf16 while
accumulating in fp32 on the MXU (``preferred_element_type``); LayerNorm and
residual streams stay fp32.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

LN_EPS = 1e-5  # torch.nn.LayerNorm default


def _init_linear(key: jax.Array, in_dim: int, out_dim: int) -> Params:
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
    wk, bk = jax.random.split(key)
    return {
        "w": jax.random.uniform(wk, (in_dim, out_dim), jnp.float32, -bound, bound),
        "b": jax.random.uniform(bk, (out_dim,), jnp.float32, -bound, bound),
    }


def init_mlp(
    key: jax.Array,
    in_dim: int,
    hidden_dim: int,
    num_hidden_layers: int,
    out_dim: int,
    layer_norm: bool = False,
) -> Params:
    dims = [in_dim] + [hidden_dim] * num_hidden_layers + [out_dim]
    keys = jax.random.split(key, len(dims) - 1)
    layers = tuple(
        _init_linear(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)
    )
    params: Params = {"layers": layers}
    if layer_norm:
        params["ln"] = {
            "scale": jnp.ones((out_dim,), jnp.float32),
            "bias": jnp.zeros((out_dim,), jnp.float32),
        }
    return params


def dense(
    x: jnp.ndarray, layer: Params, dtype: Optional[jnp.dtype] = None
) -> jnp.ndarray:
    """``x @ w + b`` with optional low-precision operands, fp32 accumulation."""
    w, b = layer["w"], layer["b"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + b


def layer_norm(x: jnp.ndarray, ln: Params) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + LN_EPS)
    return normed * ln["scale"] + ln["bias"]


def apply_mlp(
    params: Params, x: jnp.ndarray, dtype: Optional[jnp.dtype] = None
) -> jnp.ndarray:
    layers = params["layers"]
    for layer in layers[:-1]:
        x = jax.nn.relu(dense(x, layer, dtype))
    x = dense(x, layers[-1], dtype)
    if "ln" in params:
        x = layer_norm(x, params["ln"])
    return x

"""Small MLP blocks as explicit param pytrees + pure apply functions.

Covers both reference MLP flavors:
  * tcnn FullyFusedMLP (bias-free, ReLU; reference ngp.py:351-357) —
    `mlp_init(..., bias=False)`;
  * BasicDecoder (nn.Linear stack with bias, optional skips; reference
    ngp.py:35-143, field.py:17-126) — `mlp_init(..., bias=True)`.

Matmuls run through `preferred_element_type=float32` with an optional
bf16 compute dtype so they tile onto the MXU.
"""
from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _linear_init(key, fan_in, fan_out, bias: bool):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(-b, b)
    with b = 1/sqrt(fan_in), same bound for the bias."""
    bound = 1.0 / math.sqrt(fan_in)
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(
        wkey, (fan_in, fan_out), minval=-bound, maxval=bound,
        dtype=jnp.float32,
    )
    layer = {"w": w}
    if bias:
        layer["b"] = jax.random.uniform(
            bkey, (fan_out,), minval=-bound, maxval=bound, dtype=jnp.float32
        )
    return layer


def mlp_init(
    key,
    input_dim: int,
    output_dim: int,
    hidden_dim: int = 64,
    num_hidden_layers: int = 1,
    bias: bool = True,
    skip: Sequence[int] = (),
    bias_last: bool = True,
):
    """Build params for: num_hidden_layers hidden Dense layers + output.

    Layer i with i in `skip` (i > 0) takes [input, h] concatenated,
    mirroring BasicDecoder's skip wiring (reference ngp.py:78-90).
    """
    keys = jax.random.split(key, num_hidden_layers + 1)
    layers = []
    for i in range(num_hidden_layers):
        if i == 0:
            fan_in = input_dim
        elif i in skip:
            fan_in = hidden_dim + input_dim
        else:
            fan_in = hidden_dim
        layers.append(_linear_init(keys[i], fan_in, hidden_dim, bias))
    layers.append(
        _linear_init(keys[-1], hidden_dim, output_dim, bias and bias_last)
    )
    return {"layers": layers}


def _dense(layer, x, compute_dtype):
    w = layer["w"].astype(compute_dtype)
    y = jnp.dot(
        x.astype(compute_dtype), w, preferred_element_type=jnp.float32
    )
    if "b" in layer:
        y = y + layer["b"]
    return y


def mlp_apply(
    params,
    x,
    activation: Callable = jax.nn.relu,
    skip: Sequence[int] = (),
    compute_dtype=jnp.bfloat16,
    return_h: bool = False,
):
    """Apply the MLP; hidden activations after every hidden layer, linear
    output (reference BasicDecoder.forward, ngp.py:93-121)."""
    layers = params["layers"]
    h = x
    for i, layer in enumerate(layers[:-1]):
        if i > 0 and i in skip:
            h = jnp.concatenate([x, h], axis=-1)
        h = activation(_dense(layer, h, compute_dtype))
    out = _dense(layers[-1], h, compute_dtype)
    if return_h:
        return out, h
    return out

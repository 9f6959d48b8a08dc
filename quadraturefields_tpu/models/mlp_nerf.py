"""Vanilla positional-encoding NeRF MLPs (+ time-warped T-NeRF).

Capability parity with reference examples/radiance_fields/mlp.py
(VanillaNeRFRadianceField, TNeRFRadianceField, SinusoidalEncoder) —
unused by the shipped pipeline scripts but part of the model family.
Pure-function + params-pytree style; xavier-uniform hidden init like
the reference, matmuls with fp32 accumulation.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp


def sinusoidal_encode(x, min_deg: int, max_deg: int,
                      use_identity: bool = True):
    """Reference SinusoidalEncoder (mlp.py:168-203)."""
    if max_deg == min_deg:
        return x
    scales = jnp.asarray([2.0**i for i in range(min_deg, max_deg)])
    xb = (x[..., None, :] * scales[:, None]).reshape(
        x.shape[:-1] + ((max_deg - min_deg) * x.shape[-1],)
    )
    latent = jnp.sin(jnp.concatenate([xb, xb + 0.5 * math.pi], axis=-1))
    if use_identity:
        latent = jnp.concatenate([x, latent], axis=-1)
    return latent


def sinusoidal_dim(x_dim: int, min_deg: int, max_deg: int,
                   use_identity: bool = True) -> int:
    return (int(use_identity) + (max_deg - min_deg) * 2) * x_dim


def _xavier_linear(key, fan_in, fan_out, out_uniform_b: float | None = None):
    if out_uniform_b is not None:
        w = jax.random.uniform(
            key, (fan_in, fan_out), minval=0.0, maxval=out_uniform_b
        )
    else:
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        w = jax.random.uniform(
            key, (fan_in, fan_out), minval=-bound, maxval=bound
        )
    return {"w": w.astype(jnp.float32),
            "b": jnp.zeros((fan_out,), jnp.float32)}


def _mlp_init(key, input_dim, output_dim, net_depth, net_width,
              skip_layer, out_uniform_b=None):
    keys = jax.random.split(key, net_depth + 1)
    layers = []
    in_features = input_dim
    for i in range(net_depth):
        layers.append(_xavier_linear(keys[i], in_features, net_width))
        if skip_layer is not None and i % skip_layer == 0 and i > 0:
            in_features = net_width + input_dim
        else:
            in_features = net_width
    out = None
    if output_dim is not None:
        out = _xavier_linear(keys[-1], in_features, output_dim,
                             out_uniform_b)
    return {"hidden": layers, "out": out}


def _mlp_apply(params, x, skip_layer):
    inputs = x
    for i, layer in enumerate(params["hidden"]):
        x = jax.nn.relu(
            jnp.dot(x, layer["w"], preferred_element_type=jnp.float32)
            + layer["b"]
        )
        if skip_layer is not None and i % skip_layer == 0 and i > 0:
            x = jnp.concatenate([x, inputs], axis=-1)
    if params["out"] is not None:
        x = jnp.dot(
            x, params["out"]["w"], preferred_element_type=jnp.float32
        ) + params["out"]["b"]
    return x


@dataclasses.dataclass(frozen=True)
class VanillaNeRFConfig:
    net_depth: int = 8
    net_width: int = 256
    skip_layer: int = 4
    net_depth_condition: int = 1
    net_width_condition: int = 128
    max_freq: int = 4  # position encoding degrees

    @property
    def pos_dim(self):
        return sinusoidal_dim(3, 0, self.max_freq)

    @property
    def view_dim(self):
        return sinusoidal_dim(3, 0, 4)


def vanilla_nerf_init(key, cfg: VanillaNeRFConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    base = _mlp_init(k1, cfg.pos_dim, None, cfg.net_depth, cfg.net_width,
                     cfg.skip_layer)
    # base output width: net_width (+input if last layer followed a skip)
    last_skip = (
        cfg.skip_layer is not None
        and (cfg.net_depth - 1) % cfg.skip_layer == 0
        and cfg.net_depth - 1 > 0
    )
    hidden_features = cfg.net_width + (cfg.pos_dim if last_skip else 0)
    return {
        "base": base,
        "sigma": _xavier_linear(k2, hidden_features, 1),
        "bottleneck": _xavier_linear(k3, hidden_features, cfg.net_width),
        "rgb": _mlp_init(
            k4, cfg.net_width + cfg.view_dim, 3,
            cfg.net_depth_condition, cfg.net_width_condition, None,
        ),
    }


def vanilla_nerf_query_density(params, x, cfg: VanillaNeRFConfig):
    h = _mlp_apply(params["base"], sinusoidal_encode(x, 0, cfg.max_freq),
                   cfg.skip_layer)
    raw = jnp.dot(h, params["sigma"]["w"]) + params["sigma"]["b"]
    return jax.nn.relu(raw)


def vanilla_nerf_forward(params, x, condition, cfg: VanillaNeRFConfig):
    h = _mlp_apply(params["base"], sinusoidal_encode(x, 0, cfg.max_freq),
                   cfg.skip_layer)
    raw_sigma = jnp.dot(h, params["sigma"]["w"]) + params["sigma"]["b"]
    bottleneck = jnp.dot(
        h, params["bottleneck"]["w"]
    ) + params["bottleneck"]["b"]
    cond = sinusoidal_encode(condition, 0, 4)
    raw_rgb = _mlp_apply(
        params["rgb"], jnp.concatenate([bottleneck, cond], axis=-1), None
    )
    return jax.nn.sigmoid(raw_rgb), jax.nn.relu(raw_sigma)


@dataclasses.dataclass(frozen=True)
class TNeRFConfig:
    nerf: VanillaNeRFConfig = VanillaNeRFConfig()

    @property
    def warp_in_dim(self):
        return sinusoidal_dim(3, 0, 4) + sinusoidal_dim(1, 0, 4)


def tnerf_init(key, cfg: TNeRFConfig):
    k1, k2 = jax.random.split(key)
    return {
        "warp": _mlp_init(k1, cfg.warp_in_dim, 3, 4, 64, 2,
                          out_uniform_b=1e-4),
        "nerf": vanilla_nerf_init(k2, cfg.nerf),
    }


def tnerf_warp(params, x, t, cfg: TNeRFConfig):
    """Time-conditioned warp field (mlp.py:274-285)."""
    enc = jnp.concatenate(
        [sinusoidal_encode(x, 0, 4), sinusoidal_encode(t, 0, 4)], axis=-1
    )
    return x + _mlp_apply(params["warp"], enc, 2)


def tnerf_query_density(params, x, t, cfg: TNeRFConfig):
    return vanilla_nerf_query_density(
        params["nerf"], tnerf_warp(params, x, t, cfg), cfg.nerf
    )


def tnerf_forward(params, x, t, condition, cfg: TNeRFConfig):
    return vanilla_nerf_forward(
        params["nerf"], tnerf_warp(params, x, t, cfg), condition, cfg.nerf
    )

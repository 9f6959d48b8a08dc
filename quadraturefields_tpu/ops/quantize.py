"""uint8 feature codecs for texture baking — exact formula parity with
the reference (ngp.py:210-281, utils.py:54-63, texture_utils.py:51-98).
All functions are numpy/jax-agnostic elementwise math (jnp in, jnp out)
so they run on device inside the baked render path.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# ---- sigma <-> alpha (texture_utils.py:51-65) ----
def compress_sigma(sigma):
    alpha = 1.0 - jnp.exp(-sigma * 0.005)
    return jnp.clip(alpha * 255.0, 0, 255).astype(jnp.uint8)


def inverse_of_compressed_sigma(alpha_u8):
    a = alpha_u8.astype(jnp.float32) / 255.0
    return -jnp.log(jnp.clip(1.0 - a, min=1e-6)) / 0.005


# ---- colors (ngp.py:264-281) ----
def compress_colors(colors, thres: float = 12.0,
                    compress_type: str = "sigma"):
    if compress_type == "sigma":  # 'sigmoid' compression
        c = jnp.asarray(1.0 / (1.0 + jnp.exp(-colors)))
    else:
        c = jnp.clip(colors, -thres, thres)
        c = (c + thres) / (2.0 * thres)
    return (c * 255.0).astype(jnp.uint8)


def inverse_of_compressed_colors(colors_u8, thres: float = 12.0,
                                 compress_type: str = "sigma"):
    c = colors_u8.astype(jnp.float32) / 255.0
    if compress_type == "sigma":
        return jnp.log(jnp.clip(c / (1.0 - c), 1e-8, 1e37))
    return c * 2.0 * thres - thres


# ---- lobe axis via polar angles (ngp.py:239-252) ----
def compress_polar_coordinates(vectors):
    v = vectors / (jnp.linalg.norm(vectors, axis=-1, keepdims=True) + 1e-6)
    azimuth = (
        jnp.arctan2(v[..., 1], v[..., 0]) * 128.0 / np.pi + 128.0
    ).astype(jnp.uint8)
    elevation = (jnp.arccos(v[..., 2]) * 256.0 / np.pi).astype(jnp.uint8)
    return azimuth, elevation


def inverse_of_azimuth_and_elevation(azimuth_u8, elevation_u8):
    azimuth = (azimuth_u8.astype(jnp.float32) - 128.0) / 128.0 * np.pi
    elevation = elevation_u8.astype(jnp.float32) / 256.0 * np.pi
    x = jnp.cos(azimuth) * jnp.sin(elevation)
    y = jnp.sin(azimuth) * jnp.sin(elevation)
    z = jnp.cos(elevation)
    return jnp.stack([x, y, z], axis=-1)


# ---- lobe sharpness lambda (ngp.py:254-262) ----
def compress_lambda(lambdas, compress_threshold: float = 7.5):
    log_l = jnp.log(jnp.clip(lambdas, min=1e-5))
    c = jnp.clip((log_l + 2.5) / compress_threshold, 0.0, 1.0)
    return (255.0 * c).astype(jnp.uint8)


def inverse_of_compressed_lambda(c_u8, compress_threshold: float = 7.5):
    log_l = c_u8.astype(jnp.float32) * compress_threshold / 255.0 - 2.5
    return jnp.exp(log_l)


# ---- axis as plain uint8 (ngp.py:210-217, used by discretize path) ----
def discretize_axis(axis):
    return ((axis + 1.0) * 255.0 / 2.0).astype(jnp.uint8)


def continuous_axis(axis_u8):
    return axis_u8.astype(jnp.float32) / 255.0 * 2.0 - 1.0

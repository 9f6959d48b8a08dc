"""uint8 feature codecs for texture baking — exact formula parity with
the reference (ngp.py:210-281, utils.py:54-63, texture_utils.py:51-98).

Backend-dispatching elementwise math: numpy inputs stay numpy (host
baking writes millions of texels; routing them through the remote
device costs minutes in transfers), jax inputs stay jax (the decode
side runs jitted on device inside the baked render path).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _xp(a):
    return np if isinstance(a, np.ndarray) else jnp


# ---- sigma <-> alpha (texture_utils.py:51-65) ----
def compress_sigma(sigma):
    xp = _xp(sigma)
    alpha = 1.0 - xp.exp(-sigma * 0.005)
    return xp.clip(alpha * 255.0, 0, 255).astype(np.uint8)


def inverse_of_compressed_sigma(alpha_u8):
    xp = _xp(alpha_u8)
    a = alpha_u8.astype(np.float32) / 255.0
    return -xp.log(xp.clip(1.0 - a, 1e-6, None)) / 0.005


# ---- colors (ngp.py:264-281) ----
def compress_colors(colors, thres: float = 12.0,
                    compress_type: str = "sigma"):
    xp = _xp(colors)
    if compress_type == "sigma":  # 'sigmoid' compression
        c = 1.0 / (1.0 + xp.exp(-colors))
    else:
        c = xp.clip(colors, -thres, thres)
        c = (c + thres) / (2.0 * thres)
    return (c * 255.0).astype(np.uint8)


def inverse_of_compressed_colors(colors_u8, thres: float = 12.0,
                                 compress_type: str = "sigma"):
    xp = _xp(colors_u8)
    c = colors_u8.astype(np.float32) / 255.0
    if compress_type == "sigma":
        return xp.log(xp.clip(c / (1.0 - c), 1e-8, 1e37))
    return c * 2.0 * thres - thres


# ---- lobe axis via polar angles (ngp.py:239-252) ----
def compress_polar_coordinates(vectors):
    xp = _xp(vectors)
    v = vectors / (
        xp.linalg.norm(vectors, axis=-1, keepdims=True) + 1e-6
    )
    azimuth = (
        xp.arctan2(v[..., 1], v[..., 0]) * 128.0 / np.pi + 128.0
    ).astype(np.uint8)
    elevation = (xp.arccos(v[..., 2]) * 256.0 / np.pi).astype(np.uint8)
    return azimuth, elevation


def inverse_of_azimuth_and_elevation(azimuth_u8, elevation_u8):
    xp = _xp(azimuth_u8)
    azimuth = (azimuth_u8.astype(np.float32) - 128.0) / 128.0 * np.pi
    elevation = elevation_u8.astype(np.float32) / 256.0 * np.pi
    x = xp.cos(azimuth) * xp.sin(elevation)
    y = xp.sin(azimuth) * xp.sin(elevation)
    z = xp.cos(elevation)
    return xp.stack([x, y, z], axis=-1)


# ---- lobe sharpness lambda (ngp.py:254-262) ----
def compress_lambda(lambdas, compress_threshold: float = 7.5):
    xp = _xp(lambdas)
    log_l = xp.log(xp.clip(lambdas, 1e-5, None))
    c = xp.clip((log_l + 2.5) / compress_threshold, 0.0, 1.0)
    return (255.0 * c).astype(np.uint8)


def inverse_of_compressed_lambda(c_u8, compress_threshold: float = 7.5):
    xp = _xp(c_u8)
    log_l = c_u8.astype(np.float32) * compress_threshold / 255.0 - 2.5
    return xp.exp(log_l)


# ---- axis as plain uint8 (ngp.py:210-217, used by discretize path) ----
def discretize_axis(axis):
    return ((axis + 1.0) * 255.0 / 2.0).astype(np.uint8)


def continuous_axis(axis_u8):
    return axis_u8.astype(np.float32) / 255.0 * 2.0 - 1.0

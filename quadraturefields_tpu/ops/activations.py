"""Activation / coordinate-contraction primitives.

Semantics match the reference's custom autograd functions
(reference: examples/radiance_fields/ngp.py:146-207), rebuilt as JAX
custom-VJP functions so they jit/fuse cleanly on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    """exp(x) with a truncated backward: grad = g * exp(clamp(x, max=15)).

    Reference: examples/radiance_fields/ngp.py:146-159 (_TruncExp).
    """
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, max=15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def density_activation(x):
    """Default NGP density activation: trunc_exp(x - 1).

    Reference: examples/radiance_fields/ngp.py:292 (density_activation kwarg).
    """
    return trunc_exp(x - 1.0)


@jax.custom_vjp
def contract_to_unisphere(x, aabb):
    """mip-NeRF-360-style scene contraction onto [0, 1]^3.

    Maps aabb to [-1,1]^3, contracts |x|>1 to the 2-sphere shell, then
    rescales to [0,1]. Backward uses the reference's radial-derivative
    approximation clamped to >=1e-6.
    Reference: examples/radiance_fields/ngp.py:161-188.
    """
    y, _ = _contract_fwd_impl(x, aabb)
    return y


def _contract_fwd_impl(x, aabb):
    aabb_min, aabb_max = aabb[..., :3], aabb[..., 3:]
    x = (x - aabb_min) / (aabb_max - aabb_min)
    x = x * 2.0 - 1.0
    mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
    mask = mag[..., 0] > 1.0
    x_contracted = jnp.where(
        mask[..., None], (2.0 - 1.0 / mag) * (x / mag), x
    )
    y = x_contracted / 4.0 + 0.5
    return y, (x, mag, mask)


def _contract_fwd(x, aabb):
    y, res = _contract_fwd_impl(x, aabb)
    return y, res


def _contract_bwd(res, g):
    x, mag, mask = res
    dev = (2.0 * mag - 1.0) / mag**2 + 2.0 * x**2 * (
        1.0 / mag**3 - (2.0 * mag - 1.0) / mag**4
    )
    dev = jnp.where(mask[..., None], dev, 1.0)
    dev = jnp.clip(dev, min=1e-6)
    return g * dev, None


contract_to_unisphere.defvjp(_contract_fwd, _contract_bwd)


def inverse_contraction(x, aabb):
    """Inverse of contract_to_unisphere; input in [0,1], also returns an
    invalid-mask for points outside the contractible shell (mag > 2).

    Reference: examples/radiance_fields/ngp.py:193-207.
    """
    aabb_min, aabb_max = aabb[..., :3], aabb[..., 3:]
    x = (x - 0.5) * 4.0
    mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
    mask = mag[..., 0] > 1.0
    invalid = mag > 2.0
    x = jnp.where(mask[..., None], 1.0 / (2.0 - mag) * x / mag, x)
    x = (x + 1.0) / 2.0
    x = x * (aabb_max - aabb_min) + aabb_min
    return x, invalid


def normalize_aabb(x, aabb):
    """Map world coords to [0,1]^3 via the axis-aligned bounding box; also
    return the in-box selector. Reference: ngp.py:395-402 (normalize)."""
    aabb_min, aabb_max = aabb[..., :3], aabb[..., 3:]
    y = (x - aabb_min) / (aabb_max - aabb_min)
    selector = jnp.all((y > 0.0) & (y < 1.0), axis=-1)
    return selector, y


def inv_contract_from_unisphere(y, aabb):
    """Inverse of contract_to_unisphere: [0,1]^3 -> world coordinates.

    Used by the unbounded occupancy-grid update to place contracted
    grid cells back into world space for density evaluation (the
    reference reaches the same effect through nerfacc's multi-level
    estimator aabbs, train_ngp_nerf_sg_occ.py:174-229).
    """
    aabb_min, aabb_max = aabb[..., :3], aabb[..., 3:]
    xc = (y - 0.5) * 4.0
    m_c = jnp.linalg.norm(xc, axis=-1, keepdims=True)
    # |xc| = 2 - 1/m  =>  m = 1/(2 - |xc|)  for the contracted shell
    m_c_safe = jnp.clip(m_c, 1e-6, 2.0 - 1e-6)
    m = 1.0 / (2.0 - m_c_safe)
    x_norm = jnp.where(m_c > 1.0, xc / m_c_safe * m, xc)
    x01 = (x_norm + 1.0) / 2.0
    return aabb_min + x01 * (aabb_max - aabb_min)

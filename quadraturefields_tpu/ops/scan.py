"""Packed volume-rendering math as segmented associative scans.

The reference uses CUDA segmented scans over variable-length packed sample
streams (nerfacc `exclusive_sum`/`exclusive_prod`, kaolin
`exponential_integration`; see reference examples/field_rendering.py and
examples/utils.py:863-898). Here the packed layout is kept — a flat,
ray-sorted sample buffer — but with a *static* length: padding samples
carry `ray_index == n_rays` (a sentinel segment) and sigma == 0, so they
are exact no-ops. Scans run as `jax.lax.associative_scan` with a
segment-reset combinator, which XLA compiles to a work-efficient scan on
the VPU; per-ray reductions are `jax.ops.segment_sum` (sorted).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mark_pack_boundaries(ray_indices):
    """True at the first sample of each ray segment.

    Equivalent of kaolin spc_render.mark_pack_boundaries
    (used at reference examples/mesh_utils.py:407, utils.py:709).
    """
    first = jnp.ones((1,), dtype=bool)
    rest = ray_indices[1:] != ray_indices[:-1]
    return jnp.concatenate([first, rest])


def _seg_combine_sum(a, b):
    fa, va = a
    fb, vb = b
    return fa | fb, vb + jnp.where(fb, jnp.zeros_like(va), va)


def _seg_combine_prod(a, b):
    fa, va = a
    fb, vb = b
    return fa | fb, vb * jnp.where(fb, jnp.ones_like(va), va)


def inclusive_sum(x, boundaries):
    """Segmented inclusive sum over a flat ray-sorted buffer."""
    _, inc = jax.lax.associative_scan(_seg_combine_sum, (boundaries, x))
    return inc


def exclusive_sum(x, boundaries):
    """Segmented exclusive sum (nerfacc.scan.exclusive_sum equivalent,
    reference field_rendering.py:11,261)."""
    return inclusive_sum(x, boundaries) - x


def exclusive_prod(x, boundaries):
    """Segmented exclusive product (nerfacc.scan.exclusive_prod,
    reference field_rendering.py:203). Computed as a shifted inclusive
    product with per-segment reset — exact at x == 0, unlike the
    divide-by-self trick."""
    _, inc = jax.lax.associative_scan(_seg_combine_prod, (boundaries, x))
    shifted = jnp.concatenate([jnp.ones_like(inc[:1]), inc[:-1]])
    return jnp.where(boundaries, jnp.ones_like(x), shifted)


def render_transmittance_from_alpha(alphas, boundaries):
    """T_i = prod_{j<i} (1 - alpha_j) within each ray segment.

    Reference: field_rendering.py:161-206.
    """
    return exclusive_prod(1.0 - alphas, boundaries)


def render_transmittance_from_density(t_starts, t_ends, sigmas, boundaries):
    """T_i = exp(-sum_{j<i} sigma_j * dt_j); alphas = 1 - exp(-sigma*dt).

    Reference: field_rendering.py:209-264.
    """
    sigmas_dt = sigmas * (t_ends - t_starts)
    alphas = 1.0 - jnp.exp(-sigmas_dt)
    trans = jnp.exp(-exclusive_sum(sigmas_dt, boundaries))
    return trans, alphas


def render_weight_from_alpha(alphas, boundaries):
    """w_i = T_i * alpha_i. Reference: field_rendering.py:267-309."""
    trans = render_transmittance_from_alpha(alphas, boundaries)
    return trans * alphas, trans


def render_weight_from_density(t_starts, t_ends, sigmas, boundaries):
    """w_i = T_i * (1 - exp(-sigma_i dt_i)).

    Reference: field_rendering.py:312-362.
    """
    trans, alphas = render_transmittance_from_density(
        t_starts, t_ends, sigmas, boundaries
    )
    return trans * alphas, trans, alphas


def render_visibility_from_density(
    t_starts, t_ends, sigmas, boundaries, early_stop_eps=1e-4, alpha_thre=0.0
):
    """Visible iff trans >= early_stop_eps and alpha >= alpha_thre.

    Reference: field_rendering.py:421-480.
    """
    trans, alphas = render_transmittance_from_density(
        t_starts, t_ends, sigmas, boundaries
    )
    vis = trans >= early_stop_eps
    if alpha_thre > 0:
        vis = vis & (alphas >= alpha_thre)
    return vis


def accumulate_along_rays(weights, ray_indices, values=None, n_rays=None):
    """Per-ray segment sum of weighted values.

    Padding samples must carry ray_index == n_rays; they land in a
    sentinel row that is dropped. Reference: field_rendering.py:483-547.
    """
    if values is None:
        src = weights[..., None]
    else:
        src = weights[..., None] * values
    out = jax.ops.segment_sum(
        src, ray_indices, num_segments=n_rays + 1, indices_are_sorted=True
    )
    return out[:-1]


def reverse_weights(t_starts, t_ends, sigmas, ray_indices, n_rays, valid):
    """Rendering weights of each sample when its ray is traversed back to
    front. The reference implements this by flipping the flat packed
    tensors and re-running the transmittance scan
    (field_rendering.py:719-731); flipping a ray-sorted buffer keeps
    samples of the same ray contiguous (in reversed order), so the same
    segmented scan applies. Padding (valid == False) is masked to sigma=0
    before flipping so it stays a no-op.
    """
    sigmas = jnp.where(valid, sigmas, 0.0)
    max_val = jnp.max(t_starts) + jnp.max(t_ends)
    ts_f = jnp.flip(max_val - t_starts)
    te_f = jnp.flip(max_val - t_ends)
    sig_f = jnp.flip(sigmas)
    idx_f = jnp.flip(ray_indices)
    bound_f = mark_pack_boundaries(idx_f)
    w_rev, _, _ = render_weight_from_density(te_f, ts_f, sig_f, bound_f)
    return jnp.flip(w_rev)


def derive_properties(
    rgbs,
    sigmas,
    depths,
    deltas,
    ray_indices,
    n_rays,
    bg_color="white",
    render_bkgd=None,
):
    """Per-ray color/alpha/depth from packed quadrature samples.

    TPU-native equivalent of reference examples/utils.py:863-898, which
    routes through kaolin spc_render.exponential_integration/sum_reduce.
    Depth is the weight-normalized expectation (matching kaolin's
    normalized integration); color composition follows the reference's
    white/black/random background branches.

    Returns (rgb[n_rays,3], alpha[n_rays,1], depth[n_rays,1],
    weights[samples]).
    """
    boundaries = mark_pack_boundaries(ray_indices)
    tau = sigmas * deltas
    alphas = 1.0 - jnp.exp(-tau)
    trans = jnp.exp(-exclusive_sum(tau, boundaries))
    weights = trans * alphas

    alpha = accumulate_along_rays(weights, ray_indices, None, n_rays)
    color_sum = accumulate_along_rays(weights, ray_indices, rgbs, n_rays)
    depth_sum = accumulate_along_rays(
        weights, ray_indices, depths[..., None], n_rays
    )
    denom = jnp.clip(alpha, min=1e-10)
    depth = depth_sum / denom

    if bg_color == "white":
        rgb = (1.0 - alpha) + color_sum
    elif bg_color == "black":
        rgb = color_sum
    else:
        rgb = color_sum + (1.0 - alpha) * render_bkgd
    return rgb, alpha, depth, weights

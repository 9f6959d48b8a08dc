"""Baked-texture rendering — the real-time path benchmarked by stage 6.

Reference: render_image_bake_texture_images_with_occgrid
(utils.py:999-1095). Per hit: barycentric coords in the atlas mesh ->
UV texel -> uint8 texture fetch -> feature decode -> SG color (no MLP)
-> quadrature composite. Everything runs on device in one jitted call;
the reference's CPU trimesh barycentric + chunked texel decode round
trips disappear.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.ngp import NGPConfig, ngp_features_to_rgb
from .quadrature import HitRows, row_composite


def barycentric_coordinates(points, tri_verts):
    """points [..., 3], tri_verts [..., 3, 3] -> [..., 3] barycentric
    (closed-form 2x2 normal-equation solve; replaces trimesh
    points_to_barycentric at utils.py:1057)."""
    a = tri_verts[..., 0, :]
    e1 = tri_verts[..., 1, :] - a
    e2 = tri_verts[..., 2, :] - a
    p = points - a
    d11 = jnp.sum(e1 * e1, -1)
    d12 = jnp.sum(e1 * e2, -1)
    d22 = jnp.sum(e2 * e2, -1)
    p1 = jnp.sum(p * e1, -1)
    p2 = jnp.sum(p * e2, -1)
    det = d11 * d22 - d12 * d12
    det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    v = (d22 * p1 - d12 * p2) / det
    w = (d11 * p2 - d12 * p1) / det
    u = 1.0 - v - w
    return jnp.stack([u, v, w], axis=-1)


def hit_uv_texels(points, tri_verts, tri_uv, texture_size: int):
    """Barycentric-interpolated UV -> integer texel (row, col), matching
    the reference's clamp+renormalize+floor (utils.py:1057-1063)."""
    b = barycentric_coordinates(points, tri_verts)
    b = jnp.clip(b, 0.0, 1.0)
    b = b / jnp.sum(b, axis=-1, keepdims=True)
    uv = jnp.sum(tri_uv * b[..., None], axis=-2)
    return jnp.clip(
        jnp.floor(uv).astype(jnp.int32), 0, texture_size - 1
    )


def render_baked_raw_rows(
    hits: HitRows,
    origins,
    viewdirs,
    face_vertices,
    face_uv,
    texture,        # [T, T, D+1] raw float features (last = sigma)
    sg_cfg: NGPConfig,
    *,
    render_step_size: float,
    bg_color: str = "white",
    render_bkgd=None,
):
    """Raw (uncompressed) float-texture variant — the reference's
    render_image_bake_with_occgrid (utils.py:900-996), which fetches a
    float feature texture directly instead of uint8 PNG maps."""
    R, H = hits.ts.shape
    xyzs = origins[:, None, :] + viewdirs[:, None, :] * hits.ts[..., None]
    dirs = jnp.broadcast_to(viewdirs[:, None, :], (R, H, 3))
    texels = hit_uv_texels(xyzs, face_vertices, face_uv, texture.shape[0])
    tex = texture[texels[..., 0].reshape(-1), texels[..., 1].reshape(-1)]
    sigmas = tex[:, -1].reshape(R, H)
    rgbs = ngp_features_to_rgb(
        tex[:, :-1], dirs.reshape(-1, 3), sg_cfg
    ).reshape(R, H, 3)
    deltas = jnp.full_like(sigmas, render_step_size)
    return row_composite(
        rgbs, sigmas, hits.ts, deltas, hits.valid, bg_color, render_bkgd
    )


def render_baked_rows(
    hits: HitRows,
    origins,
    viewdirs,
    face_vertices,  # [R, H, 3, 3] atlas-mesh triangle verts
    face_uv,        # [R, H, 3, 2] per-corner UV texel coords
    maps,           # FeatureCompression.as_device_arrays()
    decode_fn,      # compressor.get_features_from_texture_map
    sg_cfg: NGPConfig,
    *,
    texture_size: int,
    render_step_size: float,
    bg_color: str = "white",
    render_bkgd=None,
):
    R, H = hits.ts.shape
    xyzs = origins[:, None, :] + viewdirs[:, None, :] * hits.ts[..., None]
    dirs = jnp.broadcast_to(viewdirs[:, None, :], (R, H, 3))

    texels = hit_uv_texels(xyzs, face_vertices, face_uv, texture_size)
    feats = decode_fn(texels.reshape(-1, 2), maps)
    sigmas = feats[:, -1].reshape(R, H)
    rgbs = ngp_features_to_rgb(
        feats[:, :-1], dirs.reshape(-1, 3), sg_cfg
    ).reshape(R, H, 3)
    deltas = jnp.full_like(sigmas, render_step_size)
    return row_composite(
        rgbs, sigmas, hits.ts, deltas, hits.valid, bg_color, render_bkgd
    )

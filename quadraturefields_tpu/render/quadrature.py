"""Quadrature rendering at ray-mesh hits (stages 4, 5, 6).

The reference keeps mesh hits as a flat packed stream that is
re-lexsorted on CPU every step (mesh_utils.py:389-412 — a GPU->CPU->GPU
round trip in the middle of the train step). TPU-native layout instead:
a dense [n_rays, max_hits] row per ray (max_hits=25 is already the
reference's hard cap, run_nerfsynthetic_finetune.sh:7), padded with
valid=False. Compositing is an exclusive cumsum along the hit axis
(plain 2-D tensor math, no segment ops), and the post-deformation
re-sort is a per-row argsort of <=25 elements on device — the CPU
lexsort round trip disappears entirely.

Covers:
  * render_finetune_rows — stage-4 joint finetune pass
    (reference utils.py:465-607 render_image_finetune_with_occgrid);
  * render_fit_sg_rows — stage-5 SG distillation pass
    (reference utils.py:610-730);
  * row_composite — derive_properties on rows (utils.py:863-898).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class HitRows(NamedTuple):
    """Per-ray mesh hits, depth-sorted, -1/False padded."""
    tri_ids: jnp.ndarray  # [R, H] int32, -1 pad
    ts: jnp.ndarray       # [R, H] f32
    valid: jnp.ndarray    # [R, H] bool


def row_composite(
    rgbs,       # [R, H, 3]
    sigmas,     # [R, H]
    depths,     # [R, H]
    deltas,     # [R, H]
    valid,      # [R, H]
    bg_color: str = "white",
    render_bkgd=None,
):
    """derive_properties on dense rows: per-ray color/alpha/depth +
    per-hit weights. Matches reference utils.py:863-898 (normalized
    depth, white/black/random background)."""
    tau = jnp.where(valid, sigmas * deltas, 0.0)
    exc = jnp.cumsum(tau, axis=1) - tau
    trans = jnp.exp(-exc)
    alphas = 1.0 - jnp.exp(-tau)
    weights = jnp.where(valid, trans * alphas, 0.0)

    alpha = jnp.sum(weights, axis=1, keepdims=True)
    color = jnp.sum(weights[..., None] * rgbs, axis=1)
    depth = jnp.sum(weights * depths, axis=1, keepdims=True)
    depth = depth / jnp.clip(alpha, min=1e-10)

    if bg_color == "white":
        rgb = (1.0 - alpha) + color
    elif bg_color == "black":
        rgb = color
    else:
        rgb = color + (1.0 - alpha) * render_bkgd
    return rgb, alpha, depth, weights


def resort_rows(ts, valid, key_pad=1e10):
    """Per-row depth re-sort after deformation; returns the permutation
    (invalid entries pushed to the row tail). Replaces the reference's
    host np.lexsort (mesh_utils.py:395)."""
    keys = jnp.where(valid, ts, key_pad)
    order = jnp.argsort(keys, axis=1)
    return order


def apply_row_permutation(order, *arrays):
    out = []
    for a in arrays:
        out.append(jnp.take_along_axis(
            a, order.reshape(order.shape + (1,) * (a.ndim - 2)), axis=1
        ) if a.ndim > 2 else jnp.take_along_axis(a, order, axis=1))
    return tuple(out)


def random_barycentric_vertices(key, tri_vertices, uniforms=None):
    """Random convex combination of each hit triangle's vertices
    (reference utils.py:543-546: weights ~ U[0,1]^3, normalized).

    tri_vertices: [..., 3, 3]. `uniforms` ([..., 3]) overrides the key
    draw — the DP path draws them at global batch shape so the jitter
    is identical however the ray batch is sharded."""
    if uniforms is None:
        uniforms = jax.random.uniform(key, tri_vertices.shape[:-1])
    w = uniforms[..., None]
    return jnp.sum(tri_vertices * w, axis=-2) / (
        jnp.sum(w, axis=-2) + 1e-6
    )


def render_finetune_rows(
    ngp_params,
    field_params,
    hits: HitRows,
    origins,            # [R, 3]
    viewdirs,           # [R, 3]
    face_vertices,      # [R, H, 3, 3] world verts of hit triangles
    aabb,
    ngp_cfg,
    field_cfg,
    *,
    ngp_forward_fn,
    field_apply_fn,
    scaling: float,
    render_step_size: float,
    bg_color: str = "white",
    render_bkgd=None,
    key=None,
    bary_uniforms=None,  # [R, H, 3] overrides the key draw (DP path)
    stop_gradient_rf: bool = False,
):
    """Stage-4 forward: deform hits along rays by the (scalar) field,
    re-sort, query the radiance field, composite; returns render
    outputs + the deformation regularizer + per-face scatter inputs.

    Matches reference utils.py:465-607: the deformation field has
    output_dim 1 broadcast over xyz (train_finetune.py:387-399 +
    broadcasting at utils.py:557-566), dh = (tanh(f)*scaling * d.f...
    precisely del_delta = sum(tanh(f)*scaling * dirs) and the hit moves
    by del_delta*dirs; ts += del_delta.
    """
    R, H = hits.ts.shape
    valid = hits.valid
    xyzs = origins[:, None, :] + viewdirs[:, None, :] * hits.ts[..., None]
    dirs = jnp.broadcast_to(viewdirs[:, None, :], (R, H, 3))

    flat = lambda a: a.reshape((-1,) + a.shape[2:])

    # deformation at hit points (scalar field broadcast to 3 channels)
    del_scalar = field_apply_fn(
        field_params, flat(xyzs), field_cfg
    ).reshape(R, H)
    del_vector = jnp.tanh(del_scalar)[..., None] * scaling  # [R,H,1]
    del_vector3 = jnp.broadcast_to(del_vector, (R, H, 3))
    del_delta = jnp.sum(del_vector3 * dirs, axis=-1)  # [R, H]

    # deformation at random barycentric vertex samples (vertex reg)
    v_samples = random_barycentric_vertices(
        key, face_vertices, uniforms=bary_uniforms
    )
    del_scalar_v = field_apply_fn(
        field_params, flat(v_samples), field_cfg
    ).reshape(R, H)
    del_vector_v = jnp.tanh(del_scalar_v)[..., None] * scaling
    del_vector_v3 = jnp.broadcast_to(del_vector_v, (R, H, 3))

    dh = del_delta[..., None] * dirs
    xyzs = xyzs + dh
    ts = hits.ts + del_delta

    # per-row depth re-sort (replaces the CPU lexsort round trip)
    order = resort_rows(ts, valid)
    ts, del_delta_s = apply_row_permutation(order, ts, del_delta)
    xyzs, dh_s, dirs = apply_row_permutation(order, xyzs, dh, dirs)
    valid_s = jnp.take_along_axis(valid, order, axis=1)
    tri_ids_s = jnp.take_along_axis(hits.tri_ids, order, axis=1)

    rgbs, sigmas = ngp_forward_fn(
        ngp_params, flat(xyzs), flat(dirs), aabb, ngp_cfg
    )
    if stop_gradient_rf:
        rgbs = jax.lax.stop_gradient(rgbs)
        sigmas = jax.lax.stop_gradient(sigmas)
    rgbs = rgbs.reshape(R, H, 3)
    sigmas = sigmas.reshape(R, H)

    deltas = jnp.full_like(sigmas, render_step_size)
    rgb, alpha, depth, weights = row_composite(
        rgbs, sigmas, ts, deltas, valid_s, bg_color, render_bkgd
    )

    # deformation regularizer: E[dv^2] + E[(dv_v - sg(dv))^2]
    # (reference utils.py:583) — means over all entries incl. padding in
    # the reference's flat layout; here over valid entries.
    nvalid = jnp.clip(jnp.sum(valid), min=1.0)
    msk = valid[..., None]
    reg = (
        jnp.sum(jnp.where(msk, del_vector3**2, 0.0)) / (3 * nvalid)
        + jnp.sum(
            jnp.where(
                msk,
                (del_vector_v3 - jax.lax.stop_gradient(del_vector3)) ** 2,
                0.0,
            )
        ) / (3 * nvalid)
    )

    return {
        "rgb": rgb,
        "alpha": alpha,
        "depth": depth,
        "weights": weights,       # [R, H] sorted order
        "tri_ids": tri_ids_s,     # [R, H] sorted order
        "valid": valid_s,
        "dh": dh_s,               # [R, H, 3] sorted order
        "reg": reg,
        "n_hits": jnp.sum(valid),
    }


def render_fit_sg_rows(
    sg_params,
    teacher_params,
    hits: HitRows,
    origins,
    viewdirs,
    aabb,
    sg_cfg,
    teacher_cfg,
    *,
    ngp_forward_fn,
    render_step_size: float,
    bg_color: str = "white",
    render_bkgd=None,
):
    """Stage-5 forward: SG model rgb at hits, frozen teacher density,
    composite (reference utils.py:610-730)."""
    R, H = hits.ts.shape
    xyzs = origins[:, None, :] + viewdirs[:, None, :] * hits.ts[..., None]
    dirs = jnp.broadcast_to(viewdirs[:, None, :], (R, H, 3))
    flat = lambda a: a.reshape((-1,) + a.shape[2:])

    rgbs, _ = ngp_forward_fn(sg_params, flat(xyzs), flat(dirs), aabb, sg_cfg)
    _, sigmas = ngp_forward_fn(
        jax.lax.stop_gradient(teacher_params), flat(xyzs), flat(dirs),
        aabb, teacher_cfg,
    )
    sigmas = jax.lax.stop_gradient(sigmas)
    rgbs = rgbs.reshape(R, H, 3)
    sigmas = sigmas.reshape(R, H)
    deltas = jnp.full_like(sigmas, render_step_size)
    rgb, alpha, depth, weights = row_composite(
        rgbs, sigmas, hits.ts, deltas, hits.valid, bg_color, render_bkgd
    )
    return rgb, alpha, depth, weights


def render_finetune_baking_rows(
    sg_params,
    hits: HitRows,
    origins,
    viewdirs,
    face_vertices,      # [R, H, 3, 3] hit-triangle vertices
    barycentric,        # [R, H, 3] of the hit points
    aabb,
    sg_cfg,
    *,
    features_fn,        # ngp_features(params, x, aabb, cfg)
    features_to_rgb_fn,  # ngp_features_to_rgb(features, dirs, cfg)
    render_step_size: float,
    bg_color: str = "white",
    render_bkgd=None,
):
    """Vertex-feature baking check: query bakeable features at the hit
    triangle's VERTICES, barycentric-average them, and render — the
    validation pass that baked per-vertex features reproduce the field
    (reference render_image_finetune_baking_with_occgrid,
    utils.py:732-861)."""
    R, H = hits.ts.shape
    dirs = jnp.broadcast_to(viewdirs[:, None, :], (R, H, 3))
    verts_flat = face_vertices.reshape(-1, 3)              # [R*H*3, 3]
    feats = features_fn(sg_params, verts_flat, aabb, sg_cfg)
    feats = feats.reshape(R, H, 3, -1)
    feats = jnp.sum(feats * barycentric[..., None], axis=2)  # [R, H, D+1]
    sigmas = feats[..., -1]
    rgbs = features_to_rgb_fn(
        feats[..., :-1].reshape(R * H, -1), dirs.reshape(-1, 3), sg_cfg
    ).reshape(R, H, 3)
    deltas = jnp.full_like(sigmas, render_step_size)
    return row_composite(
        rgbs, sigmas, hits.ts, deltas, hits.valid, bg_color, render_bkgd
    )


def mesh_accumulate_deformation(cache_d, cache_w, dh, weights, tri_ids,
                                valid, n_faces: int):
    """MeshFinetune.update_d: scatter-add per-face dh*w and w
    (reference mesh_utils.py:126-133, torch_scatter.scatter_add)."""
    tri = jnp.where(valid, tri_ids, n_faces).reshape(-1)
    w = jnp.where(valid, weights, 0.0).reshape(-1)
    dhw = (dh * weights[..., None]).reshape(-1, 3)
    add_d = jax.ops.segment_sum(dhw, tri, num_segments=n_faces + 1)[:-1]
    add_w = jax.ops.segment_sum(w, tri, num_segments=n_faces + 1)[:-1]
    return cache_d + add_d, cache_w + add_w


def mesh_update_vertices(vertices, faces, cache_d, cache_w,
                         scaling: float):
    """MeshFinetune.update_faces: per-face mean deformation, clipped to
    +-scaling, scatter-mean onto vertices (mesh_utils.py:135-143)."""
    import numpy as np

    deformation = np.asarray(cache_d) / np.asarray(cache_w)[:, None]
    deformation = np.clip(deformation, -scaling, scaling)
    dv = np.zeros((vertices.shape[0], 3), np.float32)
    cnt = np.zeros((vertices.shape[0],), np.float32)
    np.add.at(dv, faces.reshape(-1), np.repeat(deformation, 3, axis=0))
    np.add.at(cnt, faces.reshape(-1), 1.0)
    dv = dv / np.maximum(cnt[:, None], 1.0)
    return vertices + dv

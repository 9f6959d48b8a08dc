"""Mesh/visibility tooling (reference examples/mc_utils.py parity).

Standalone utilities not on the shipped script path but part of the
reference's toolbox: visibility pruning by ray-tracing train views
(mc_utils.py:272-345), transmittance-visibility grids
(mc_utils.py:348-570), binary-grid expansion (mc_utils.py:159-179),
mesh concat/cleanup (mc_utils.py:37-74, 222-244).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .extract import upsample_trilinear_aligned
from .intersect import MeshIntersection
from .meshio import Mesh


def expand_binaries(binaries, M: int = 1024):
    """Upsample an occupancy binary grid to M^3 (mc_utils.py:159-179)."""
    d = upsample_trilinear_aligned(
        jnp.asarray(binaries, jnp.float32), (M, M, M)
    )
    return np.asarray(d) > 0.0


def clean_mesh(mesh: Mesh) -> Mesh:
    """Drop degenerate faces + unreferenced vertices
    (mc_utils.py:222-244 subset)."""
    a = mesh.vertices[mesh.faces[:, 0]]
    b = mesh.vertices[mesh.faces[:, 1]]
    c = mesh.vertices[mesh.faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    keep = area > 1e-12
    return Mesh(mesh.vertices, mesh.faces[keep]) \
        .remove_unreferenced_vertices()


def prune_mesh_train_visibility(
    mesh: Mesh, datasets, max_hits: int = 5, complement: bool = False
) -> Mesh:
    """Keep faces hit by at least one train-view ray (or the complement)
    (mc_utils.py:272-345). `datasets` yields dicts with "rays"."""
    mi = MeshIntersection(
        mesh=mesh, simplify_mesh=False, num_intersections=max_hits
    )
    visible = np.zeros((mesh.faces.shape[0],), bool)
    for data in datasets:
        rays = data["rays"]
        tri_ids, _, valid = mi.intersect_rows(
            np.asarray(rays.origins), np.asarray(rays.viewdirs)
        )
        hit = tri_ids[valid]
        visible[hit] = True
    keep = ~visible if complement else visible
    return Mesh(mesh.vertices, mesh.faces[keep]) \
        .remove_unreferenced_vertices()


def grid_transmittance(
    density_fn,
    aabb,
    datasets,
    grid_size: int = 256,
    render_step_size: float = 5e-3,
    trans_thre: float = 1e-3,
    chunk: int = 8192,
):
    """Max-over-views transmittance per grid cell: march train rays,
    scatter each sample's transmittance into its cell (max-reduce).
    Equivalent capability to mc_utils.grid_transmittance[_synthetic]
    (mc_utils.py:348-570): identifies space actually visible through
    the radiance field. Returns [grid_size]^3 float grid."""
    from ..ops.grid import (
        OccGridConfig,
        occ_grid_init,
        occ_grid_sampling,
        max_march_steps,
    )
    from ..ops import scan

    aabb_j = jnp.asarray(aabb, jnp.float32)
    occ_state = occ_grid_init(aabb_j, OccGridConfig(resolution=8))
    max_steps = max_march_steps(np.asarray(aabb), render_step_size)
    res = grid_size

    @jax.jit
    def view_pass(origins, viewdirs):
        samples = occ_grid_sampling(
            occ_state, origins, viewdirs,
            render_step_size=render_step_size,
            max_steps=max_steps,
            max_samples_total=chunk * 64,
        )
        idx = jnp.clip(samples.ray_indices, 0, origins.shape[0] - 1)
        t_mid = (samples.t_starts + samples.t_ends)[:, None] / 2.0
        pos = origins[idx] + viewdirs[idx] * t_mid
        sigmas = density_fn(pos)[..., 0]
        sigmas = jnp.where(samples.valid, sigmas, 0.0)
        boundaries = scan.mark_pack_boundaries(samples.ray_indices)
        trans, _ = scan.render_transmittance_from_density(
            samples.t_starts, samples.t_ends, sigmas, boundaries
        )
        unit = (pos - aabb_j[:3]) / (aabb_j[3:] - aabb_j[:3])
        cell = jnp.clip((unit * res).astype(jnp.int32), 0, res - 1)
        flat = (
            cell[:, 0] * res * res + cell[:, 1] * res + cell[:, 2]
        )
        flat = jnp.where(samples.valid, flat, res**3)
        grid = jnp.zeros((res**3 + 1,), jnp.float32).at[flat].max(
            jnp.where(samples.valid, trans, 0.0)
        )
        return grid[:-1]

    out = np.zeros((res**3,), np.float32)
    for data in datasets:
        rays = data["rays"]
        o = np.asarray(rays.origins)
        d = np.asarray(rays.viewdirs)
        for i in range(0, o.shape[0], chunk):
            oc = o[i:i + chunk]
            dc = d[i:i + chunk]
            if oc.shape[0] < chunk:
                pad = chunk - oc.shape[0]
                oc = np.concatenate([oc, np.zeros((pad, 3), np.float32)])
                dc = np.concatenate(
                    [dc, np.tile([[0, 0, 1.0]], (pad, 1))]
                ).astype(np.float32)
            g = np.asarray(view_pass(jnp.asarray(oc), jnp.asarray(dc)))
            np.maximum(out, g, out=out)
    return out.reshape(res, res, res)

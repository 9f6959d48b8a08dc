"""Sample-axis (t-window) sharding — the sequence-parallel analog.

The reference has no distributed rendering at all (SURVEY §2.4); the
TPU-native slot for sequence/context parallelism maps to sharding the
MARCH DEPTH of a volumetric render (SURVEY §5.7): chip k of n marches
only the t-window [t_entry + k·W·dt, t_entry + (k+1)·W·dt) of every
ray, so a scene's per-chip sample memory drops n× (or equivalently the
global sample capacity grows n×) while every chip runs the identical
fixed-shape program.

Exactness: volumetric compositing factorizes over t-windows —

    T_global(s) = T_in,k · T_local(s),   T_in,k = exp(-Σ_{j<k} τ_j)

where τ_j is chip j's per-ray optical depth. One [n_chips, R]
all-gather of τ plus one psum of the T_in-scaled partial (rgb, opacity,
depth) accumulations reproduces the single-device render bit-close
(modulo f32 order) — the "segmented scan over the ring" the survey
planned, realized as gather + local prefix (τ is tiny: 4·R bytes).

Early-termination parity: the single-device compositor zeroes weights
where transmittance < early_stop_eps; here the threshold is applied to
the GLOBAL transmittance T_in,k · T_local, not the local one, so the
sharded result matches the unsharded one exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
try:  # jax>=0.6 (0.8 renamed check_rep -> check_vma)
    from jax import shard_map as _shard_map

    def shard_map(f, **kw):
        kw["check_vma"] = kw.pop("check_rep", True)
        return _shard_map(f, **kw)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.ngp import NGPConfig, ngp_forward
from ..ops import scan
from ..ops.grid import occ_grid_sampling, ray_aabb_intersect
from ..render.renderer import RenderConfig


def make_sp_render(
    mesh: Mesh,
    aabb,
    ngp_cfg: NGPConfig,
    rcfg: RenderConfig,
    axis: str = "data",
):
    """Returns render(params, occ_state, origins, viewdirs,
    render_bkgd=None, key=None, stratified=False) -> (rgb, opacity,
    depth, num_valid_total) with the march-depth axis sharded over
    `mesh`. All inputs are replicated; each chip's sample budget is the
    full rcfg.max_samples_total, so global capacity is n_chips× the
    single-device render's.
    """
    n_dev = mesh.devices.size
    dt = rcfg.render_step_size
    w_steps = -(-rcfg.max_steps // n_dev)  # ceil: windows tile the march

    def local(params, occ_state, origins, viewdirs, render_bkgd, u):
        k = jax.lax.axis_index(axis)
        n_rays = origins.shape[0]
        t_entry, _, _ = ray_aabb_intersect(
            origins, viewdirs, occ_state.aabb
        )
        # shared stratified jitter shifts the WHOLE t-grid per ray
        # (applied here, not in the sampler, so every chip's window
        # knots stay on one global grid)
        base = jnp.maximum(t_entry, rcfg.near_plane) + u * dt
        near = base + k.astype(jnp.float32) * w_steps * dt
        far = jnp.minimum(
            base + (k + 1).astype(jnp.float32) * w_steps * dt,
            rcfg.far_plane,
        )
        samples = occ_grid_sampling(
            occ_state, origins, viewdirs,
            render_step_size=dt,
            max_steps=w_steps,
            max_samples_total=rcfg.max_samples_total,
            near_plane=near,
            far_plane=far,
            coarse_factor=rcfg.coarse_factor,
            max_coarse_hits=rcfg.max_coarse_hits,
            coarse_stride=rcfg.coarse_stride,
            coarse_dilation=rcfg.coarse_dilation,
        )
        idx = jnp.clip(samples.ray_indices, 0, n_rays - 1)
        t_mid = (samples.t_starts + samples.t_ends)[:, None] / 2.0
        pos = origins[idx] + viewdirs[idx] * t_mid
        rgbs, sigmas = ngp_forward(
            params, pos, viewdirs[idx], aabb, ngp_cfg
        )
        sigmas = jnp.where(samples.valid, sigmas[..., 0], 0.0)

        # per-ray local optical depth -> cross-chip exclusive prefix
        deltas = samples.t_ends - samples.t_starts
        tau_local = scan.accumulate_along_rays(
            sigmas * deltas, samples.ray_indices, None, n_rays
        )[:, 0]
        tau_all = jax.lax.all_gather(tau_local, axis)     # [n, R]
        chip = jax.lax.broadcasted_iota(
            jnp.int32, (n_dev, 1), 0
        )
        tau_prefix = jnp.sum(
            jnp.where(chip < k, tau_all, 0.0), axis=0
        )                                                  # [R]
        t_in = jnp.exp(-tau_prefix)

        boundaries = scan.mark_pack_boundaries(samples.ray_indices)
        weights, trans, alphas = scan.render_weight_from_density(
            samples.t_starts, samples.t_ends, sigmas, boundaries
        )
        trans_global = trans * t_in[idx]
        vis = trans_global >= rcfg.early_stop_eps
        if rcfg.alpha_thre > 0:
            vis = vis & (alphas >= rcfg.alpha_thre)
        weights = jnp.where(
            vis & samples.valid, weights * t_in[idx], 0.0
        )

        color_p = scan.accumulate_along_rays(
            weights, samples.ray_indices, rgbs, n_rays
        )
        opac_p = scan.accumulate_along_rays(
            weights, samples.ray_indices, None, n_rays
        )
        depth_p = scan.accumulate_along_rays(
            weights, samples.ray_indices, t_mid, n_rays
        )
        color = jax.lax.psum(color_p, axis)
        opacity = jax.lax.psum(opac_p, axis)
        depth = jax.lax.psum(depth_p, axis)
        depth = depth / jnp.clip(opacity, min=1e-10)
        if render_bkgd is not None:
            color = color + render_bkgd * (1.0 - opacity)
        nv = jax.lax.psum(samples.num_valid, axis)
        return color, opacity, depth, nv

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_rep=False,
    )

    @functools.partial(jax.jit, static_argnames=("stratified",))
    def render(params, occ_state, origins, viewdirs, render_bkgd=None,
               key=None, stratified: bool = False):
        n_rays = origins.shape[0]
        if stratified:
            u = jax.random.uniform(key, (n_rays,))
        else:
            u = jnp.zeros((n_rays,))
        bkgd = (
            render_bkgd if render_bkgd is not None
            else jnp.zeros(3)
        )
        return sharded(
            params, occ_state, origins, viewdirs, bkgd, u
        )

    return render


def make_dp_sp_render(
    mesh: Mesh,
    aabb,
    ngp_cfg: NGPConfig,
    rcfg: RenderConfig,
    dp_axis: str = "data",
    sp_axis: str = "sample",
):
    """2-D composition: rays shard over `dp_axis`, march depth over
    `sp_axis` — the DPxSP mesh the scaling plan calls for (SURVEY
    §2.4/§5.7). Each (d, s) chip marches its ray shard's s-th t-window;
    the transmittance stitch (all_gather of per-window optical depth +
    psum of T_in-scaled partials) rides ONLY the sp axis, so
    collectives stay within an sp ring and dp needs no communication
    at all in the forward.

    Returns render(params, occ_state, origins, viewdirs, ...) with
    origins/viewdirs globally [R, 3]; R must divide by the dp size.
    Output rgb/opacity/depth are [R, ...] (data-sharded in, gathered
    out by jit); num_valid is the global total.
    """
    n_sp = mesh.shape[sp_axis]
    dt = rcfg.render_step_size
    w_steps = -(-rcfg.max_steps // n_sp)

    def local(params, occ_state, origins, viewdirs, render_bkgd, u):
        k = jax.lax.axis_index(sp_axis)
        n_rays = origins.shape[0]
        t_entry, _, _ = ray_aabb_intersect(
            origins, viewdirs, occ_state.aabb
        )
        base = jnp.maximum(t_entry, rcfg.near_plane) + u * dt
        near = base + k.astype(jnp.float32) * w_steps * dt
        far = jnp.minimum(
            base + (k + 1).astype(jnp.float32) * w_steps * dt,
            rcfg.far_plane,
        )
        samples = occ_grid_sampling(
            occ_state, origins, viewdirs,
            render_step_size=dt,
            max_steps=w_steps,
            max_samples_total=rcfg.max_samples_total,
            near_plane=near,
            far_plane=far,
            coarse_factor=rcfg.coarse_factor,
            max_coarse_hits=rcfg.max_coarse_hits,
            coarse_stride=rcfg.coarse_stride,
            coarse_dilation=rcfg.coarse_dilation,
        )
        idx = jnp.clip(samples.ray_indices, 0, n_rays - 1)
        t_mid = (samples.t_starts + samples.t_ends)[:, None] / 2.0
        pos = origins[idx] + viewdirs[idx] * t_mid
        rgbs, sigmas = ngp_forward(
            params, pos, viewdirs[idx], aabb, ngp_cfg
        )
        sigmas = jnp.where(samples.valid, sigmas[..., 0], 0.0)

        deltas = samples.t_ends - samples.t_starts
        tau_local = scan.accumulate_along_rays(
            sigmas * deltas, samples.ray_indices, None, n_rays
        )[:, 0]
        tau_all = jax.lax.all_gather(tau_local, sp_axis)   # [n_sp, R]
        chip = jax.lax.broadcasted_iota(jnp.int32, (n_sp, 1), 0)
        tau_prefix = jnp.sum(
            jnp.where(chip < k, tau_all, 0.0), axis=0
        )
        t_in = jnp.exp(-tau_prefix)

        boundaries = scan.mark_pack_boundaries(samples.ray_indices)
        weights, trans, alphas = scan.render_weight_from_density(
            samples.t_starts, samples.t_ends, sigmas, boundaries
        )
        trans_global = trans * t_in[idx]
        vis = trans_global >= rcfg.early_stop_eps
        if rcfg.alpha_thre > 0:
            vis = vis & (alphas >= rcfg.alpha_thre)
        weights = jnp.where(
            vis & samples.valid, weights * t_in[idx], 0.0
        )

        color_p = scan.accumulate_along_rays(
            weights, samples.ray_indices, rgbs, n_rays
        )
        opac_p = scan.accumulate_along_rays(
            weights, samples.ray_indices, None, n_rays
        )
        depth_p = scan.accumulate_along_rays(
            weights, samples.ray_indices, t_mid, n_rays
        )
        color = jax.lax.psum(color_p, sp_axis)
        opacity = jax.lax.psum(opac_p, sp_axis)
        depth = jax.lax.psum(depth_p, sp_axis)
        depth = depth / jnp.clip(opacity, min=1e-10)
        if render_bkgd is not None:
            color = color + render_bkgd * (1.0 - opacity)
        nv = jax.lax.psum(
            jax.lax.psum(samples.num_valid, sp_axis), dp_axis
        )
        return color, opacity, depth, nv

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(dp_axis), P(dp_axis), P(), P(dp_axis)),
        out_specs=(P(dp_axis), P(dp_axis), P(dp_axis), P()),
        check_rep=False,
    )

    @functools.partial(jax.jit, static_argnames=("stratified",))
    def render(params, occ_state, origins, viewdirs, render_bkgd=None,
               key=None, stratified: bool = False):
        n_rays = origins.shape[0]
        if stratified:
            u = jax.random.uniform(key, (n_rays,))
        else:
            u = jnp.zeros((n_rays,))
        bkgd = (
            render_bkgd if render_bkgd is not None
            else jnp.zeros(3)
        )
        return sharded(
            params, occ_state, origins, viewdirs, bkgd, u
        )

    return render

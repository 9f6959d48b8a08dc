"""One renderer core, many heads.

The reference carries 8 near-duplicate `render_image_*` functions
(examples/utils.py:65-1095). Here a single packed-sample compositor is
shared by thin stage-specific providers:

  * render_rays_occgrid   — occ-grid march + radiance field (stage 1
    train/eval; reference utils.py:65-172).
  * render_rays_field     — same march + forward AND reverse weights for
    quadrature-field supervision (stage 2; reference utils.py:353-462 +
    field_rendering.py:575-733).
  * mesh-hit quadrature rendering lives in render/quadrature.py (stages
    4-6).

All functions are jit-friendly: static shapes, packed buffers with
sentinel padding, masks instead of boolean indexing.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.ngp import NGPConfig, ngp_forward
from ..ops import scan
from ..ops.grid import (
    OccGridState,
    PackedSamples,
    occ_grid_sampling,
)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    render_step_size: float = 5e-3
    near_plane: float = 0.0
    far_plane: float = 1e10
    alpha_thre: float = 0.0
    early_stop_eps: float = 1e-4
    cone_angle: float = 0.0  # >0: exponential step growth (360)
    max_steps: int = 1024        # static per-ray march length
    max_samples_total: int = 1 << 18  # static packed sample budget
    # two-level march: >1 skips empty space at coarse_factor*dt
    # granularity over a dilated downsampled grid (identical sample
    # set, ~coarse_factor x fewer occupancy lookups)
    coarse_factor: int = 0
    max_coarse_hits: int = 0  # 0 -> scaled from max_samples_total
    # probe spacing in dt units (0 -> coarse_factor). A stride near the
    # coarse CELL size (~cf * fine cell / dt steps) cuts the coarse
    # occupancy gathers ~stride/cf x with an identical sample set.
    coarse_stride: int = 0
    coarse_dilation: int = 0  # dilation radius in coarse cells (0 -> auto)


class RenderResult(NamedTuple):
    rgb: jnp.ndarray        # [n_rays, 3]
    opacity: jnp.ndarray    # [n_rays, 1]
    depth: jnp.ndarray      # [n_rays, 1]
    num_valid: jnp.ndarray  # [] int32 — true sample demand
    weights: jnp.ndarray    # [S]
    sigmas: jnp.ndarray     # [S]
    samples: PackedSamples


def _composite(
    samples: PackedSamples,
    rgbs,
    sigmas,
    n_rays: int,
    render_bkgd,
    early_stop_eps: float,
    alpha_thre: float,
):
    """Packed weights -> per-ray color/opacity/depth (+ background)."""
    sigmas = jnp.where(samples.valid, sigmas, 0.0)
    boundaries = scan.mark_pack_boundaries(samples.ray_indices)
    weights, trans, alphas = scan.render_weight_from_density(
        samples.t_starts, samples.t_ends, sigmas, boundaries
    )
    # nerfacc prunes invisible samples during sampling
    # (render_visibility_from_density); folding the same thresholds into
    # the weights is equivalent for the composite.
    vis = trans >= early_stop_eps
    if alpha_thre > 0:
        vis = vis & (alphas >= alpha_thre)
    weights = jnp.where(vis & samples.valid, weights, 0.0)

    # ONE presorted windowed-MXU segment sum for color+opacity+depth
    # (ray_indices are sorted by construction — compact_indices): the
    # three segment_sum row scatters cost ~81 ns/row on v5e where the
    # kernel costs ~2 ns/row (hashgrid_sorted.py); differentiable via
    # custom VJP (d vals = g[ray]).
    from ..ops.hashgrid_sorted import presorted_row_segment_sum_vjp

    t_mid = (samples.t_starts + samples.t_ends) / 2.0
    w = weights[:, None]
    vals8 = jnp.concatenate(
        [
            w * rgbs,                                 # 0:3
            w,                                        # 3
            w * t_mid[:, None],                       # 4
            jnp.zeros((weights.shape[0], 3), jnp.float32),
        ],
        axis=1,
    )
    acc = presorted_row_segment_sum_vjp(
        samples.ray_indices, vals8, n_rays
    )
    colors = acc[:, 0:3]
    opacity = acc[:, 3:4]
    depth = acc[:, 4:5] / jnp.clip(acc[:, 3:4], min=1e-10)
    if render_bkgd is not None:
        colors = colors + render_bkgd * (1.0 - opacity)
    return colors, opacity, depth, weights


def _sample_positions(samples: PackedSamples, origins, viewdirs, n_rays):
    idx = jnp.clip(samples.ray_indices, 0, n_rays - 1)
    t_mid = (samples.t_starts + samples.t_ends)[:, None] / 2.0
    pos = origins[idx] + viewdirs[idx] * t_mid
    return pos, viewdirs[idx], idx


def render_rays_occgrid(
    ngp_params,
    aabb,
    ngp_cfg: NGPConfig,
    occ_state: OccGridState,
    origins,
    viewdirs,
    rcfg: RenderConfig,
    render_bkgd=None,
    stratified: bool = False,
    key=None,
) -> RenderResult:
    """Volumetric rendering with occupancy-grid sampling (stage-1 path).

    Reference: render_image_with_occgrid (utils.py:65-172).
    """
    n_rays = origins.shape[0]
    samples = occ_grid_sampling(
        occ_state,
        origins,
        viewdirs,
        render_step_size=rcfg.render_step_size,
        max_steps=rcfg.max_steps,
        max_samples_total=rcfg.max_samples_total,
        near_plane=rcfg.near_plane,
        far_plane=rcfg.far_plane,
        stratified=stratified,
        key=key,
        coarse_factor=rcfg.coarse_factor,
        max_coarse_hits=rcfg.max_coarse_hits,
        coarse_stride=rcfg.coarse_stride,
        coarse_dilation=rcfg.coarse_dilation,
        cone_angle=rcfg.cone_angle,
        contract_aabb=aabb if ngp_cfg.unbounded else None,
    )
    pos, dirs, _ = _sample_positions(samples, origins, viewdirs, n_rays)
    rgbs, sigmas = ngp_forward(ngp_params, pos, dirs, aabb, ngp_cfg)
    sigmas = sigmas[..., 0]
    colors, opacity, depth, weights = _composite(
        samples, rgbs, sigmas, n_rays, render_bkgd,
        rcfg.early_stop_eps, rcfg.alpha_thre,
    )
    return RenderResult(
        rgb=colors,
        opacity=opacity,
        depth=depth,
        num_valid=samples.num_valid,
        weights=weights,
        sigmas=jnp.where(samples.valid, sigmas, 0.0),
        samples=samples,
    )


class FieldRenderResult(NamedTuple):
    rgb: jnp.ndarray
    opacity: jnp.ndarray
    depth: jnp.ndarray
    num_valid: jnp.ndarray
    weights: jnp.ndarray      # [S] forward weights
    weights_rev: jnp.ndarray  # [S] reverse-direction weights
    positions: jnp.ndarray    # [S, 3] world sample positions
    dirs: jnp.ndarray         # [S, 3]
    valid: jnp.ndarray        # [S]


def render_rays_field(
    ngp_params,
    aabb,
    ngp_cfg: NGPConfig,
    occ_state: OccGridState,
    origins,
    viewdirs,
    rcfg: RenderConfig,
    render_bkgd=None,
    stratified: bool = False,
    key=None,
) -> FieldRenderResult:
    """Stage-2 render: forward + reverse rendering weights at each
    sample, used to supervise |grad(field) . dir|.

    Reference: render_image_field_with_occgrid (utils.py:353-462) and
    rendering_field (field_rendering.py:575-733). Uses
    early_stop_eps=1e-4 'so that more points are supervised'
    (utils.py:432).
    """
    n_rays = origins.shape[0]
    samples = occ_grid_sampling(
        occ_state,
        origins,
        viewdirs,
        render_step_size=rcfg.render_step_size,
        max_steps=rcfg.max_steps,
        max_samples_total=rcfg.max_samples_total,
        near_plane=rcfg.near_plane,
        far_plane=rcfg.far_plane,
        stratified=stratified,
        key=key,
        coarse_factor=rcfg.coarse_factor,
        max_coarse_hits=rcfg.max_coarse_hits,
        coarse_stride=rcfg.coarse_stride,
        coarse_dilation=rcfg.coarse_dilation,
        cone_angle=rcfg.cone_angle,
        contract_aabb=aabb if ngp_cfg.unbounded else None,
    )
    pos, dirs, _ = _sample_positions(samples, origins, viewdirs, n_rays)
    rgbs, sigmas = ngp_forward(ngp_params, pos, dirs, aabb, ngp_cfg)
    sigmas = jnp.where(samples.valid, sigmas[..., 0], 0.0)

    colors, opacity, depth, weights = _composite(
        samples, rgbs, sigmas, n_rays, render_bkgd,
        rcfg.early_stop_eps, rcfg.alpha_thre,
    )
    weights_rev = scan.reverse_weights(
        samples.t_starts,
        samples.t_ends,
        sigmas,
        samples.ray_indices,
        n_rays,
        samples.valid,
    )
    weights_rev = jnp.where(samples.valid, weights_rev, 0.0)
    return FieldRenderResult(
        rgb=colors,
        opacity=opacity,
        depth=depth,
        num_valid=samples.num_valid,
        weights=weights,
        weights_rev=weights_rev,
        positions=pos,
        dirs=dirs,
        valid=samples.valid,
    )


def make_test_renderer(
    ngp_params,
    aabb,
    ngp_cfg: NGPConfig,
    rcfg: RenderConfig,
    window_steps: int = 64,
    window_budget: int = 1 << 16,
    early_stop_eps: float = 1e-4,
):
    """Memory-bounded iterative alive-ray renderer (test-time path).

    Reference: render_image_with_occgrid_test (utils.py:175-350) — march
    alive rays a fixed number of steps per iteration, composite with the
    carried prefix transmittance, retire rays whose opacity crosses
    1 - early_stop_eps. Here each iteration is one jitted window render
    over a fixed t-window per ray (cursor += window_steps * dt); the
    host loop stops when every ray has terminated or left the AABB.

    Returns render_fn(occ_state, origins, viewdirs, ...) -> (rgb,
    opacity, depth, total_samples) for a fixed-size ray chunk.
    `ngp_params` here only seeds the default; render_fn accepts a
    `params=` override so trainers can reuse one jitted window fn as
    parameters evolve (recompiling per evaluate() call would dominate
    eval time on the remote-compile toolchain).
    """
    dt = rcfg.render_step_size
    contracted = bool(getattr(ngp_cfg, "unbounded", False))

    @jax.jit
    def window(ngp_params, occ_state, origins, viewdirs, near_planes,
               rgb, opacity, depth, alive):
        n_rays = origins.shape[0]
        # cursors advance monotonically even for dead rays (a reset
        # would resurrect them and re-composite the span).
        # The cone grid re-anchored at a previous knot continues the
        # one-shot schedule exactly (linear knots stay on the dt grid;
        # geometric knots satisfy t_star <= cursor so i_star == 0), so
        # windowed samples land on the same t values as the one-shot
        # march for any cone_angle.
        from ..ops.grid import _cone_t_grid

        far = _cone_t_grid(
            near_planes, dt, rcfg.cone_angle, window_steps
        )[:, -1]
        samples = occ_grid_sampling(
            occ_state, origins, viewdirs,
            render_step_size=dt,
            max_steps=window_steps,
            max_samples_total=window_budget,
            near_plane=near_planes,
            far_plane=jnp.minimum(far, rcfg.far_plane),
            cone_angle=rcfg.cone_angle,
            contract_aabb=aabb if contracted else None,
        )
        idx = jnp.clip(samples.ray_indices, 0, n_rays - 1)
        in_window = samples.valid & alive[idx]
        pos, dirs, _ = _sample_positions(samples, origins, viewdirs, n_rays)
        rgbs, sigmas = ngp_forward(ngp_params, pos, dirs, aabb, ngp_cfg)
        sigmas = jnp.where(in_window, sigmas[..., 0], 0.0)

        boundaries = scan.mark_pack_boundaries(samples.ray_indices)
        weights, trans, alphas = scan.render_weight_from_density(
            samples.t_starts, samples.t_ends, sigmas, boundaries
        )
        prefix = 1.0 - opacity[idx, 0]
        weights = jnp.where(in_window, weights * prefix, 0.0)
        if rcfg.alpha_thre > 0:
            weights = jnp.where(alphas >= rcfg.alpha_thre, weights, 0.0)

        rgb = rgb + scan.accumulate_along_rays(
            weights, samples.ray_indices, rgbs, n_rays
        )
        opacity = opacity + scan.accumulate_along_rays(
            weights, samples.ray_indices, None, n_rays
        )
        t_mid = (samples.t_starts + samples.t_ends) / 2.0
        depth = depth + scan.accumulate_along_rays(
            weights, samples.ray_indices, t_mid[..., None], n_rays
        )
        near_planes = far
        if contracted:
            # unbounded scenes have no AABB exit: rays march to far_plane
            t_max = jnp.full((n_rays,), rcfg.far_plane)
        else:
            t_max = ray_aabb_t_max(occ_state.aabb, origins, viewdirs,
                                   rcfg.far_plane)
        alive = (
            (opacity[:, 0] <= 1.0 - early_stop_eps)
            & (near_planes < t_max)
        )
        return near_planes, rgb, opacity, depth, alive, jnp.sum(in_window)

    def render_fn(occ_state, origins, viewdirs, render_bkgd=None,
                  max_windows: int = 64, params=None):
        import numpy as np

        params = ngp_params if params is None else params
        n_rays = origins.shape[0]
        if contracted:
            # one-shot unbounded march anchors at near_plane for every
            # ray (occ_grid_sampling's contract branch); mirror that,
            # and size the window count to cover [near, far] fully
            from ..ops.grid import max_march_steps_cone

            near = jnp.full((n_rays,), rcfg.near_plane)
            need = max_march_steps_cone(
                rcfg.near_plane, rcfg.far_plane, dt, rcfg.cone_angle
            )
            max_windows = max(max_windows, -(-need // window_steps))
        else:
            # anchor each ray's cursor at its AABB entry so window
            # samples land on the same t-grid as the one-shot renderer
            from ..ops.grid import ray_aabb_intersect

            t_entry, _, _ = ray_aabb_intersect(
                origins, viewdirs, occ_state.aabb
            )
            near = jnp.maximum(t_entry, rcfg.near_plane)
        rgb = jnp.zeros((n_rays, 3))
        opacity = jnp.zeros((n_rays, 1))
        depth = jnp.zeros((n_rays, 1))
        alive = jnp.ones((n_rays,), bool)
        total = 0
        for _ in range(max_windows):
            near, rgb, opacity, depth, alive, ns = window(
                params, occ_state, origins, viewdirs, near, rgb,
                opacity, depth, alive,
            )
            total += int(ns)
            if not bool(jnp.any(alive)):
                break
        if render_bkgd is not None:
            rgb = rgb + render_bkgd * (1.0 - opacity)
        return rgb, opacity, depth, total

    return render_fn


def ray_aabb_t_max(aabb, origins, viewdirs, far_plane):
    from ..ops.grid import ray_aabb_intersect

    _, t_max, _ = ray_aabb_intersect(origins, viewdirs, aabb)
    return jnp.minimum(t_max, far_plane)


def render_image_with_occgrid(
    render_fn_jitted,
    origins,
    viewdirs,
    chunk: int = 8192,
):
    """Host-side chunked full-image render: pads the ray set to a
    multiple of `chunk` and maps a jitted per-chunk renderer over it
    (the TPU analog of the reference's test_chunk_size loop,
    utils.py:127-134). `render_fn_jitted(origins, viewdirs)` must return
    a RenderResult-like tuple whose first 3 fields are per-ray."""
    import numpy as np

    n = origins.shape[0]
    n_pad = (n + chunk - 1) // chunk * chunk
    o = np.concatenate(
        [np.asarray(origins), np.zeros((n_pad - n, 3), np.float32)]
    )
    d = np.concatenate(
        [np.asarray(viewdirs), np.tile([[0, 0, 1.0]], (n_pad - n, 1))]
    ).astype(np.float32)
    rgbs, opas, depths = [], [], []
    total = 0
    for i in range(0, n_pad, chunk):
        res = render_fn_jitted(
            jnp.asarray(o[i : i + chunk]), jnp.asarray(d[i : i + chunk])
        )
        rgbs.append(np.asarray(res[0]))
        opas.append(np.asarray(res[1]))
        depths.append(np.asarray(res[2]))
        total += int(res[3])
    return (
        np.concatenate(rgbs)[:n],
        np.concatenate(opas)[:n],
        np.concatenate(depths)[:n],
        total,
    )

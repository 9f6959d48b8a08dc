"""Occupancy-grid estimator, TPU-native.

Replaces nerfacc's OccGridEstimator (CUDA DDA traversal + packed output;
reference call sites: examples/train_ngp_nerf_sg_occ.py:223-288,
examples/utils.py:137-147). Design rationale (XLA needs static shapes):

  * `sampling` marches a *fixed* number of uniform steps per ray through
    the ray/AABB span, masks each candidate by the occupancy binary, and
    globally compacts the surviving samples into one flat ray-sorted
    buffer of static length `max_samples_total` (padding carries the
    sentinel ray index == n_rays and is a no-op downstream). This mirrors
    the reference's packed (ray_indices, t_starts, t_ends) contract with
    a fixed budget, which the trainer keeps ~full via nerfacc-style
    dynamic ray-batch resizing.
  * `update` refreshes occupancy with an EMA-max of density evals at
    jittered cell centers (nerfacc's `_update`): all cells during warmup,
    afterwards one static quarter of the grid per update (rotating), so
    every cell refreshes every 4 updates at ~nerfacc's eval budget with
    fully static shapes.

Occupancy state is a pytree (works under jit/pjit and checkpoints via
orbax). Single-level grids only — the shipped pipeline uses levels=1
(train_ngp_nerf_sg_occ.py:199 grid_nlvl=1); the multi-level unbounded
case contracts coordinates before lookup instead.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class OccGridConfig:
    resolution: int = 128
    warmup_steps: int = 256
    update_interval: int = 16
    ema_decay: float = 0.95
    occ_thre: float = 0.01
    # quarters of the grid rotated through post-warmup updates
    partitions: int = 4


class OccGridState(NamedTuple):
    occs: jnp.ndarray      # [res^3] float32 EMA densities
    binaries: jnp.ndarray  # [res, res, res] bool
    aabb: jnp.ndarray      # [6]


def occ_grid_init(aabb, cfg: OccGridConfig) -> OccGridState:
    res = cfg.resolution
    return OccGridState(
        occs=jnp.zeros((res**3,), jnp.float32),
        binaries=jnp.ones((res, res, res), bool),
        aabb=jnp.asarray(aabb, jnp.float32),
    )


def _cell_positions(aabb, res: int, idx_flat, key):
    """World positions jittered uniformly inside the given flat cells."""
    iz = idx_flat // (res * res)
    iy = (idx_flat // res) % res
    ix = idx_flat % res
    coords = jnp.stack([ix, iy, iz], axis=-1).astype(jnp.float32)
    jitter = jax.random.uniform(key, coords.shape)
    unit = (coords + jitter) / res
    return aabb[:3] + unit * (aabb[3:] - aabb[:3])


def occ_grid_update(
    state: OccGridState,
    step,
    key,
    occ_eval_fn: Callable,
    cfg: OccGridConfig,
    contract_aabb=None,
) -> OccGridState:
    """One EMA update. Call every cfg.update_interval steps (the caller
    owns the `step % n == 0` gating, matching update_every_n_steps).

    occ_eval_fn(x[world]) -> occupancy value (density * step_size), the
    same contract as the reference (train_ngp_nerf_sg_occ.py:279-288).
    `step` may be a traced scalar. With `contract_aabb`, the grid cells
    live in contracted [0,1]^3 and are mapped back to world space for
    the density eval (the unbounded/360 estimator).
    """
    res = cfg.resolution
    n_cells = res**3
    part = n_cells // cfg.partitions

    step = jnp.asarray(step, jnp.int32)
    update_idx = step // cfg.update_interval
    in_warmup = step < cfg.warmup_steps

    all_idx = jnp.arange(n_cells, dtype=jnp.int32)

    def eval_part(part_id):
        start = part_id * part
        idx = jax.lax.dynamic_slice(all_idx, (start,), (part,))
        if contract_aabb is None:
            x = _cell_positions(state.aabb, res, idx, key)
        else:
            from .activations import inv_contract_from_unisphere

            unit = jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
            y = _cell_positions(unit, res, idx, key)
            # clamp away from the contraction's open boundary
            y = jnp.clip(y, 1e-4, 1.0 - 1e-4)
            x = inv_contract_from_unisphere(
                y, jnp.asarray(contract_aabb)
            )
        occ = occ_eval_fn(x).reshape(-1)
        return idx, occ

    if cfg.partitions == 1:
        _, occ = eval_part(jnp.int32(0))
        new_occs = jnp.maximum(state.occs * cfg.ema_decay, occ)
    else:
        # partitions tile the flat grid contiguously in order, so both
        # branches are slice updates — no scatter (an .at[idx] update on
        # 524k contiguous cells lowered to two full scatters per refresh)
        def full_update(_):
            # warmup: evaluate every partition this update
            occ_parts = [
                eval_part(jnp.int32(p))[1] for p in range(cfg.partitions)
            ]
            upd = jnp.concatenate(occ_parts)
            if upd.shape[0] < n_cells:  # non-divisible tail: never updated
                upd = jnp.pad(upd, (0, n_cells - upd.shape[0]))
            return jnp.maximum(state.occs * cfg.ema_decay, upd)

        def partial_update(_):
            part_id = (update_idx % cfg.partitions).astype(jnp.int32)
            _, occ = eval_part(part_id)
            cur = jax.lax.dynamic_slice(
                state.occs, (part_id * part,), (part,)
            )
            return jax.lax.dynamic_update_slice(
                state.occs,
                jnp.maximum(cur * cfg.ema_decay, occ),
                (part_id * part,),
            )

        new_occs = jax.lax.cond(in_warmup, full_update, partial_update, None)

    thre = jnp.minimum(new_occs.mean(), cfg.occ_thre)
    binaries = (new_occs > thre).reshape(res, res, res)
    return OccGridState(occs=new_occs, binaries=binaries, aabb=state.aabb)


def ray_aabb_intersect(origins, viewdirs, aabb):
    """Slab test; returns (t_min, t_max) per ray, t_min<=t_max when hit,
    both clamped at 0. Equivalent of nerfacc.grid.ray_aabb_intersect
    (reference utils.py:21,241)."""
    inv_d = 1.0 / jnp.where(
        jnp.abs(viewdirs) < 1e-10,
        jnp.where(viewdirs >= 0, 1e-10, -1e-10),
        viewdirs,
    )
    t0 = (aabb[:3] - origins) * inv_d
    t1 = (aabb[3:] - origins) * inv_d
    t_min = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_max = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_min = jnp.maximum(t_min, 0.0)
    hit = t_min <= t_max
    return jnp.where(hit, t_min, 1e10), jnp.where(hit, t_max, -1e10), hit


def occupancy_lookup(binaries, aabb, x):
    """binaries[cell(x)] with out-of-box positions -> False."""
    res = binaries.shape[0]
    unit = (x - aabb[:3]) / (aabb[3:] - aabb[:3])
    inside = jnp.all((unit >= 0.0) & (unit < 1.0), axis=-1)
    cell = jnp.clip((unit * res).astype(jnp.int32), 0, res - 1)
    occ = binaries[cell[..., 0], cell[..., 1], cell[..., 2]]
    return occ & inside


class PackedSamples(NamedTuple):
    """Flat ray-sorted sample buffer of static length S.

    Padding entries have ray_indices == n_rays and valid == False.
    """
    ray_indices: jnp.ndarray  # [S] int32
    t_starts: jnp.ndarray     # [S] f32
    t_ends: jnp.ndarray       # [S] f32
    valid: jnp.ndarray        # [S] bool
    num_valid: jnp.ndarray    # [] int32: true count before truncation


def max_march_steps(aabb, render_step_size: float) -> int:
    """Static worst-case uniform steps across the AABB diagonal."""
    import numpy as np

    aabb = np.asarray(aabb, np.float64)
    diag = float(np.linalg.norm(aabb[3:] - aabb[:3]))
    return int(np.ceil(diag / render_step_size)) + 1


def max_march_steps_cone(
    near: float, far: float, render_step_size: float, cone_angle: float
) -> int:
    """Static step bound for cone (exponential) marching: linear
    dt-steps until t*cone_angle exceeds dt, then geometric growth
    (nerfacc's `dt = max(dt0, t*cone_angle)` advance)."""
    import numpy as np

    if cone_angle <= 0:
        return int(np.ceil((far - near) / render_step_size)) + 1
    t_star = max(render_step_size / cone_angle, near)
    linear = max(0, int(np.ceil((t_star - near) / render_step_size))) + 1
    geom = int(
        np.ceil(np.log(far / t_star) / np.log1p(cone_angle))
    ) + 1 if far > t_star else 0
    return linear + max(geom, 0) + 1


def _cone_t_grid(t_min, dt: float, cone_angle: float, max_steps: int):
    """Per-ray marching knots [n_rays, max_steps+1]: uniform spacing dt
    until t*cone_angle > dt, then geometric (1+cone_angle) growth."""
    i = jnp.arange(max_steps + 1, dtype=jnp.float32)[None, :]
    if cone_angle <= 0:
        return t_min[:, None] + i * dt
    t_star = dt / cone_angle
    i_star = jnp.ceil(
        jnp.maximum(t_star - t_min, 0.0) / dt
    )[:, None]
    t_lin = t_min[:, None] + i * dt
    t_at_star = t_min[:, None] + i_star * dt
    t_geo = t_at_star * jnp.power(1.0 + cone_angle, i - i_star)
    return jnp.where(i <= i_star, t_lin, t_geo)


def compact_indices(flat_mask, size: int):
    """Ordered indices of True entries, padded with n (== the fill
    convention of jnp.nonzero(size=size, fill_value=n)).

    Implemented as ONE lax.sort of iota-where-valid keys: on TPU a
    2-4M-element i32 sort runs in single-digit ms while nonzero's
    cumsum+scatter lowering pays the ~13 ns/element scalar-scatter
    floor (PERF_NOTES.md) — the march compactions were 2x cheaper
    under sort at bench scale.
    """
    n = flat_mask.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    keys = jnp.where(flat_mask, iota, jnp.int32(n))
    out = jax.lax.sort(keys)[:size]
    if n < size:  # keep the exact-`size` shape contract of nonzero(size=...)
        out = jnp.pad(out, (0, size - n), constant_values=n)
    return out


def occ_grid_sampling(
    state: OccGridState,
    origins,
    viewdirs,
    *,
    render_step_size: float,
    max_steps: int,
    max_samples_total: int,
    near_plane=0.0,   # scalar or per-ray [n_rays]
    far_plane=1e10,   # scalar or per-ray [n_rays]
    stratified: bool = False,
    key=None,
    coarse_factor: int = 0,   # >1 enables the two-level march
    max_coarse_hits: int = 0,  # static coarse-hit budget (two-level)
    coarse_stride: int = 0,   # probe spacing in dt units (0 -> coarse_factor)
    coarse_dilation: int = 0,  # dilation radius in coarse cells (0 -> auto)
    cone_angle: float = 0.0,   # >0: exponential step growth (360)
    contract_aabb=None,        # unbounded: world roi aabb; occupancy
                               # grid lives in contracted [0,1]^3
) -> PackedSamples:
    """Fixed-step masked ray march + global compaction.

    Matches nerfacc estimator.sampling's uniform-step semantics
    (reference utils.py:137-147): per-ray interval [t_min, t_max] from
    the AABB slab test intersected with [near, far], sample midpoints
    t0 + (i+0.5)*dt, keep samples whose midpoint cell is occupied. The
    sigma-based visibility pruning that nerfacc applies afterwards is
    folded into the renderer (weights are masked by trans/alpha
    thresholds after the density eval), avoiding a second field query.
    """
    n_rays = origins.shape[0]
    if contract_aabb is None:
        t_min, t_max, _ = ray_aabb_intersect(origins, viewdirs, state.aabb)
        t_min = jnp.maximum(t_min, near_plane)
        t_max = jnp.minimum(t_max, far_plane)
    else:
        # unbounded scenes have no exit plane: march [near, far]
        # (reference near=0.2, far=1e2; train_ngp_nerf_sg_occ.py:167-168)
        t_min = jnp.broadcast_to(
            jnp.asarray(near_plane, jnp.float32), (n_rays,)
        )
        t_max = jnp.broadcast_to(
            jnp.asarray(far_plane, jnp.float32), (n_rays,)
        )
    if stratified:
        t_min = t_min + jax.random.uniform(key, (n_rays,)) * render_step_size

    # Two-level march only when the coarse grid keeps useful
    # resolution (>= 32^3): below that, dilation makes nearly every
    # coarse cell occupied and the coarse-hit budget truncates rays
    # instead of skipping space (measured to stall training on tiny
    # test grids). The coarse-hit budget defaults to the full sample
    # budget: a dilated coarse hit can contain ZERO valid fine samples,
    # so budget//2 binds long before the fine budget does.
    if (
        coarse_factor > 1
        and contract_aabb is None
        and cone_angle == 0.0
        and state.binaries.shape[0] // coarse_factor >= 32
    ):
        stride = coarse_stride or coarse_factor
        # default coarse budget: keep the fine CANDIDATE count at
        # max_samples_total * coarse_factor regardless of stride (each
        # retained probe spawns `stride` fine sub-steps)
        budget_c = max_coarse_hits or max(
            max_samples_total * coarse_factor // stride, 1024
        )
        rc = state.binaries.shape[0] // coarse_factor
        if coarse_dilation:
            dil = coarse_dilation
        else:
            try:
                dil = _coarse_dilation_cells(
                    state.aabb, rc, stride, render_step_size
                )
            except jax.errors.TracerArrayConversionError:
                # under jit the aabb extent is unknown at trace time;
                # in the marching regime dt <= fine cell, so
                # cell >= cf*dt bounds the required radius
                dil = max(1, -(-stride // coarse_factor))
        return _two_level_march(
            state, origins, viewdirs, t_min, t_max, n_rays,
            render_step_size, max_steps, max_samples_total,
            coarse_factor, budget_c, stride, dil,
        )

    knots = _cone_t_grid(t_min, render_step_size, cone_angle, max_steps)
    t0 = knots[:, :-1]
    t1 = knots[:, 1:]
    t_mid = (t0 + t1) * 0.5                        # [n_rays, max_steps]
    in_span = t_mid < t_max[:, None]
    pos = origins[:, None, :] + viewdirs[:, None, :] * t_mid[..., None]
    if contract_aabb is None:
        occ = occupancy_lookup(state.binaries, state.aabb, pos)
    else:
        from .activations import contract_to_unisphere

        y = contract_to_unisphere(pos, jnp.asarray(contract_aabb))
        unit = jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
        occ = occupancy_lookup(state.binaries, unit, y)
    mask = in_span & occ

    flat_mask = mask.reshape(-1)
    num_valid = jnp.sum(flat_mask, dtype=jnp.int32)
    sel = compact_indices(flat_mask, max_samples_total)
    is_pad = sel >= flat_mask.shape[0]
    sel_safe = jnp.where(is_pad, 0, sel)
    ray_idx = (sel_safe // max_steps).astype(jnp.int32)
    step_i = sel_safe % max_steps

    ts = t0.reshape(-1)[jnp.where(is_pad, 0, sel_safe)]
    te = t1.reshape(-1)[jnp.where(is_pad, 0, sel_safe)]
    del step_i

    ray_idx = jnp.where(is_pad, n_rays, ray_idx)
    ts = jnp.where(is_pad, 0.0, ts)
    te = jnp.where(is_pad, 0.0, te)
    return PackedSamples(
        ray_indices=ray_idx,
        t_starts=ts,
        t_ends=te,
        valid=~is_pad,
        num_valid=num_valid,
    )


def _dilated_coarse_binaries(binaries, cf: int, dil: int = 1):
    """Max-pool the fine binaries by cf per axis, then dilate by `dil`
    coarse cells ((2*dil+1)^3 max) so a coarse-probe midpoint test can
    never miss a fine-occupied cell within half a probe stride."""
    res = binaries.shape[0]
    rc = res // cf
    coarse = binaries.reshape(rc, cf, rc, cf, rc, cf).max(axis=(1, 3, 5))
    f = coarse.astype(jnp.float32)[None, :, :, :, None]  # NHWDC-ish
    w = 2 * dil + 1
    out = jax.lax.reduce_window(
        f, -jnp.inf, jax.lax.max, (1, w, w, w, 1), (1, 1, 1, 1, 1),
        "SAME",
    )
    return out[0, :, :, :, 0] > 0.0


def _coarse_dilation_cells(aabb, rc: int, stride: int, dt: float) -> int:
    """Dilation radius (in coarse cells) that keeps the strided probe a
    strict superset of the fine march: a retained fine sample's midpoint
    is within stride*dt of its probe (stride/2 spacing + the t_max
    clamp), so the probe's cell is within ceil(stride*dt / cell) cells
    of the sample's cell on every axis."""
    ext = np.asarray(aabb[3:]) - np.asarray(aabb[:3])
    cell = float(ext.min()) / rc
    return max(1, int(np.ceil(stride * dt / cell - 1e-6)))


def resolve_coarse_stride(setting: int, aabb, resolution: int, cf: int,
                          dt: float):
    """Trainer-config convention -> (coarse_stride, coarse_dilation):
    -1 auto (one coarse cell), 0 legacy (stride = coarse_factor,
    dilation 1), >0 explicit (dilation derived)."""
    if cf <= 1:
        return 0, 0
    if setting == 0:
        return 0, 0
    if setting > 0:
        rc = max(resolution // cf, 1)
        return setting, _coarse_dilation_cells(aabb, rc, setting, dt)
    return auto_coarse_stride(aabb, resolution, cf, dt)


def auto_coarse_stride(aabb, resolution: int, cf: int, dt: float):
    """(stride, dilation) for the strided two-level march: one coarse
    cell's worth of dt steps — the largest stride whose superset
    dilation radius stays at 1 cell (minimal false-positive growth).
    Call with a CONCRETE aabb (trainer init), not under jit."""
    rc = max(resolution // cf, 1)
    ext = float(np.min(np.asarray(aabb)[3:] - np.asarray(aabb)[:3]))
    stride = max(cf, int(ext / rc / dt))
    return stride, _coarse_dilation_cells(aabb, rc, stride, dt)


def _two_level_march(
    state, origins, viewdirs, t_min, t_max, n_rays,
    dt: float, max_steps: int, max_samples_total: int,
    cf: int, max_coarse_hits: int, stride: int, dil: int,
):
    """Coarse probe every stride*dt over a dilated cf-downsampled grid,
    compaction, then fine refinement (stride sub-steps) of surviving
    probes — identical final sample set to the single-level march (the
    dilated coarse mask is a strict superset), at ~stride x fewer
    occupancy lookups. The TPU analog of nerfacc's DDA empty-space
    skipping. Decoupling the probe stride from the grid downsample
    matters because the coarse CELL (cf * fine cell, e.g. 0.094 world
    units at 128^3/cf=4) is typically several probe steps wide
    (cf*dt = 0.02 at dt=5e-3): probing every cf*dt re-tests the same
    coarse cell ~cell/(cf*dt) times. A stride near the cell size keeps
    the superset guarantee (via the dilation radius) with ~4x fewer
    coarse gathers and a ~4x smaller coarse compaction sort."""
    coarse_steps = -(-max_steps // stride)
    steps_c = jnp.arange(coarse_steps, dtype=jnp.float32)
    seg_mid = t_min[:, None] + (steps_c[None, :] + 0.5) * (stride * dt)
    # clamp the probe to just inside the span: a partial last segment's
    # midpoint can exit the AABB while its fine samples are still in
    # (the dilation covers the remaining <= stride*dt offset)
    seg_mid = jnp.minimum(seg_mid, t_max[:, None] - 0.25 * dt)
    in_span_c = (
        t_min[:, None] + steps_c[None, :] * (stride * dt) < t_max[:, None]
    )
    pos_c = origins[:, None, :] + viewdirs[:, None, :] * seg_mid[..., None]
    coarse_bin = _dilated_coarse_binaries(state.binaries, cf, dil)
    rc = coarse_bin.shape[0]
    from .occ_bits import bits_lookup_applicable, occupancy_lookup_bits

    if bits_lookup_applicable(rc):
        # Pallas VMEM bit-table lookup — the coarse occupancy field
        # packs into <= _MAX_BIT_ROWS [?,128] u32 rows, turning the
        # march's largest HBM gather into lane shuffles (PERF_NOTES
        # round-3, tools/profiles/profile_occ.py)
        occ_c = occupancy_lookup_bits(coarse_bin, state.aabb, pos_c)
    else:
        occ_c = occupancy_lookup(coarse_bin, state.aabb, pos_c)
    mask_c = in_span_c & occ_c

    flat_c = mask_c.reshape(-1)
    sel_c = compact_indices(flat_c, max_coarse_hits)
    pad_c = sel_c >= flat_c.shape[0]
    sel_c_safe = jnp.where(pad_c, 0, sel_c)
    ray_c = (sel_c_safe // coarse_steps).astype(jnp.int32)
    step_c = (sel_c_safe % coarse_steps).astype(jnp.int32)

    # fine refinement: stride sub-steps per surviving coarse probe
    ks = jnp.arange(stride, dtype=jnp.float32)
    fine_step = step_c[:, None].astype(jnp.float32) * stride + ks[None, :]
    ts_f = t_min[ray_c][:, None] + fine_step * dt        # [C, stride]
    tm_f = ts_f + 0.5 * dt
    pos_f = (
        origins[ray_c][:, None, :]
        + viewdirs[ray_c][:, None, :] * tm_f[..., None]
    )
    occ_f = occupancy_lookup(state.binaries, state.aabb, pos_f)
    in_span_f = tm_f < t_max[ray_c][:, None]
    mask_f = occ_f & in_span_f & (~pad_c)[:, None]

    flat_f = mask_f.reshape(-1)
    num_valid = jnp.sum(flat_f, dtype=jnp.int32)
    # when the coarse pass saturates its hit budget (early training,
    # dense grid), the fine count only covers retained segments —
    # extrapolate true demand by the truncation ratio so the dynamic
    # ray-batch controller is not misled into growing the batch
    num_coarse = jnp.sum(flat_c, dtype=jnp.int32)
    ratio = jnp.maximum(
        num_coarse.astype(jnp.float32) / float(max_coarse_hits), 1.0
    )
    num_valid = (num_valid.astype(jnp.float32) * ratio).astype(jnp.int32)
    sel_f = compact_indices(flat_f, max_samples_total)
    pad_f = sel_f >= flat_f.shape[0]
    sel_f_safe = jnp.where(pad_f, 0, sel_f)
    ci = sel_f_safe // stride
    ki = (sel_f_safe % stride).astype(jnp.float32)
    ray_idx = ray_c[ci]
    ts = (
        t_min[ray_idx]
        + (step_c[ci].astype(jnp.float32) * stride + ki) * dt
    )
    te = ts + dt
    ray_idx = jnp.where(pad_f, n_rays, ray_idx)
    return PackedSamples(
        ray_indices=ray_idx,
        t_starts=jnp.where(pad_f, 0.0, ts),
        t_ends=jnp.where(pad_f, 0.0, te),
        valid=~pad_f,
        num_valid=num_valid,
    )

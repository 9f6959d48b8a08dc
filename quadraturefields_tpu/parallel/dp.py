"""Ray-batch data parallelism over a device mesh.

The reference is strictly single-GPU (SURVEY §2.4: no torch.distributed
anywhere); the TPU-native scaling axis is the ray batch: rays are
embarrassingly parallel, model params are tiny (hash table ~16-64 MB)
and replicate. Each chip marches/compacts/composites its own ray shard
entirely locally (so the global sample compaction never crosses chips)
and gradients all-reduce over ICI with one psum per step.

Built on shard_map so per-shard code sees local shapes; works on any
1-D mesh including the virtual CPU mesh used in tests and the driver's
dryrun.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.6
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..models.ngp import NGPConfig
from ..render.renderer import RenderConfig, render_rays_occgrid
from ..utils.metrics import smooth_l1_loss


def _tree_weighted_psum(tree, w, axis):
    """psum of w-scaled leaves: combines per-shard means whose true
    denominators differ (valid-sample counts) into the exact global
    mean — Σ_s (n_s/n_tot)·mean_s == global masked mean."""
    return jax.tree_util.tree_map(
        lambda g: jax.lax.psum(g * w, axis), tree
    )


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D DP mesh over the first n_devices GLOBAL devices. Process-
    aware: under a multi-process runtime the prefix must cover whole
    processes (validated in parallel/multihost.py — a ragged truncation
    would deadlock collectives on a pod)."""
    from .multihost import mesh_device_grid

    return Mesh(mesh_device_grid(n_devices), (axis,))


def make_dp_train_step(
    mesh: Mesh,
    aabb,
    ngp_cfg: NGPConfig,
    rcfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    o_lambda: float = 1e-3,
    axis: str = "data",
    stratified: bool = True,
):
    """Returns train_step(params, opt_state, occ_state, origins,
    viewdirs, pixels, bkgd, key) -> (params, opt_state, loss,
    num_valid_total).

    Inputs: params/opt_state/occ_state replicated; ray tensors sharded
    on their leading axis. The per-shard sample budget is
    rcfg.max_samples_total // n_devices, so the global budget matches
    the single-chip configuration. num_valid_total (psum of per-shard
    composited sample counts) drives the dynamic ray-batch resize
    exactly like the single-device trainer.
    """
    n_dev = mesh.devices.size
    local_rcfg = RenderConfig(
        **{
            **rcfg.__dict__,
            "max_samples_total": max(
                256, rcfg.max_samples_total // n_dev
            ),
        }
    )

    def local_loss(params, occ_state, origins, viewdirs, pixels, bkgd, key):
        result = render_rays_occgrid(
            params, aabb, ngp_cfg, occ_state, origins, viewdirs,
            local_rcfg, render_bkgd=bkgd, stratified=stratified, key=key,
        )
        rgb_loss = smooth_l1_loss(result.rgb, pixels)
        acc = result.opacity[:, 0]
        reg = (o_lambda * (-acc * jnp.log(acc + 1e-10))).mean()
        mse = jnp.mean((result.rgb - pixels) ** 2)
        return rgb_loss + reg, (result.num_valid, mse)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P(), P()),
    )
    def sharded_loss_and_grad(
        params, occ_state, origins, viewdirs, pixels, bkgd, key
    ):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        (loss, (nv, mse)), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(params, occ_state, origins, viewdirs, pixels, bkgd, key)
        return (
            jax.lax.pmean(loss, axis),
            jax.lax.pmean(grads, axis),
            jax.lax.psum(nv, axis),
            jax.lax.pmean(mse, axis),
        )

    @jax.jit
    def train_step(
        params, opt_state, occ_state, origins, viewdirs, pixels, bkgd, key
    ):
        loss, grads, nv, mse = sharded_loss_and_grad(
            params, occ_state, origins, viewdirs, pixels, bkgd, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, {"num_valid": nv, "mse": mse}

    return train_step


def make_dp_occ_update(
    mesh: Mesh,
    aabb,
    ngp_cfg: NGPConfig,
    occ_cfg,
    render_step_size: float,
    axis: str = "data",
    contract_aabb=None,
):
    """Occupancy-grid EMA refresh under the DP mesh (VERDICT r3 #5 —
    the reference refreshes every 16 steps mid-training,
    train_ngp_nerf_sg_occ.py:284-288, so a DP trainer must too).

    The expensive part of a refresh is the density evaluation of one
    grid partition (a 524k-point query at 128^3/4); it shards over the
    mesh — each device evaluates its slice and the occupancies
    all_gather back — while the cheap EMA/threshold math runs
    replicated, so the returned OccGridState is replicated and
    bit-identical across devices (and to the single-device update,
    tests/test_multichip.py).

    Returns occ_update(params, occ_state, step, key) -> OccGridState.
    """
    from ..models.ngp import ngp_query_density
    from ..ops.grid import occ_grid_update

    n_dev = mesh.devices.size
    aabb_arr = jnp.asarray(aabb)

    # check_vma=False: the outputs ARE replicated (every device runs
    # the same EMA math on the all_gathered occupancies), but the
    # inference cannot see that through the warmup lax.cond /
    # dynamic_update_slice chain inside occ_grid_update
    import inspect

    _kw = (
        "check_vma"
        if "check_vma" in inspect.signature(shard_map).parameters
        else "check_rep"  # pragma: no cover - older jax spelling
    )
    _smap = functools.partial(shard_map, **{_kw: False})

    @functools.partial(
        _smap,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(),
    )
    def update(params, occ_state, step, key):
        def occ_eval_fn(x):
            n = x.shape[0]
            shard = -(-n // n_dev)
            xp = jnp.pad(x, ((0, shard * n_dev - n), (0, 0)))
            local = jax.lax.dynamic_slice_in_dim(
                xp, jax.lax.axis_index(axis) * shard, shard
            )
            d = ngp_query_density(params, local, aabb_arr, ngp_cfg)
            occ_local = d[..., 0] * render_step_size
            occ = jax.lax.all_gather(occ_local, axis, tiled=True)
            return occ[:n]

        return occ_grid_update(
            occ_state, step, key, occ_eval_fn, occ_cfg,
            contract_aabb=contract_aabb,
        )

    return jax.jit(update)


def make_dp_field_train_step(
    mesh: Mesh,
    aabb,
    ngp_cfg: NGPConfig,
    field_cfg,
    rcfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    axis: str = "data",
    stratified: bool = True,
):
    """Stage-2 (field distillation) DP step: each chip renders its ray
    shard with the frozen NGP (fwd+rev weights), evaluates the field
    gradient at its local samples, and the field-loss gradients combine
    with valid-count weighting (field_loss is a masked mean, so the
    weighted psum reproduces the exact global mean; see
    train/stage2_field.py and reference train_field.py:330-360).

    Returns train_step(field_params, opt_state, ngp_params, occ_state,
    origins, viewdirs, bkgd, key) -> (field_params, opt_state, loss,
    num_valid_total).
    """
    from ..models.field import field_loss, field_with_grad
    from ..models.ngp import ngp_normalize
    from ..render.renderer import render_rays_field

    n_dev = mesh.devices.size
    local_rcfg = RenderConfig(
        **{
            **rcfg.__dict__,
            "max_samples_total": max(256, rcfg.max_samples_total // n_dev),
        }
    )

    def local_loss(field_params, ngp_params, occ_state, origins,
                   viewdirs, bkgd, key):
        res = render_rays_field(
            ngp_params, aabb, ngp_cfg, occ_state, origins, viewdirs,
            local_rcfg, render_bkgd=bkgd, stratified=stratified, key=key,
        )
        _, pos01 = ngp_normalize(res.positions, aabb, ngp_cfg)
        positions = jax.lax.stop_gradient(pos01 - 0.5)

        def loss_fn(fp):
            _, fgrad = field_with_grad(fp, positions, field_cfg)
            return field_loss(
                res.weights, res.weights_rev, fgrad, res.dirs,
                mask=res.valid,
            )

        loss, grads = jax.value_and_grad(loss_fn)(field_params)
        # field_loss divides by sum(valid) locally: weight by it
        return loss, grads, jnp.sum(res.valid).astype(jnp.float32)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P()),
    )
    def sharded(field_params, ngp_params, occ_state, origins, viewdirs,
                bkgd, key):
        if stratified:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        loss, grads, n_local = local_loss(
            field_params, ngp_params, occ_state, origins, viewdirs,
            bkgd, key,
        )
        n_total = jnp.maximum(jax.lax.psum(n_local, axis), 1.0)
        w = n_local / n_total
        return (
            jax.lax.psum(loss * w, axis),
            _tree_weighted_psum(grads, w, axis),
            jax.lax.psum(n_local, axis),
        )

    @jax.jit
    def train_step(field_params, opt_state, ngp_params, occ_state,
                   origins, viewdirs, bkgd, key):
        loss, grads, nv = sharded(
            field_params, ngp_params, occ_state, origins, viewdirs,
            bkgd, key,
        )
        updates, opt_state = optimizer.update(
            grads, opt_state, field_params
        )
        field_params = optax.apply_updates(field_params, updates)
        return field_params, opt_state, loss, nv

    return train_step


def make_dp_fit_sg_train_step(
    mesh: Mesh,
    aabb,
    sg_cfg,
    teacher_cfg,
    optimizer: optax.GradientTransformation,
    render_step_size: float,
    axis: str = "data",
    pack_cap: int = 0,  # per-shard packed-hit budget; 0 = dense rows
):
    """Stage-5 (SG fit at mesh hits) DP step. All inputs are per-ray
    rows ([R] / [R,H]), so every chip composites its own shard with the
    frozen teacher and the smooth-l1 ray mean combines with a plain
    pmean (equal shard sizes). See train/stage5_fit_sg.py.

    Returns train_step(sg_params, opt_state, teacher_params, origins,
    viewdirs, pixels, bkgd, tri_ids, ts, valid) ->
    (sg_params, opt_state, loss, n_hits_total).
    """
    from ..models.ngp import ngp_forward
    from ..render.quadrature import (
        HitRows,
        render_fit_sg_packed,
        render_fit_sg_rows,
    )

    def local_loss(sg_params, teacher_params, origins, viewdirs, pixels,
                   bkgd, tri_ids, ts, valid):
        hits = HitRows(tri_ids=tri_ids, ts=ts, valid=valid)
        kwargs = dict(
            ngp_forward_fn=lambda p, x, d, a, c: (
                lambda r: (r[0], r[1][..., 0])
            )(ngp_forward(p, x, d, a, c)),
            render_step_size=render_step_size,
            bg_color="random",
            render_bkgd=bkgd,
        )
        # per-shard masked mean; pmean across shards is exact when no
        # shard truncates (the designed regime) and a benign
        # equal-shard-weight approximation otherwise
        ray_mask = None
        if pack_cap > 0:
            out = render_fit_sg_packed(
                sg_params, teacher_params, hits, origins, viewdirs,
                aabb, sg_cfg, teacher_cfg, pack_cap=pack_cap, **kwargs,
            )
            rgb, ray_mask = out[0], out[5]
        else:
            rgb = render_fit_sg_rows(
                sg_params, teacher_params, hits, origins, viewdirs,
                aabb, sg_cfg, teacher_cfg, **kwargs,
            )[0]
        return smooth_l1_loss(rgb, pixels, ray_mask=ray_mask), \
            jnp.sum(valid)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(axis), P(axis), P(axis), P(),
            P(axis), P(axis), P(axis),
        ),
        out_specs=(P(), P(), P()),
    )
    def sharded(sg_params, teacher_params, origins, viewdirs, pixels,
                bkgd, tri_ids, ts, valid):
        (loss, n_hits), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(sg_params, teacher_params, origins, viewdirs, pixels, bkgd,
          tri_ids, ts, valid)
        return (
            jax.lax.pmean(loss, axis),
            jax.lax.pmean(grads, axis),
            jax.lax.psum(n_hits, axis),
        )

    @jax.jit
    def train_step(sg_params, opt_state, teacher_params, origins,
                   viewdirs, pixels, bkgd, tri_ids, ts, valid):
        loss, grads, n_hits = sharded(
            sg_params, teacher_params, origins, viewdirs, pixels, bkgd,
            tri_ids, ts, valid,
        )
        updates, opt_state = optimizer.update(grads, opt_state, sg_params)
        sg_params = optax.apply_updates(sg_params, updates)
        return sg_params, opt_state, loss, n_hits

    return train_step


def make_dp_finetune_train_step(
    mesh: Mesh,
    aabb,
    ngp_cfg: NGPConfig,
    field_cfg,
    rcfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    n_faces: int,
    scaling: float,
    render_step_size: float,
    freeze_rf: bool = False,
    axis: str = "data",
    stratified: bool = True,
    pack_cap: int = 0,  # per-shard packed-hit budget; 0 = dense rows
):
    """Stage-4 (joint finetune) DP step: per-shard quadrature render at
    mesh hits + volumetric render, pmean'd dual loss; the per-face
    deformation accumulators (segment sums over the WHOLE face set) are
    psum'd so every chip holds the same replicated cache — the stage-4
    analog of the reference's single-GPU torch_scatter accumulation
    (mesh_utils.py:126-133). See train/stage4_finetune.py.

    Returns train_step(params, opt_state, occ_state, cache_d, cache_w,
    origins, viewdirs, pixels, bkgd, tri_ids, ts, valid, face_vertices,
    key) -> (params, opt_state, cache_d, cache_w, loss, n_hits_total).
    """
    from ..models.field import field_apply
    from ..models.ngp import ngp_forward
    from ..render.quadrature import (
        HitRows,
        mesh_accumulate_deformation,
        render_finetune_packed,
        render_finetune_rows,
    )

    n_dev = mesh.devices.size
    local_rcfg = RenderConfig(
        **{
            **rcfg.__dict__,
            "max_samples_total": max(256, rcfg.max_samples_total // n_dev),
        }
    )

    def local_loss(params, occ_state, origins, viewdirs, pixels, bkgd,
                   tri_ids, ts, valid, face_vertices, bary_u, key):
        hits = HitRows(tri_ids=tri_ids, ts=ts, valid=valid)
        render_kwargs = dict(
            ngp_forward_fn=lambda p, x, d, a, c: (
                lambda r: (r[0], r[1][..., 0])
            )(ngp_forward(p, x, d, a, c)),
            field_apply_fn=field_apply,
            scaling=scaling,
            render_step_size=render_step_size,
            bg_color="random",
            render_bkgd=bkgd,
            key=key,
            bary_uniforms=bary_u,
            stop_gradient_rf=freeze_rf,
        )
        if pack_cap > 0:
            out = render_finetune_packed(
                params["rf"], params["field"], hits, origins, viewdirs,
                face_vertices, aabb, ngp_cfg, field_cfg,
                pack_cap=pack_cap, **render_kwargs,
            )
        else:
            out = render_finetune_rows(
                params["rf"], params["field"], hits, origins, viewdirs,
                face_vertices, aabb, ngp_cfg, field_cfg,
                **render_kwargs,
            )
        rf_params = (
            jax.tree_util.tree_map(jax.lax.stop_gradient, params["rf"])
            if freeze_rf else params["rf"]
        )
        vol = render_rays_occgrid(
            rf_params, aabb, ngp_cfg, occ_state, origins, viewdirs,
            local_rcfg, render_bkgd=bkgd, stratified=stratified, key=key,
        )
        loss = (
            smooth_l1_loss(out["rgb"], pixels,
                           ray_mask=out.get("ray_mask"))
            + smooth_l1_loss(vol.rgb, pixels)
        ) / 2.0 + out["reg"]
        aux = {k: out[k] for k in
               ("weights", "tri_ids", "valid", "dh", "n_hits")}
        return loss, aux

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(axis), P(axis), P(axis), P(),
            P(axis), P(axis), P(axis), P(axis), P(axis), P(),
        ),
        out_specs=(P(), P(), P(), P(), P()),
    )
    def sharded(params, occ_state, origins, viewdirs, pixels, bkgd,
                tri_ids, ts, valid, face_vertices, bary_u, key):
        if stratified:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        (loss, aux), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(params, occ_state, origins, viewdirs, pixels, bkgd,
          tri_ids, ts, valid, face_vertices, bary_u, key)
        add_d, add_w = mesh_accumulate_deformation(
            jnp.zeros((n_faces, 3), jnp.float32),
            jnp.zeros((n_faces,), jnp.float32),
            aux["dh"], aux["weights"], aux["tri_ids"], aux["valid"],
            n_faces,
        )
        return (
            jax.lax.pmean(loss, axis),
            jax.lax.pmean(grads, axis),
            jax.lax.psum(add_d, axis),
            jax.lax.psum(add_w, axis),
            jax.lax.psum(aux["n_hits"], axis),
        )

    @jax.jit
    def train_step(params, opt_state, occ_state, cache_d, cache_w,
                   origins, viewdirs, pixels, bkgd, tri_ids, ts, valid,
                   face_vertices, key):
        # barycentric jitter drawn at GLOBAL batch shape, then sharded:
        # identical draws however the ray batch is split across chips
        bary_u = jax.random.uniform(
            jax.random.fold_in(key, 1), ts.shape + (3,)
        )
        loss, grads, add_d, add_w, n_hits = sharded(
            params, occ_state, origins, viewdirs, pixels, bkgd,
            tri_ids, ts, valid, face_vertices, bary_u, key,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, cache_d + add_d, cache_w + add_w,
                loss, n_hits)

    return train_step

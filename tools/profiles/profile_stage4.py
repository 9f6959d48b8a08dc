"""Decompose the stage-4 finetune step (VERDICT r3 #1): the per-
component accounting that took stage 1 from 149k to 2.5M samples/s,
applied to the 9.7k rays/s stage-4 step.

Contract shape: 2^17 rays x 25 hits (run_nerfsynthetic_finetune.sh),
TPU-fast headline encoding (cell L8F4 bf16factor) for RF + twin +
deformation field, packed 12 B/hit host transport + device-resident
face-vertex table (round-4 transport redesign).

Pieces (all host-transfer-synced, median of repeats):
  host_cast   C++ BVH packed multi-hit cast (standalone, 1 core here)
  upload      device_put of the packed (slots, tri, ts) arrays
  full        jitted joint train step (staged inputs)
  grad_only   value_and_grad without the optimizer
  fwd_only    loss value only
  quad_fwd /  the quadrature branch alone (packed stream render +
  quad_grad   masked smooth-L1 + reg) fwd / fwd+bwd
  vol_fwd /   the volumetric twin alone (occ-grid march render +
  vol_grad    smooth-L1) fwd / fwd+bwd
  field_fwd   ONE fused deformation-field apply at [2M, 3]
  rf_fwd      radiance-field forward at [M]
  accum       mesh_accumulate_deformation alone

 => adam+glue ~ full - grad_only; bwd ~ grad_only - fwd_only;
    the quad/vol splits localize which branch's backward dominates.

Run (idle chip): python tools/profiles/profile_stage4.py [rays_log2] [groups]

groups: comma list of {host,full,grad,quad,vol,prims} (default all).
The full-step executable + a second non-donated grad program together
exceed the 15.75 G HBM (the T=2^24 deformation-field table is 2.1 GB
and Adam doubles it), so on-chip runs should measure groups in separate
processes — the persistent compile cache makes re-entry cheap:
  for g in host full grad quad vol prims; do
      python tools/profiles/profile_stage4.py 17 $g; done
Each run prints PROFILE_STAGE4_PARTIAL with its group's keys; merge by
union.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

if os.environ.get("QF_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/qf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

import bench
from quadraturefields_tpu.geometry.meshio import Mesh
from quadraturefields_tpu.models.field import field_apply
from quadraturefields_tpu.models.ngp import ngp_forward, ngp_init
from quadraturefields_tpu.ops.grid import OccGridState
from quadraturefields_tpu.render.quadrature import (
    mesh_accumulate_deformation,
    packed_hits_from_host,
    render_finetune_packed_stream,
)
from quadraturefields_tpu.render.renderer import render_rays_occgrid
from quadraturefields_tpu.train.stage4_finetune import (
    Stage4Config,
    Stage4Trainer,
)
from quadraturefields_tpu.utils.metrics import smooth_l1_loss

RAYS_LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 17
N_RAYS = 1 << RAYS_LOG2
REPS = int(os.environ.get("QF_S4_REPS", 8))
GROUPS = set(
    (sys.argv[2] if len(sys.argv) > 2 else
     "host,full,grad,quad,vol,prims").split(",")
)
# Non-donated grad programs (groups grad / quad's quad_grad / vol's
# vol_grad) OOM even alone in a fresh process: params (2.1 GB field
# table) + a full grads output tree + saved residuals exceed HBM
# without the full step's donation aliasing. The step-variant groups
# below measure DONATED optimizer steps whose loss is one branch, so
# each fits exactly like the real step and the decomposition falls out
# differentially:
#   stepfrozen  full step with freeze_rf=True (backward = field only)
#   stepquad    donated adam step on the quadrature branch alone
#   stepvol     donated adam step on the volumetric twin alone


class _Done(Exception):
    pass


def timed(fn, *args, reps=REPS, warm=2, **kw):
    for _ in range(warm):
        out = fn(*args, **kw)
    jnp.sum(jax.tree_util.tree_leaves(out)[0]).block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # host sync
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    # QF_S4_FIELD_T: deformation-field log2 hashmap override (default
    # the reference-parity 24; 21/19 are the TPU-fast candidates).
    # QF_S4_OCC=shell: occupy only the surface band |r - 0.9| < 0.2
    # instead of the solid ball — the converged stage-4 occupancy
    # regime (density concentrates at the surface by stage 4).
    cfg = Stage4Config(
        scene_type="synthetic", freeze_rf_steps=0,
        init_batch_size=N_RAYS, scale=1.0,
        batch_size_log2=RAYS_LOG2 + 2,
        layout="cell", grad_payload="bf16factor",
        n_levels=8, n_features=4,
        field_log2_hashmap_size=int(os.environ.get("QF_S4_FIELD_T", 24)),
    )
    verts, faces = bench._bumpy_sphere(200)
    loader = bench._PooledLoader(bench._orbit_batches(N_RAYS))
    key = jax.random.PRNGKey(0)
    ngp_params = ngp_init(key, cfg.ngp_config())
    res = cfg.grid_resolution
    aabb = cfg.aabb
    grid = np.stack(
        np.meshgrid(*([np.linspace(aabb[0], aabb[3], res)] * 3),
                    indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    r = np.linalg.norm(grid, axis=-1)
    if os.environ.get("QF_S4_OCC") == "shell":
        occ = (np.abs(r - 0.9) < 0.2).astype(np.float32)
    else:
        occ = (r < 1.05).astype(np.float32)
    occ_state = OccGridState(
        occs=jnp.asarray(occ),
        binaries=jnp.asarray(occ.reshape(res, res, res) > 0),
        aabb=jnp.asarray(aabb),
    )
    trainer = Stage4Trainer(
        cfg, ngp_params=ngp_params, occ_state=occ_state,
        mesh=Mesh(verts, faces), train_dataset=loader,
        test_dataset=loader,
    )
    results = {}
    import atexit
    import json as _json

    # partial results survive an OOM mid-run
    atexit.register(
        lambda: print(
            "PROFILE_STAGE4_PARTIAL "
            + _json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                           for k, v in results.items()}),
            flush=True,
        )
    )
    try:
        # ----- host cast + upload -----
        b = loader.fetch_train_batch()
        o_np = b["rays"].origins
        d_np = b["rays"].viewdirs
        t0 = time.perf_counter()
        slots, tri, ts_h, total = trainer.mesh_intersect.intersect_packed(
            o_np, d_np, cap=cfg.pack_cap
        )
        if "host" in GROUPS:
            results["host_cast_s"] = time.perf_counter() - t0
            results["true_hits"] = int(total)
            results["pack_cap"] = cfg.pack_cap

            def upload():
                return (
                    jax.device_put(slots), jax.device_put(tri),
                    jax.device_put(ts_h),
                )

            results["upload_s"] = timed(lambda: jnp.sum(upload()[2]))

        # ----- staged step inputs -----
        origins = jnp.asarray(o_np)
        viewdirs = jnp.asarray(d_np)
        pixels = jnp.asarray(b["pixels"])
        bkgd = jnp.asarray(b["color_bkgd"])
        hit_args = (
            jnp.asarray(slots), jnp.asarray(tri), jnp.asarray(ts_h),
            jnp.asarray(np.int32(min(total, 2**31 - 1))),
            trainer.face_verts_dev,
        )
        k = jax.random.PRNGKey(7)

        params = trainer.params

        if "full" in GROUPS:
            # full step: donation consumes params -> thread them through
            opt_state = trainer.opt_state
            cache_d, cache_w = trainer.cache_d, trainer.cache_w
            step_fn = trainer._train_step_joint

            def full_step():
                nonlocal params, opt_state, cache_d, cache_w
                params, opt_state, cache_d, cache_w, loss, nh, mse = (
                    step_fn(
                        params, opt_state, trainer.occ_state, cache_d,
                        cache_w, origins, viewdirs, pixels, bkgd,
                        hit_args, k,
                    )
                )
                return loss

            results["full_s"] = timed(full_step)
            opt_state = cache_d = cache_w = None
            del full_step, step_fn

        if "stepfrozen" in GROUPS:
            opt_state = trainer.opt_state
            cache_d, cache_w = trainer.cache_d, trainer.cache_w
            step_fn = trainer._train_step_frozen

            def frozen_step():
                nonlocal params, opt_state, cache_d, cache_w
                params, opt_state, cache_d, cache_w, loss, nh, mse = (
                    step_fn(
                        params, opt_state, trainer.occ_state, cache_d,
                        cache_w, origins, viewdirs, pixels, bkgd,
                        hit_args, k,
                    )
                )
                return loss

            results["step_frozen_s"] = timed(frozen_step)
            opt_state = cache_d = cache_w = None
            del frozen_step, step_fn
        # the full-step program + a second non-donated grad program
        # together exceed the 15.75 G HBM (T=2^24 field table 2.1 GB,
        # Adam 2x more) — measure other groups in separate processes
        import gc

        trainer.opt_state = None
        gc.collect()

        loss_fn = functools.partial(
            trainer._loss_fn,
            occ_state=trainer.occ_state, origins=origins,
            viewdirs=viewdirs, pixels=pixels, bkgd=bkgd,
            hit_args=hit_args, key=k, freeze_rf=False,
        )
        if "grad" in GROUPS:
            grad_fn = jax.jit(
                lambda p: jax.value_and_grad(
                    lambda q: loss_fn(q)[0]
                )(p)
            )
            results["grad_only_s"] = timed(grad_fn, params)
            del grad_fn
            gc.collect()
            fwd_fn = jax.jit(lambda p: loss_fn(p)[0])
            results["fwd_only_s"] = timed(fwd_fn, params)

        # ----- branch splits -----
        ngp_fwd = lambda p, x, d, a, c: (
            lambda r: (r[0], r[1][..., 0])
        )(ngp_forward(p, x, d, a, c))
        ph_builder = lambda: packed_hits_from_host(
            hit_args[0], hit_args[1], hit_args[2], hit_args[3],
            n_rays=N_RAYS, max_hits=cfg.max_hits,
        )

        def quad_loss(p):
            ph = ph_builder()
            out = render_finetune_packed_stream(
                p["rf"], p["field"], ph, N_RAYS, cfg.max_hits,
                origins, viewdirs, trainer.face_verts_dev,
                trainer.aabb, trainer.ngp_cfg, trainer.field_cfg,
                ngp_forward_fn=ngp_fwd, field_apply_fn=field_apply,
                scaling=cfg.scaling,
                render_step_size=cfg.eff_render_step_size,
                bg_color="random", render_bkgd=bkgd, key=k,
            )
            return smooth_l1_loss(
                out["rgb"], pixels, ray_mask=out.get("ray_mask")
            ) + out["reg"]

        def vol_loss(p):
            vol = render_rays_occgrid(
                p["rf"], trainer.aabb, trainer.ngp_cfg,
                trainer.occ_state, origins, viewdirs, trainer.rcfg,
                render_bkgd=bkgd, stratified=True, key=k,
            )
            return smooth_l1_loss(vol.rgb, pixels)

        if "quad" in GROUPS:
            results["quad_fwd_s"] = timed(jax.jit(quad_loss), params)
            results["quad_grad_s"] = timed(
                jax.jit(jax.value_and_grad(quad_loss)), params
            )
            gc.collect()
        if "vol" in GROUPS:
            results["vol_fwd_s"] = timed(jax.jit(vol_loss), params)
            results["vol_grad_s"] = timed(
                jax.jit(jax.value_and_grad(vol_loss)), params
            )
            gc.collect()

        for gname, branch_loss, rkey in (
            ("stepquad", quad_loss, "step_quad_s"),
            ("stepvol", vol_loss, "step_vol_s"),
        ):
            if gname not in GROUPS:
                continue
            import optax

            opt_state = trainer.optimizer.init(params)

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def branch_step(p, o, _loss=branch_loss):
                l, g = jax.value_and_grad(_loss)(p)
                upd, o = trainer.optimizer.update(g, o, p)
                return optax.apply_updates(p, upd), o, l

            def run_branch():
                nonlocal params, opt_state
                params, opt_state, l = branch_step(params, opt_state)
                return l

            results[rkey] = timed(run_branch)
            opt_state = None
            del branch_step, run_branch
            gc.collect()

        if "fieldgrad" in GROUPS:
            # the deformation-field encode+MLP backward alone, at the
            # real fused shape (2*cap points, T=2^24 L16 cell table)
            pts2 = jax.device_put(
                np.random.default_rng(0)
                .uniform(-0.9, 0.9, (2 * cfg.pack_cap, 3))
                .astype(np.float32)
            )
            fg = jax.jit(jax.grad(
                lambda p, x: jnp.sum(
                    field_apply(p, x, trainer.field_cfg)
                )
            ))
            results["field_grad_2M_s"] = timed(fg, params["field"], pts2)
            del fg
            gc.collect()

        if "fieldop" in GROUPS:
            # sorted_tet_factor_grad ALONE at the field's real stream
            # shape: nL = 2*cap*16 contributions into the 18.4M-row
            # cell table — isolates sort + windowed-MXU sweep from the
            # rest of the backward
            from quadraturefields_tpu.ops.hashgrid_sorted import (
                sorted_tet_factor_grad,
            )

            fhg = trainer.field_cfg.hashgrid
            nL = 2 * cfg.pack_cap * fhg.n_levels
            rng = np.random.default_rng(1)
            idx = jax.device_put(rng.integers(
                0, fhg.total_entries, nL, dtype=np.int32))
            wk = jax.device_put(
                rng.random((nL, 4), dtype=np.float32))
            c1 = jax.device_put(rng.integers(1, 7, nL, dtype=np.int32))
            c2 = jax.device_put(rng.integers(1, 7, nL, dtype=np.int32))
            gup = jax.device_put(
                rng.random((nL, fhg.n_features), dtype=np.float32))
            op = jax.jit(functools.partial(
                sorted_tet_factor_grad,
                total_entries=fhg.total_entries,
            ))
            results["field_sortedop_s"] = timed(op, idx, wk, c1, c2, gup)
            results["field_stream_nL"] = int(nL)
            del op
            gc.collect()

        if "rfgrad" in GROUPS:
            pts1 = jax.device_put(
                np.random.default_rng(2)
                .uniform(-0.9, 0.9, (cfg.pack_cap, 3))
                .astype(np.float32)
            )
            dirs1 = pts1 / jnp.linalg.norm(pts1, axis=1, keepdims=True)
            rg = jax.jit(jax.grad(
                lambda p, x, d: jnp.sum(
                    ngp_fwd(p, x, d, trainer.aabb, trainer.ngp_cfg)[0]
                )
            ))
            results["rf_grad_M_s"] = timed(rg, params["rf"], pts1, dirs1)
            del rg
            gc.collect()

        # ----- primitive pieces -----
        M = cfg.pack_cap
        if "prims" not in GROUPS:
            raise _Done()
        pts2 = jax.device_put(
            np.random.default_rng(0)
            .uniform(-0.9, 0.9, (2 * M, 3)).astype(np.float32)
        )
        results["field_fwd_2M_s"] = timed(
            jax.jit(
                lambda p, x: field_apply(p, x, trainer.field_cfg)
            ),
            params["field"], pts2,
        )
        pts1 = pts2[:M]
        dirs1 = pts1 / jnp.linalg.norm(pts1, axis=1, keepdims=True)
        results["rf_fwd_M_s"] = timed(
            jax.jit(
                lambda p, x, d: ngp_fwd(
                    p, x, d, trainer.aabb, trainer.ngp_cfg
                )[0]
            ),
            params["rf"], pts1, dirs1,
        )
        w = jnp.abs(pts1[:, 0])
        tri_m = jnp.clip(hit_args[1], 0)
        valid_m = hit_args[0] < N_RAYS * cfg.max_hits
        results["accum_s"] = timed(
            jax.jit(
                lambda d3, wt: mesh_accumulate_deformation(
                    trainer.cache_d, trainer.cache_w, d3, wt, tri_m,
                    valid_m, trainer.mesh_intersect.n_faces,
                )[0]
            ),
            pts1, w,
        )
    except _Done:
        pass
    finally:
        trainer.prefetcher.stop()

    # derived terms, for whichever groups ran (pieces measured in
    # separate processes merge by unioning the PARTIAL lines)
    derived = {}
    r = results
    if "full_s" in r and "grad_only_s" in r:
        derived["adam_glue_s"] = r["full_s"] - r["grad_only_s"]
    if "grad_only_s" in r and "fwd_only_s" in r:
        derived["bwd_s"] = r["grad_only_s"] - r["fwd_only_s"]
    if "quad_grad_s" in r:
        derived["quad_bwd_s"] = r["quad_grad_s"] - r["quad_fwd_s"]
    if "vol_grad_s" in r:
        derived["vol_bwd_s"] = r["vol_grad_s"] - r["vol_fwd_s"]
    if "full_s" in r:
        derived["rays_per_sec_device"] = N_RAYS / r["full_s"]
    import json

    print("PROFILE_STAGE4", json.dumps(
        {**{k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in results.items()},
         **{k: round(v, 4) for k, v in derived.items()}}
    ), flush=True)


if __name__ == "__main__":
    main()

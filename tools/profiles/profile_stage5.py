"""Decompose the stage-5 SG-fit step (VERDICT r4 weak #3: 265k rays/s
vs the 300k bar, and stage 5 never had a decomposition).

Contract shape: 2^17 rays x 25 hits, 6 SG lobes
(run_nerfsynthetic_fit_sg.sh:12), TPU-fast headline encoding for both
the SG field and the frozen teacher, packed 12 B/hit host transport —
exactly bench.bench_stage5's configuration.

Pieces (host-transfer-synced, median of 3 windows):
  full        trainer.train_one_step (prefetcher live) — the bench number
  step_jit    jitted step on STAGED inputs (no prefetcher/host glue)
  grad        value_and_grad (no adam)
  fwd         loss forward only
  sg_fwd      SG-field forward at the packed hit points (encode+decode)
  teacher_fwd frozen-teacher forward at the same points
  composite   packed_composite alone
  sg_bwd      d(sum sg rgb)/d(sg_params) — the table-gradient sort path

 => adam+glue ~ step_jit - grad; bwd ~ grad - fwd; host glue =
    full - step_jit.

Run (idle chip): python tools/profiles/profile_stage5.py [rays_log2]
"""
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
from quadraturefields_tpu.models.ngp import ngp_forward, ngp_init
from quadraturefields_tpu.render.quadrature import (
    packed_composite,
    packed_hits_from_host,
)
from quadraturefields_tpu.train.stage5_fit_sg import (
    Stage5Config,
    Stage5Trainer,
)

RAYS_LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 17
N_RAYS = 1 << RAYS_LOG2
REPS = int(os.environ.get("QF_S5_REPS", 8))
RESULTS = {}


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(name, fn, *args, n=REPS):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
          flush=True)
    ws = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        ws.append(time.perf_counter() - t0)
    ms = sorted(ws)[1] / n * 1e3
    RESULTS[name] = round(ms, 2)
    print(f"{name}: {ms:.2f} ms", flush=True)
    return out


def main():
    cfg = Stage5Config(
        scene_type="synthetic", init_batch_size=N_RAYS, scale=1.0,
        batch_size_log2=RAYS_LOG2 + 2,
        layout="cell", grad_payload="bf16factor",
        n_levels=8, n_features=4,
    )
    verts, faces = bench._bumpy_sphere(200)
    loader = bench._stage45_loader(N_RAYS)
    teacher = ngp_init(jax.random.PRNGKey(0), cfg.teacher_config())
    occ_state = bench._stage45_occ_state(cfg)
    trainer = Stage5Trainer(
        cfg, teacher_params=teacher, occ_state=occ_state,
        mesh=Mesh(verts, faces), train_dataset=loader,
    )
    try:
        trainer.train_one_step()  # compile
        ws = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(REPS):
                _, nh, _ = trainer.train_one_step()
            ws.append(time.perf_counter() - t0)
        full_ms = sorted(ws)[1] / REPS * 1e3
        RESULTS["full"] = round(full_ms, 2)
        print(f"full: {full_ms:.2f} ms ({N_RAYS / full_ms * 1e3:.0f} "
              f"rays/s, {nh} hits)", flush=True)

        # stage one packed batch
        batch, slots, tri, ts, total = trainer.prefetcher.next()
        from quadraturefields_tpu.utils.batching import snap_pack_cap
        B = snap_pack_cap(total, cfg.pack_cap)
        hit_args = (
            jnp.asarray(slots[:B]), jnp.asarray(tri[:B]),
            jnp.asarray(ts[:B]),
            jnp.asarray(np.int32(total)),
        )
        origins = jnp.asarray(batch["rays"].origins)
        viewdirs = jnp.asarray(batch["rays"].viewdirs)
        pixels = jnp.asarray(batch["pixels"])
        bkgd = jnp.asarray(batch["color_bkgd"])
        print(f"staged batch: {N_RAYS} rays, {total} hits, cap {B}",
              flush=True)
    finally:
        trainer.prefetcher.stop()

    step = jax.jit(trainer._train_step_impl)
    sg0, opt0 = trainer.sg_params, trainer.opt_state
    timeit("step_jit", lambda: step(
        sg0, opt0, origins, viewdirs, pixels, bkgd, hit_args))

    grad_fn = jax.jit(jax.value_and_grad(trainer._loss_fn, has_aux=True))
    timeit("grad", lambda: grad_fn(
        sg0, origins, viewdirs, pixels, bkgd, hit_args))

    fwd_fn = jax.jit(trainer._loss_fn)
    timeit("fwd", lambda: fwd_fn(
        sg0, origins, viewdirs, pixels, bkgd, hit_args))

    # primitive shapes: the packed stream's points
    ph = jax.jit(
        lambda s, t, tt, nv: packed_hits_from_host(
            s, t, tt, nv, n_rays=N_RAYS, max_hits=cfg.max_hits
        )
    )(*hit_args)
    ray = jnp.clip(ph.ray_indices, 0, N_RAYS - 1)
    d = viewdirs[ray]
    xyz = origins[ray] + d * ph.ts[:, None]
    aabb = jnp.asarray(cfg.aabb)

    sg_fwd = jax.jit(lambda p, x, dd: ngp_forward(
        p, x, dd, aabb, trainer.sg_cfg))
    timeit("sg_fwd", sg_fwd, sg0, xyz, d)

    t_fwd = jax.jit(lambda p, x, dd: ngp_forward(
        p, x, dd, aabb, trainer.teacher_cfg))
    out_t = timeit("teacher_fwd", t_fwd, teacher, xyz, d)
    sigmas = out_t[1][..., 0]

    rgbs = sg_fwd(sg0, xyz, d)[0]
    comp_fn = jax.jit(lambda rg, sg: packed_composite(
        ph.ray_indices, rg, sg, ph.ts, ph.valid, N_RAYS,
        cfg.eff_render_step_size, "white", None))
    timeit("composite", comp_fn, rgbs, sigmas)

    sg_bwd = jax.jit(jax.grad(
        lambda p, x, dd: jnp.sum(ngp_forward(p, x, dd, aabb,
                                             trainer.sg_cfg)[0]),
    ))
    timeit("sg_bwd", sg_bwd, sg0, xyz, d)

    print("PROFILE_STAGE5 " + str(RESULTS), flush=True)


if __name__ == "__main__":
    main()

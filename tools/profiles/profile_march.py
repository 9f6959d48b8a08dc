"""Decompose the two-level march's 63 ms at bench scale.

Components timed separately (each jitted, host-transfer synced):
  coarse occupancy lookup  [8192 x 260] from the dilated 32^3 grid
  coarse compact           lax.sort of 2.13M i32 keys -> 262k
  fine occupancy lookup    [262k x 4] from the 128^3 grid
  fine compact             lax.sort of 1.05M keys -> 262k
  per-hit row gathers      t_min/origins/viewdirs indexed by ray_c
  full march               occ_grid_sampling as shipped

Run (idle chip): python tools/profiles/profile_march.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("QF_FORCE_CPU"):  # correctness smoke off-chip
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/qf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from quadraturefields_tpu.data.fixture import FixtureScene
from quadraturefields_tpu.ops.grid import (
    OccGridConfig,
    _dilated_coarse_binaries,
    compact_indices,
    max_march_steps,
    occ_grid_init,
    occ_grid_sampling,
    occupancy_lookup,
)

aabb = jnp.asarray([-1.5] * 3 + [1.5] * 3)
step = 5e-3
max_steps = max_march_steps(np.asarray(aabb), step)
budget = 1 << 18
occ_cfg = OccGridConfig(resolution=128)
occ_state = occ_grid_init(aabb, occ_cfg)

scene = FixtureScene()
res = 128
grid = np.stack(
    np.meshgrid(*([np.linspace(-1.5, 1.5, res)] * 3), indexing="ij"),
    axis=-1,
).reshape(-1, 3)
occs = scene.sigma(grid).astype(np.float32) * step
binaries = (occs > 0.01).reshape(res, res, res)
occ_state = occ_state._replace(
    occs=jnp.asarray(occs), binaries=jnp.asarray(binaries)
)

n_rays = 8192
rng = np.random.default_rng(0)
theta = rng.uniform(0, 2 * np.pi, n_rays)
phi = rng.uniform(0.5, 2.6, n_rays)
eye = np.stack(
    [4 * np.cos(theta) * np.sin(phi), 4 * np.sin(theta) * np.sin(phi),
     4 * np.cos(phi)], axis=-1).astype(np.float32)
target = rng.uniform(-0.3, 0.3, (n_rays, 3)).astype(np.float32)
d = target - eye
d /= np.linalg.norm(d, axis=1, keepdims=True)
o = jnp.asarray(eye)
dirs = jnp.asarray(d)


def timeit(name, fn, *args, iters=20):
    r = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(np.asarray(x).reshape(-1)[0]), r
    )
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    s = sum(
        float(np.asarray(x).reshape(-1)[0].astype(np.float32))
        for x in jax.tree_util.tree_leaves(r)
    )
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:8.2f} ms   (sync {s:.3g})", flush=True)
    return dt


cf = 4
coarse_steps = -(-max_steps // cf)
print(f"max_steps={max_steps} coarse_steps={coarse_steps} "
      f"n_rays={n_rays} budget={budget}", flush=True)

from quadraturefields_tpu.ops.grid import ray_aabb_intersect


@jax.jit
def full_march(state, o, dirs):
    ps = occ_grid_sampling(
        state, o, dirs, render_step_size=step, max_steps=max_steps,
        max_samples_total=budget, coarse_factor=4,
        max_coarse_hits=budget,
    )
    return (ps.ray_indices.sum(), ps.t_starts.sum(), ps.t_ends.sum(),
            ps.num_valid)


@jax.jit
def coarse_occ(state, o, dirs):
    t_min, t_max, _ = ray_aabb_intersect(o, dirs, state.aabb)
    steps_c = jnp.arange(coarse_steps, dtype=jnp.float32)
    seg_mid = t_min[:, None] + (steps_c[None, :] + 0.5) * (cf * step)
    seg_mid = jnp.minimum(seg_mid, t_max[:, None] - 0.25 * step)
    pos_c = o[:, None, :] + dirs[:, None, :] * seg_mid[..., None]
    cb = _dilated_coarse_binaries(state.binaries, cf)
    occ_c = occupancy_lookup(cb, state.aabb, pos_c)
    in_span = (t_min[:, None] + steps_c[None, :] * (cf * step)
               < t_max[:, None])
    return (occ_c & in_span).sum()


@jax.jit
def dilate_only(state):
    return _dilated_coarse_binaries(state.binaries, cf).sum()


@jax.jit
def coarse_sort(mask_flat):
    return compact_indices(mask_flat, budget).sum()


@jax.jit
def fine_occ(state, pos_f):
    return occupancy_lookup(state.binaries, state.aabb, pos_f).sum()


@jax.jit
def fine_sort(mask_flat):
    return compact_indices(mask_flat, budget).sum()


timeit("full march (shipped)", full_march, occ_state, o, dirs)
timeit("dilate coarse binaries", dilate_only, occ_state)
timeit("coarse: pos math + occ lookup (2.13M)", coarse_occ, occ_state,
       o, dirs)
mask_c = np.zeros(n_rays * coarse_steps, bool)
mask_c[rng.choice(mask_c.size, 400_000, replace=False)] = True
timeit("coarse compact (sort 2.13M keys)", coarse_sort,
       jnp.asarray(mask_c))
pos_f = jnp.asarray(
    rng.uniform(-1.4, 1.4, (budget, cf, 3)).astype(np.float32)
)
timeit("fine: occ lookup (1.05M)", fine_occ, occ_state, pos_f)
mask_f = np.zeros(budget * cf, bool)
mask_f[rng.choice(mask_f.size, 262_144, replace=False)] = True
timeit("fine compact (sort 1.05M keys)", fine_sort, jnp.asarray(mask_f))

# strided coarse probe sweep: stride decoupled from cf — ~stride/cf x
# fewer coarse gathers + a smaller coarse compaction, identical sample
# set (grid.py _two_level_march docstring)
import functools

from quadraturefields_tpu.ops.grid import resolve_coarse_stride


@functools.partial(jax.jit, static_argnums=(3, 4))
def strided_march(state, o, dirs, stride, dil):
    ps = occ_grid_sampling(
        state, o, dirs, render_step_size=step, max_steps=max_steps,
        max_samples_total=budget, coarse_factor=4,
        coarse_stride=stride, coarse_dilation=dil,
    )
    return (ps.ray_indices.sum(), ps.t_starts.sum(), ps.t_ends.sum(),
            ps.num_valid)


for s in (8, 16, 18, 24, 32):
    dil = resolve_coarse_stride(s, np.asarray(aabb), 128, 4, step)[1]
    timeit(f"full march, stride={s} dil={dil}", strided_march,
           occ_state, o, dirs, s, dil)

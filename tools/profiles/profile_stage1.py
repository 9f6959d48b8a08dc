"""Micro-profile of stage-1 train step components on the TPU.

SUPERSEDED by tools/profile_r3.py: this script's timeit syncs with
jax.block_until_ready, which is a NO-OP on the axon remote platform
(bench.py header) — its numbers under-report. Kept only for the
round-1 measurement history referenced in PERF_NOTES.md.
"""
import sys, time
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from quadraturefields_tpu.models.ngp import (
    NGPConfig, ngp_init, ngp_forward,
)
from quadraturefields_tpu.ops.grid import (
    OccGridConfig, occ_grid_init, occ_grid_sampling, max_march_steps,
)
from quadraturefields_tpu.ops.hashgrid import hashgrid_encode
from quadraturefields_tpu.render.renderer import (
    RenderConfig, render_rays_occgrid,
)

WHICH = set(sys.argv[1:]) or {"encode", "grad", "march", "full"}

def timeit(name, fn, *args, n=20):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1e3:.2f} ms", flush=True)

aabb = jnp.asarray([-1.5] * 3 + [1.5] * 3)
cfg = NGPConfig(head="sg", num_g_lobes=2, log2_hashmap_size=19, interp="tet")
key = jax.random.PRNGKey(0)
params = ngp_init(key, cfg)
occ_state = occ_grid_init(aabb, OccGridConfig(resolution=128))
step = 5e-3
max_steps = max_march_steps(np.asarray(aabb), step)
S = 1 << 18
rcfg = RenderConfig(render_step_size=step, max_steps=max_steps,
                    max_samples_total=S)
n_rays = 8192
rng = np.random.default_rng(0)
o = jnp.asarray(np.tile([[0, 0, -4.0]], (n_rays, 1)).astype(np.float32))
d = rng.normal(size=(n_rays, 3)) * 0.2 + [0, 0, 1]
d = jnp.asarray((d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32))
x = jax.random.uniform(key, (S, 3), minval=-1.0, maxval=1.0)
dirs = jnp.tile(jnp.asarray([[0.0, 0, 1]]), (S, 1))

if "encode" in WHICH:
    enc = jax.jit(lambda t, p: hashgrid_encode(t, p, cfg.hashgrid))
    timeit("hash_encode_262k", enc, params["table"], (x + 1.5) / 3.0)

if "grad" in WHICH:
    def loss(pr, xx, dd):
        rgb, sig = ngp_forward(pr, xx, dd, aabb, cfg)
        return jnp.sum(rgb) + jnp.sum(sig)
    g = jax.jit(jax.grad(loss))
    timeit("ngp_fwd_grad_262k", g, params, x, dirs)

if "march" in WHICH:
    samp = jax.jit(lambda os_, oo, dd: occ_grid_sampling(
        os_, oo, dd, render_step_size=step, max_steps=max_steps,
        max_samples_total=S))
    timeit("occ_march_8192x1040", samp, occ_state, o, d)

if "full" in WHICH:
    def train_loss(pr, os_, oo, dd):
        res = render_rays_occgrid(pr, aabb, cfg, os_, oo, dd, rcfg,
                                  render_bkgd=jnp.ones(3))
        return jnp.sum(res.rgb)
    gtrain = jax.jit(jax.grad(train_loss))
    timeit("render_grad_full", gtrain, params, occ_state, o, d)

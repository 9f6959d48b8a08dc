"""Decompose the stage-1 step's ~40 ms 'compose/glue/adam' residual.

PERF_NOTES' round-2 accounting pins encode fwd/bwd, march, occ refresh
and MLPs, leaving ~40 ms unattributed. This times, at the round-3
headline config (layout=cell; argv selects [L F PAYLOAD], default
8 4 bf16factor; QF_GLUE_PAYLOAD overrides PAYLOAD when only L F are
passed positionally):

  full       jitted train step (value_and_grad + adam, donated)
  grad_only  value_and_grad without the optimizer
  fwd_only   loss value only (render fwd + loss)
  adam_only  optimizer.update + apply_updates on captured grads
  march      occ_grid_sampling alone

 =>  adam ≈ full − grad_only, bwd ≈ grad_only − fwd_only,
     compose_fwd ≈ fwd_only − march − encode/mlp fwd (profile_r3).

Run (idle chip): python tools/profiles/profile_glue.py [L F PAYLOAD]
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("QF_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/qf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np
import optax

from quadraturefields_tpu.data.fixture import FixtureScene
from quadraturefields_tpu.models.ngp import NGPConfig, ngp_init
from quadraturefields_tpu.ops.grid import (
    OccGridConfig,
    max_march_steps,
    occ_grid_init,
    occ_grid_sampling,
)
from quadraturefields_tpu.render.renderer import (
    RenderConfig,
    render_rays_occgrid,
)
from quadraturefields_tpu.utils.metrics import smooth_l1_loss
from quadraturefields_tpu.utils.optim import make_ngp_optimizer

L = int(sys.argv[1]) if len(sys.argv) > 2 else 8
F = int(sys.argv[2]) if len(sys.argv) > 2 else 4
PAYLOAD = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
    "QF_GLUE_PAYLOAD", "bf16factor")

aabb = jnp.asarray([-1.5] * 3 + [1.5] * 3)
ngp_cfg = NGPConfig(
    head="sg", num_g_lobes=2, log2_hashmap_size=19, interp="tet",
    layout="cell", grad_payload=PAYLOAD, n_levels=L, n_features=F,
)
step_size = 5e-3
max_steps = max_march_steps(np.asarray(aabb), step_size)
S = 1 << 18
from quadraturefields_tpu.ops.grid import resolve_coarse_stride

_stride_env = int(os.environ.get("QF_COARSE_STRIDE", "-1"))
_stride, _dil = resolve_coarse_stride(
    _stride_env, np.asarray(aabb), 128, 4, step_size
)
rcfg = RenderConfig(
    render_step_size=step_size, max_steps=max_steps,
    max_samples_total=S, coarse_factor=4,
    coarse_stride=_stride, coarse_dilation=_dil,
)
key = jax.random.PRNGKey(0)
params = ngp_init(key, ngp_cfg)
optimizer = make_ngp_optimizer(max_steps=20000)
opt_state = optimizer.init(params)

occ_state = occ_grid_init(aabb, OccGridConfig(resolution=128))
scene = FixtureScene()
res = 128
grid = np.stack(
    np.meshgrid(*([np.linspace(-1.5, 1.5, res)] * 3), indexing="ij"),
    axis=-1,
).reshape(-1, 3)
occs = scene.sigma(grid).astype(np.float32) * step_size
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
dd = target - eye
dd /= np.linalg.norm(dd, axis=1, keepdims=True)
o = jnp.asarray(eye)
d = jnp.asarray(dd.astype(np.float32))
pix = jnp.asarray(rng.random((n_rays, 3)).astype(np.float32))


def loss_fn(params, occ_state, origins, viewdirs, pixels, k):
    result = render_rays_occgrid(
        params, aabb, ngp_cfg, occ_state, origins, viewdirs, rcfg,
        render_bkgd=jnp.ones(3), stratified=True, key=k,
    )
    acc = result.opacity[:, 0]
    reg = (1e-3 * (-acc * jnp.log(acc + 1e-10))).mean()
    return smooth_l1_loss(result.rgb, pixels) + reg


def timeit(name, fn, *args, n=12):
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:12s} {dt:8.2f} ms  (sync {s:.4g})", flush=True)
    return dt


grad_fn = jax.jit(jax.value_and_grad(loss_fn))
_, grads0 = grad_fn(params, occ_state, o, d, pix, key)


@jax.jit
def adam_only(grads, opt_state, params):
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state


@functools.partial(jax.jit, donate_argnums=(0, 1))
def full_step(params, opt_state, occ_state, o, d, pix, k):
    loss, grads = jax.value_and_grad(loss_fn)(
        params, occ_state, o, d, pix, k
    )
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


@jax.jit
def march_only(occ_state, o, d):
    ps = occ_grid_sampling(
        occ_state, o, d, render_step_size=step_size, max_steps=max_steps,
        max_samples_total=S, coarse_factor=4,
        coarse_stride=_stride, coarse_dilation=_dil,
    )
    return ps.t_starts.sum()


print(f"config: cell L={L} F={F} {PAYLOAD}, S=2^18", flush=True)
t_march = timeit("march", march_only, occ_state, o, d)
t_fwd = timeit("fwd_only", jax.jit(loss_fn), params, occ_state, o, d,
               pix, key)
t_grad = timeit("grad_only", grad_fn, params, occ_state, o, d, pix, key)
t_adam = timeit("adam_only", adam_only, grads0, opt_state, params)
# full_step donates params/opt_state: re-feed outputs each iter
p2, s2 = params, opt_state
t0 = time.perf_counter()
p2, s2, loss = full_step(p2, s2, occ_state, o, d, pix, key)
print(f"full: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _ in range(12):
    p2, s2, loss = full_step(p2, s2, occ_state, o, d, pix, key)
float(loss)
t_full = (time.perf_counter() - t0) / 12 * 1e3
print(f"{'full':12s} {t_full:8.2f} ms", flush=True)
print(
    f"residuals: adam-in-step ~ {t_full - t_grad:.1f} ms, "
    f"bwd ~ {t_grad - t_fwd:.1f} ms, "
    f"compose_fwd+loss ~ fwd_only - march - encode/mlp fwd "
    f"(profile_r3) = {t_fwd - t_march:.1f} ms - encode_fwd", flush=True)

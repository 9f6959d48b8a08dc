"""Full stage-1 train-step breakdown with REAL synchronization.

block_until_ready does not block on the axon platform; every timing
here materializes a scalar with float(). Components measured separately
(each in its own jit) and composed.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from quadraturefields_tpu.data.fixture import FixtureScene
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
from quadraturefields_tpu.utils.metrics import smooth_l1_loss
from quadraturefields_tpu.utils.optim import make_ngp_optimizer
import optax


def bench(name, fn, batches, iters=5):
    float(fn(*batches[0]))
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(*batches[(i + 1) % len(batches)]))
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"{name}: {med*1e3:.1f} ms", flush=True)
    return med


aabb = jnp.asarray([-1.5] * 3 + [1.5] * 3)
ngp_cfg = NGPConfig(head="sg", num_g_lobes=2, log2_hashmap_size=19,
                    interp="tet")
step_size = 5e-3
rcfg = RenderConfig(
    render_step_size=step_size,
    max_steps=max_march_steps(np.asarray(aabb), step_size),
    max_samples_total=1 << 18,
    coarse_factor=4,
)
occ_cfg = OccGridConfig(resolution=128)

key = jax.random.PRNGKey(0)
params = ngp_init(key, ngp_cfg)
occ_state = occ_grid_init(aabb, occ_cfg)
optimizer = make_ngp_optimizer(max_steps=20000)
opt_state = optimizer.init(params)

scene = FixtureScene()
res = occ_cfg.resolution
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


def make_batch(seed):
    rng = np.random.default_rng(seed)
    theta = rng.uniform(0, 2 * np.pi, n_rays)
    phi = rng.uniform(0.5, 2.6, n_rays)
    eye = np.stack([
        4 * np.cos(theta) * np.sin(phi),
        4 * np.sin(theta) * np.sin(phi),
        4 * np.cos(phi),
    ], axis=-1).astype(np.float32)
    target = rng.uniform(-0.3, 0.3, (n_rays, 3)).astype(np.float32)
    d = target - eye
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pix = rng.random((n_rays, 3)).astype(np.float32)
    return jnp.asarray(eye), jnp.asarray(d), jnp.asarray(pix)


batches = [make_batch(i) for i in range(4)]

# ---------------- march only
@jax.jit
def march_only(o, d, p):
    s = occ_grid_sampling(
        occ_state, o, d, render_step_size=step_size,
        max_steps=rcfg.max_steps, max_samples_total=rcfg.max_samples_total,
        coarse_factor=4,
    )
    return jnp.sum(s.t_starts[::64]) + s.num_valid


m_march = bench("march (two-level cf=4)", march_only, batches)

@jax.jit
def march_only1(o, d, p):
    s = occ_grid_sampling(
        occ_state, o, d, render_step_size=step_size,
        max_steps=rcfg.max_steps, max_samples_total=rcfg.max_samples_total,
        coarse_factor=0,
    )
    return jnp.sum(s.t_starts[::64]) + s.num_valid


bench("march (single-level)", march_only1, batches)

# ---------------- forward render
@jax.jit
def fwd(o, d, p):
    r = render_rays_occgrid(
        params, aabb, ngp_cfg, occ_state, o, d, rcfg,
        render_bkgd=jnp.ones(3),
    )
    return jnp.sum(r.rgb[::8])


bench("render fwd (march+encode+mlp+composite)", fwd, batches)

# ---------------- encode fwd only (positions fixed)
pos = jax.random.uniform(jax.random.PRNGKey(5), (1 << 18, 3))
pos_batches = [(jax.random.uniform(jax.random.PRNGKey(i), (1 << 18, 3)),)
               for i in range(3)]


@jax.jit
def enc(x):
    return jnp.sum(hashgrid_encode(params["table"], x,
                                   ngp_cfg.hashgrid)[::16])


bench("encode fwd 262k", enc, pos_batches)


@jax.jit
def enc_bwd(x):
    def f(t):
        return jnp.sum(hashgrid_encode(t, x, ngp_cfg.hashgrid))
    g = jax.grad(f)(params["table"])
    return jnp.sum(g[::128])


bench("encode fwd+bwd 262k (exact scatter)", enc_bwd, pos_batches)

# ---------------- full train step
def loss_fn(params, o, d, p, k):
    r = render_rays_occgrid(
        params, aabb, ngp_cfg, occ_state, o, d, rcfg,
        render_bkgd=jnp.ones(3), stratified=True, key=k,
    )
    acc = r.opacity[:, 0]
    reg = (1e-3 * (-acc * jnp.log(acc + 1e-10))).mean()
    return smooth_l1_loss(r.rgb, p) + reg


@jax.jit
def train_step(params, opt_state, o, d, p, k):
    loss, grads = jax.value_and_grad(loss_fn)(params, o, d, p, k)
    updates, opt_state2 = optimizer.update(grads, opt_state, params)
    params2 = optax.apply_updates(params, updates)
    return loss + jnp.sum(params2["table"][::4096]) * 0.0, params2, opt_state2


def step_fn(o, d, p):
    out, _, _ = train_step(params, opt_state, o, d, p, key)
    return out


m_step = bench("FULL train step (exact)", step_fn, batches)
print(f"samples/s at 2^18: {(1<<18)/m_step:,.0f}", flush=True)

"""Round-3 component profile of the stage-1 step on the TPU.

Every timed window ends in a host transfer (float of a scalar
reduction) — jax.block_until_ready does NOT synchronize under the
axon remote platform (see bench.py header).
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
from quadraturefields_tpu.ops.hashgrid import (
    hashgrid_encode, _corner_indices_weights,
)
from quadraturefields_tpu.render.renderer import (
    RenderConfig, render_rays_occgrid,
)

WHICH = set(sys.argv[1:]) or {
    "march", "idxw", "gather", "encode", "encode_bwd", "mlp", "full",
    "full_nograd",
}

def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0]))


def timeit(name, fn, *args, n=10):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = _sync(out)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1e3:.2f} ms", flush=True)

aabb = jnp.asarray([-1.5] * 3 + [1.5] * 3)
cfg = NGPConfig(head="sg", num_g_lobes=2, log2_hashmap_size=19,
                interp="tet")
key = jax.random.PRNGKey(0)
params = ngp_init(key, cfg)
step = 5e-3
max_steps = max_march_steps(np.asarray(aabb), step)
S = 1 << 18
rcfg = RenderConfig(render_step_size=step, max_steps=max_steps,
                    max_samples_total=S, coarse_factor=4)
n_rays = 8192

# realistic occupancy: fixture-like sphere, ~2% cells
from quadraturefields_tpu.data.fixture import FixtureScene
occ_state = occ_grid_init(aabb, OccGridConfig(resolution=128))
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

rng = np.random.default_rng(0)
theta = rng.uniform(0, 2 * np.pi, n_rays)
phi = rng.uniform(0.5, 2.6, n_rays)
eye = np.stack([4 * np.cos(theta) * np.sin(phi),
                4 * np.sin(theta) * np.sin(phi),
                4 * np.cos(phi)], -1).astype(np.float32)
target = rng.uniform(-0.3, 0.3, (n_rays, 3)).astype(np.float32)
dd = target - eye
dd /= np.linalg.norm(dd, axis=1, keepdims=True)
o, d = jnp.asarray(eye), jnp.asarray(dd.astype(np.float32))

x = jax.random.uniform(key, (S, 3), minval=0.0, maxval=1.0)
dirs = jnp.tile(jnp.asarray([[0.0, 0, 1]]), (S, 1))
hcfg = cfg.hashgrid

if "march" in WHICH:
    samp = jax.jit(lambda os_, oo, ddd: occ_grid_sampling(
        os_, oo, ddd, render_step_size=step, max_steps=max_steps,
        max_samples_total=S, coarse_factor=4).t_starts)
    timeit("march_2level", samp, occ_state, o, d)

if "idxw" in WHICH:
    f = jax.jit(lambda xx: _corner_indices_weights(xx, hcfg)[1])
    timeit("idx_weights_vectormath", f, x)

if "gather" in WHICH:
    idx, w = jax.jit(
        lambda xx: _corner_indices_weights(xx, hcfg)
    )(x)
    idx = jax.device_put(idx)
    def g(table, ii):
        outs = []
        C = hcfg.corners
        for l in range(hcfg.n_levels):
            outs.append(table[ii[:, l * C:(l + 1) * C]])
        return sum(jnp.sum(oo) for oo in outs)
    timeit("fwd_gather_16.8M", jax.jit(g), params["table"], idx)

if "encode" in WHICH:
    enc = jax.jit(lambda t, p: hashgrid_encode(t, p, hcfg))
    timeit("encode_fwd", enc, params["table"], x)

if "encode_bwd" in WHICH:
    def eb(t, p):
        return jnp.sum(hashgrid_encode(t, p, hcfg))
    timeit("encode_fwd+bwd", jax.jit(jax.grad(eb)), params["table"], x)

if "mlp" in WHICH:
    def loss(pr, xx, ddd):
        rgb, sig = ngp_forward(pr, xx, ddd, aabb, cfg)
        return jnp.sum(rgb) + jnp.sum(sig)
    timeit("ngp_fwd+bwd (encode+mlp+sg)", jax.jit(jax.grad(loss)),
           params, x * 3.0 - 1.5, dirs)

if "full_nograd" in WHICH:
    def fwd_only(pr, os_, oo, ddd):
        res = render_rays_occgrid(pr, aabb, cfg, os_, oo, ddd, rcfg,
                                  render_bkgd=jnp.ones(3))
        return res.rgb
    timeit("render_fwd_only", jax.jit(fwd_only), params, occ_state, o, d)

if "full" in WHICH:
    def train_loss(pr, os_, oo, ddd):
        res = render_rays_occgrid(pr, aabb, cfg, os_, oo, ddd, rcfg,
                                  render_bkgd=jnp.ones(3))
        return jnp.sum(res.rgb)
    gtrain = jax.jit(jax.grad(train_loss))
    def run(pr, os_, oo, ddd):
        return gtrain(pr, os_, oo, ddd)["table"]
    timeit("render_fwd+bwd", run, params, occ_state, o, d)

"""Cell-layout encoding profile on the TPU (round-3 redesign).

Compares layout="corner" (tcnn-parity, interp=tet, grad=sorted) against
layout="cell" (one gather per level, sorted-row MXU gradient) at bench
scale: encode fwd, encode fwd+bwd, and the full stage-1 render step.

Timing discipline: every window ends in a host transfer (bench.py
header — block_until_ready does not sync under axon).

Usage: python tools/profile_cell.py [encode encode_bwd full ...]
"""
import sys, time
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from quadraturefields_tpu.models.ngp import NGPConfig, ngp_init
from quadraturefields_tpu.ops.grid import (
    OccGridConfig, occ_grid_init, max_march_steps,
)
from quadraturefields_tpu.ops.hashgrid import hashgrid_encode
from quadraturefields_tpu.render.renderer import (
    RenderConfig, render_rays_occgrid,
)

WHICH = set(sys.argv[1:]) or {"encode", "encode_bwd", "full"}

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
CFGS = {
    "corner_tet": NGPConfig(head="sg", num_g_lobes=2,
                            log2_hashmap_size=19, interp="tet"),
    "cell": NGPConfig(head="sg", num_g_lobes=2, log2_hashmap_size=19,
                      interp="cube", layout="cell"),
}
key = jax.random.PRNGKey(0)
step = 5e-3
max_steps = max_march_steps(np.asarray(aabb), step)
S = 1 << 18
rcfg = RenderConfig(render_step_size=step, max_steps=max_steps,
                    max_samples_total=S, coarse_factor=4)
n_rays = 8192

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

for name, cfg in CFGS.items():
    params = ngp_init(key, cfg)
    hcfg = cfg.hashgrid
    print(f"--- {name}: table {params['table'].shape} "
          f"({params['table'].size/1e6:.1f}M params)", flush=True)

    if "encode" in WHICH:
        enc = jax.jit(lambda t, p, c=hcfg: hashgrid_encode(t, p, c))
        timeit(f"{name} encode_fwd", enc, params["table"], x)

    if "encode_bwd" in WHICH:
        def eb(t, p, c=hcfg):
            return jnp.sum(hashgrid_encode(t, p, c))
        timeit(f"{name} encode_fwd+bwd", jax.jit(jax.grad(eb)),
               params["table"], x)

    if "full" in WHICH:
        def train_loss(pr, os_, oo, ddd, c=cfg):
            r = render_rays_occgrid(pr, aabb, c, os_, oo, ddd, rcfg,
                                    render_bkgd=jnp.ones(3))
            return jnp.sum(r.rgb)
        gtrain = jax.jit(jax.grad(train_loss))
        def run(pr, os_, oo, ddd, g=gtrain):
            return g(pr, os_, oo, ddd)["table"]
        timeit(f"{name} render_fwd+bwd", run, params, occ_state, o, d)

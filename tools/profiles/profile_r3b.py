"""Bisect the 130 ms (mlp+sg fwd+bwd) - (encode fwd+bwd) gap."""
import sys, time
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from quadraturefields_tpu.models.ngp import (
    NGPConfig, ngp_init, ngp_forward, ngp_query_density, ngp_head_apply,
)
from quadraturefields_tpu.ops.hashgrid import hashgrid_encode
from quadraturefields_tpu.ops.mlp import mlp_apply


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
S = 1 << 18
x01 = jax.random.uniform(key, (S, 3))
xw = x01 * 3.0 - 1.5
dirs = jnp.tile(jnp.asarray([[0.0, 0, 1]]), (S, 1))
hcfg = cfg.hashgrid
cvec = jax.random.normal(jax.random.PRNGKey(1), (S, hcfg.output_dim))

WHICH = set(sys.argv[1:]) or {"base", "mlps"}

if "realg" in WHICH:
    # encode fwd+bwd with NON-constant cotangent (g=cvec, not ones)
    def enc_w(t):
        return jnp.sum(hashgrid_encode(t, x01, hcfg) * cvec)
    timeit("encode_fwd+bwd_realg", jax.jit(jax.grad(enc_w)),
           params["table"])

if "base" in WHICH:
    # encode + base MLP (density only)
    def dens(pr):
        return jnp.sum(ngp_query_density(pr, xw, aabb, cfg))
    timeit("encode+base_fwd+bwd", jax.jit(jax.grad(dens)), params)

if "mlps" in WHICH:
    # base+head MLPs alone on a fixed embedding (no encode)
    h_const = jax.random.normal(
        jax.random.PRNGKey(2), (S, hcfg.output_dim)
    )
    def mlps(pr):
        out = mlp_apply(
            pr["mlp_base"], h_const, compute_dtype=cfg._cdtype
        )
        emb = out[..., 1:]
        rgb = ngp_head_apply(pr, emb, dirs, cfg)
        return jnp.sum(rgb) + jnp.sum(out[..., :1])
    timeit("mlps+sg_only_fwd+bwd", jax.jit(jax.grad(mlps)), params)

if "full" in WHICH:
    def loss(pr):
        rgb, sig = ngp_forward(pr, xw, dirs, aabb, cfg)
        return jnp.sum(rgb) + jnp.sum(sig)
    timeit("ngp_full_fwd+bwd", jax.jit(jax.grad(loss)), params)

"""Split the real-cotangent encode backward: prep vs sort vs kernel.

Cases:
  sortf32   — lax.sort (u32 key, f32, f32) at 16.8M
  sortpk    — lax.sort (u32 key, u32 packed-bf16 pair) at 16.8M
  prep_t    — current prep: [N,LC]->[L,C,N] transposes + mults
  prep_flat — transpose-free prep: lane-repeat g + mults in [N,LC]
  kernel    — sorted_table_grad on presorted data (kernel only)
"""
import sys, time
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from quadraturefields_tpu.ops.hashgrid_sorted import sorted_table_grad

WHICH = set(sys.argv[1:]) or {"sortf32", "sortpk", "prep_t", "prep_flat"}

def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0][..., :1].astype(jnp.float32)))

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

N = 1 << 18
L, C, F = 16, 4, 2
M = N * L * C
T = 16 * (1 << 19)
key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (N, L * C), 0, T, dtype=jnp.int32)
w = jax.random.uniform(jax.random.PRNGKey(1), (N, L * C))
g = jax.random.normal(jax.random.PRNGKey(2), (N, L * F))

if "sortf32" in WHICH:
    def s3(ii, v0, v1):
        return jax.lax.sort(
            (ii.reshape(-1).astype(jnp.uint32), v0.reshape(-1),
             v1.reshape(-1)), num_keys=1,
        )[0]
    timeit("sort_u32_f32_f32_16.8M", jax.jit(s3), idx, w, w)

if "sortpk" in WHICH:
    def spk(ii, v0, v1):
        p0 = jax.lax.bitcast_convert_type(
            v0.reshape(-1).astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        p1 = jax.lax.bitcast_convert_type(
            v1.reshape(-1).astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        packed = (p0 << 16) | p1
        return jax.lax.sort(
            (ii.reshape(-1).astype(jnp.uint32), packed), num_keys=1
        )[0]
    timeit("sort_u32_packedbf16_16.8M", jax.jit(spk), idx, w, w)

if "prep_t" in WHICH:
    def pt(ww, gg, ii):
        w_t = ww.T.reshape(L, C, N)
        g_t = gg.astype(jnp.float32).T.reshape(L, F, N)
        idx_t = ii.T.reshape(L, C, N)
        v0 = (w_t * g_t[:, 0:1, :]).reshape(-1)
        v1 = (w_t * g_t[:, 1:2, :]).reshape(-1)
        return v0 + v1 + idx_t.reshape(-1)
    timeit("prep_transposed", jax.jit(pt), w, g, idx)

if "prep_flat" in WHICH:
    def pf(ww, gg, ii):
        g0 = jnp.repeat(gg[:, 0::F], C, axis=1)  # [N, L*C]
        g1 = jnp.repeat(gg[:, 1::F], C, axis=1)
        v0 = (ww * g0).reshape(-1)
        v1 = (ww * g1).reshape(-1)
        return v0 + v1 + ii.reshape(-1)
    timeit("prep_flat", jax.jit(pf), w, g, idx)

if "kernel" in WHICH:
    ii, v0, v1 = jax.jit(
        lambda a, b, c: jax.lax.sort(
            (a.reshape(-1).astype(jnp.uint32), b.reshape(-1),
             c.reshape(-1)), num_keys=1)
    )(idx, w, w)
    def k(a, b, c):
        return sorted_table_grad(a.astype(jnp.int32), b, c, T)
    timeit("windowed_kernel_presorted", jax.jit(k), ii, v0, v1)

if "e2e" in WHICH:
    def e2e(ww, gg, ii):
        g0 = jnp.repeat(gg[:, 0::F], C, axis=1)
        g1 = jnp.repeat(gg[:, 1::F], C, axis=1)
        return sorted_table_grad(
            ii.reshape(-1), (ww * g0).reshape(-1),
            (ww * g1).reshape(-1), T,
        )
    timeit("bwd_flatprep+sort+kernel", jax.jit(e2e), w, g, idx)

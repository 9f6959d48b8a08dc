"""Probe: level-batched backward sort for the cell-layout encoding.

The bf16pair backward sorts a [M] contribution stream (1 u32 key +
pw u32 payload operands) with keys = level_offset[l] + hash. Keys are
level-disjoint and increasing, so sorting each level independently and
concatenating level-major IS a global sort — and a batched
lax.sort([L, M/L], dimension=1) has comparator depth log2(M/L)^2
instead of log2(M)^2 (~1.4x fewer compare-exchange stages at L=8,
M=2.1M).

Measures (relative numbers decide go/no-go; run interleaved):
  flat9   — the shipped 9-operand flat sort of [M]
  batch9  — the same operands reshaped [L, M/L], sorted on axis=1
  tpose   — cost of building level-major payloads from the bwd's
            point-major [n*L, pw] arrays (the price batch9 pays)

Usage: python tools/profiles/profile_levelsort.py [n_levels [n_iters]]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/qf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

L = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_IT = int(sys.argv[2]) if len(sys.argv) > 2 else 20
N = 1 << 18                 # samples/step (bench scale)
M = N * L                   # contributions
PW = 8                      # u32 payload operands (bf16pair at F=4)
SIZE = 1 << 16              # entries per level (L8F4 equal-budget)

key = jax.random.PRNGKey(0)
# point-major keys as the real bwd builds them: idx[n, l]
within = jax.random.randint(key, (N, L), 0, SIZE, jnp.int32)
offs = jnp.arange(L, dtype=jnp.int32) * SIZE
idx_nl = within + offs[None, :]                      # [N, L]
pay_nl = jax.random.randint(
    jax.random.PRNGKey(1), (N * L, PW), 0, 1 << 30, jnp.int32
).astype(jnp.uint32)                                 # point-major [nL, PW]


def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0][..., :1].astype(jnp.float32)))


def timeit(name, fn, *args, n=N_IT):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)


@jax.jit
def flat9(idx, pay):
    ops = (idx.reshape(-1).astype(jnp.uint32),) + tuple(
        pay[:, c] for c in range(PW)
    )
    return jax.lax.sort(ops, num_keys=1)


@jax.jit
def batch9(idx, pay):
    # level-major reshape: [N, L] -> [L, N]; payload [nL, PW] -> [L, N, PW]
    k = idx.T.astype(jnp.uint32)                     # [L, N]
    p = pay.reshape(N, L, PW).transpose(1, 0, 2)     # [L, N, PW]
    ops = (k,) + tuple(p[:, :, c] for c in range(PW))
    sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1)
    return tuple(o.reshape(-1) for o in sorted_ops[:1]) + sorted_ops[1:]


@jax.jit
def tpose(idx, pay):
    k = idx.T.astype(jnp.uint32)
    p = pay.reshape(N, L, PW).transpose(1, 0, 2)
    return k, p


@jax.jit
def batch9_pre(k, p):
    # level-major inputs already built (measures the sort alone)
    ops = (k,) + tuple(p[:, :, c] for c in range(PW))
    return jax.lax.sort(ops, dimension=1, num_keys=1)


k_pre, p_pre = tpose(idx_nl, pay_nl)
k_pre.block_until_ready()

for name, fn, args in [
    ("flat9  [%d]" % M, flat9, (idx_nl, pay_nl)),
    ("batch9 [%d,%d] incl tpose" % (L, N), batch9, (idx_nl, pay_nl)),
    ("tpose alone", tpose, (idx_nl, pay_nl)),
    ("batch9 sort alone", batch9_pre, (k_pre, p_pre)),
]:
    timeit(name, fn, *args)

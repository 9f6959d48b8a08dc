"""Is a band-partitioned baked texture gather worth building?

Round-3 finding: row gathers are latency-bound and the per-index cost
depends on SOURCE size (~22 ns/idx from a 270 MB table vs ~5 ns from
57 MB — tools/profiles/profile_cell_bwd2.py). The baked frame's texture
gather pulls ~800k 16-lane u8 rows from a 369 MB channel-packed 4096^2
atlas at ~22 ms (PERF_NOTES.md "Round 3").

A banded path would: sort hits by atlas band (K small sources), gather
each band's slot range from a dynamically-sliced band, unsort back to
ray order. Its cost = sort + ~1.2x M small-source gathers + M unsort
gather. This probe measures the four decision quantities at frame
shapes instead of building it:

  big      M x 16B-u8 rows from the full 369 MB atlas   (status quo)
  small    M rows from one 1/4 band (92 MB)             (banded core)
  tiny     M rows from one 1/16 band (23 MB)
  sortMB   lax.sort of (u32 key, idx) at M              (partition)
  unsort   M x 16B rows from an M-row (15 MB) source    (restore order)

banded_est(K) = sortMB + 1.2 * small_K + unsort; build it only if that
beats `big` by >5 ms.

Run (idle chip): python tools/profiles/profile_texgather.py
"""
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

T = 4096
C = 16
M = 960_000 if not os.environ.get("QF_FORCE_CPU") else 60_000

rng = np.random.default_rng(0)
atlas = jnp.asarray(rng.integers(0, 255, (T * T, C), dtype=np.uint8))
idx_full = jnp.asarray(rng.integers(0, T * T, (M,), dtype=np.int32))
idx_q = jnp.asarray(rng.integers(0, T * T // 4, (M,), dtype=np.int32))
idx_s = jnp.asarray(rng.integers(0, T * T // 16, (M,), dtype=np.int32))
stream = jnp.asarray(
    rng.integers(0, M, (M,), dtype=np.int32)
)
rows_m = jnp.asarray(rng.integers(0, 255, (M, C), dtype=np.uint8))


def timeit(name, fn, *args, iters=30):
    r = fn(*args)
    float(np.asarray(r).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    s = float(np.asarray(r).astype(np.float32).reshape(-1)[:8].sum())
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:34s} {dt:8.2f} ms   (sync {s:.6g})", flush=True)
    return dt


@jax.jit
def big(a, i):
    return a[i].astype(jnp.int32).sum(axis=1)


@jax.jit
def small(a, i):
    src = jax.lax.dynamic_slice(a, (0, 0), (T * T // 4, C))
    return src[i].astype(jnp.int32).sum(axis=1)


@jax.jit
def tiny(a, i):
    src = jax.lax.dynamic_slice(a, (0, 0), (T * T // 16, C))
    return src[i].astype(jnp.int32).sum(axis=1)


@jax.jit
def sort_pairs(i, s):
    k, v = jax.lax.sort(
        (i.astype(jnp.uint32), s), num_keys=1
    )
    return k.astype(jnp.int32).sum() + v.sum()


@jax.jit
def unsort(rows, s):
    return rows[s].astype(jnp.int32).sum(axis=1)


print(f"atlas {atlas.nbytes/1e6:.0f} MB, M={M}", flush=True)
t_big = timeit("big (369 MB source)", big, atlas, idx_full)
t_small = timeit("small (92 MB source)", small, atlas, idx_q)
t_tiny = timeit("tiny (23 MB source)", tiny, atlas, idx_s)
t_sort = timeit("sort (u32 key, i32 payload) M", sort_pairs, idx_full,
                stream)
t_unsort = timeit("unsort (M-row 15 MB source)", unsort, rows_m, stream)
for name, t_k in (("K=4", t_small), ("K=16", t_tiny)):
    est = t_sort + 1.2 * t_k + t_unsort
    print(f"banded_est {name}: {est:.2f} ms vs big {t_big:.2f} "
          f"-> {'BUILD' if est + 5 < t_big else 'skip'}", flush=True)

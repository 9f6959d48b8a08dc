"""Scatter/segment-sum variants for the hash-table gradient on TPU."""
import time

import jax
import jax.numpy as jnp

def timeit(name, fn, *args, n=5):
    s = float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(n):
        s = float(jnp.sum(fn(*args)))
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms (sum={s:.2f})",
          flush=True)

key = jax.random.PRNGKey(0)
T, F = 1 << 24, 2
N = 1 << 25
g = jax.random.normal(key, (N, F))
idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
idx_sorted = jnp.sort(idx)

timeit("sort_33M", jax.jit(lambda i: jnp.sort(i)), idx)

timeit("scatter_unsorted",
       jax.jit(lambda i, gg: jnp.zeros((T, F)).at[i].add(gg)), idx, g)

timeit("scatter_sorted_flagged",
       jax.jit(lambda i, gg: jnp.zeros((T, F)).at[i].add(
           gg, indices_are_sorted=True)), idx_sorted, g)

timeit("segment_sum_sorted",
       jax.jit(lambda i, gg: jax.ops.segment_sum(
           gg, i, num_segments=T, indices_are_sorted=True)),
       idx_sorted, g)

# segmented-scan + unique-write path
def seg_scan_path(i, gg):
    order = jnp.argsort(i)
    i_s = i[order]
    g_s = gg[order]
    bound = jnp.concatenate(
        [jnp.ones((1,), bool), i_s[1:] != i_s[:-1]]
    )
    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, vb + jnp.where(fb, 0.0, va)
    _, inc = jax.lax.associative_scan(comb, (bound[:, None], g_s))
    last = jnp.concatenate([bound[1:], jnp.ones((1,), bool)])
    vals = jnp.where(last[:, None], inc, 0.0)
    return jnp.zeros((T, F)).at[i_s].add(
        vals, indices_are_sorted=True, unique_indices=False)

timeit("argsort_scan_write", jax.jit(seg_scan_path), idx, g)

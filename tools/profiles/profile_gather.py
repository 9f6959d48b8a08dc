"""Gather/scatter layout microbenchmarks on the TPU."""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

def timeit(name, fn, *args, n=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)

key = jax.random.PRNGKey(0)
T, F = 1 << 24, 2          # 16.7M x 2 f32
N8 = 1 << 25               # 33.5M gathers (the current layout)
table2 = jax.random.normal(key, (T, F))
idx8 = jax.random.randint(key, (N8,), 0, T)

timeit("take_33M_rows_of_2", jax.jit(lambda t, i: jnp.take(t, i, axis=0)),
       table2, idx8)

T16 = T // 8
table16 = jax.random.normal(key, (T16, 16))
idx1 = jax.random.randint(key, (N8 // 8,), 0, T16)
timeit("take_4M_rows_of_16", jax.jit(lambda t, i: jnp.take(t, i, axis=0)),
       table16, idx1)

table128 = jax.random.normal(key, (T16 // 8, 128))
idx128 = jax.random.randint(key, (N8 // 64, ), 0, T16 // 8)
timeit("take_0.5M_rows_of_128",
       jax.jit(lambda t, i: jnp.take(t, i, axis=0)), table128, idx128)

# scatter-add
g2 = jax.random.normal(key, (N8, F))
timeit("scatter_33M_rows_of_2",
       jax.jit(lambda t, i, g: t.at[i].add(g)), table2, idx8, g2)

g16 = jax.random.normal(key, (N8 // 8, 16))
timeit("scatter_4M_rows_of_16",
       jax.jit(lambda t, i, g: t.at[i].add(g)), table16, idx1, g16)

# segment_sum path for grads: sort + segsum
timeit("sort_33M_int32", jax.jit(lambda i: jnp.sort(i)), idx8)

# occupancy-style gather: bool [2M], 8.5M lookups
occ = jax.random.bernoulli(key, 0.1, (128**3,))
oidx = jax.random.randint(key, (1 << 23,), 0, 128**3)
timeit("occ_gather_8.4M_bool",
       jax.jit(lambda t, i: jnp.take(t, i, axis=0)), occ, oidx)

# nonzero compaction 8.4M -> 262k
mask = jax.random.bernoulli(key, 0.03, (1 << 23,))
timeit("nonzero_8.4M",
       jax.jit(lambda m: jnp.nonzero(m, size=1 << 18, fill_value=0)[0]),
       mask)

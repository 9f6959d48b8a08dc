import time
import jax, jax.numpy as jnp

def timeit(name, fn, *args, n=10):
    s = float(jnp.sum(fn(*args)))  # force full execution + readback
    t0 = time.perf_counter()
    for _ in range(n):
        s = float(jnp.sum(fn(*args)))
    dt = (time.perf_counter()-t0)/n
    print(f"{name}: {dt*1e3:.2f} ms (sum={s:.3f})", flush=True)

key = jax.random.PRNGKey(0)
T, F = 1 << 24, 2
N8 = 1 << 25
table2 = jax.random.normal(key, (T, F))
idx8 = jax.random.randint(key, (N8,), 0, T)
take2 = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
timeit("take_33M_rows_of_2", take2, table2, idx8)

table16 = jax.random.normal(key, (T // 8, 16))
idx1 = jax.random.randint(key, (N8 // 8,), 0, T // 8)
timeit("take_4M_rows_of_16", take2, table16, idx1)

g2 = jax.random.normal(key, (N8, F))
sc2 = jax.jit(lambda t, i, g: t.at[i].add(g))
timeit("scatter_33M_rows_of_2", sc2, table2, idx8, g2)

g16 = jax.random.normal(key, (N8 // 8, 16))
timeit("scatter_4M_rows_of_16", sc2, table16, idx1, g16)

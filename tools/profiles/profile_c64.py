import time
import jax, jax.numpy as jnp

def timeit(name, fn, *args, n=5):
    s = jnp.sum(fn(*args))
    s = float(abs(s)) if jnp.iscomplexobj(s) else float(s)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        out.block_until_ready()
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)

key = jax.random.PRNGKey(0)
T = 1 << 24
N = 1 << 25
g2 = jax.random.normal(key, (N, 2))
gc = jax.lax.complex(g2[:, 0], g2[:, 1])
idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
tab2 = jax.random.normal(key, (T, 2))
tabc = jax.lax.complex(tab2[:, 0], tab2[:, 1])

timeit("c64_flat_gather_33M",
       jax.jit(lambda t, i: jnp.take(t, i)), tabc, idx)
timeit("c64_flat_scatter_33M",
       jax.jit(lambda i, g: jnp.zeros((T,), jnp.complex64).at[i].add(
           g, mode="promise_in_bounds")), idx, gc)

import time
import jax, jax.numpy as jnp
from jax import lax

def timeit(name, fn, *args, n=5):
    s = float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(n):
        s = float(jnp.sum(fn(*args)))
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)

key = jax.random.PRNGKey(0)
T, F = 1 << 24, 2
N = 1 << 23  # 8.4M (per-level realistic x4)
gflat = jax.random.normal(key, (N,))
idxf = jax.random.randint(key, (N,), 0, T * F, jnp.int32)

timeit("flat_scalar_scatter_8M",
       jax.jit(lambda i, g: jnp.zeros((T * F,)).at[i].add(
           g, mode="promise_in_bounds")), idxf, gflat)

g2 = jax.random.normal(key, (N, F))
idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
timeit("row_scatter_8M_promise",
       jax.jit(lambda i, g: jnp.zeros((T, F)).at[i].add(
           g, mode="promise_in_bounds")), idx, g2)

gb = g2.astype(jnp.bfloat16)
timeit("row_scatter_8M_bf16",
       jax.jit(lambda i, g: jnp.zeros((T, F), jnp.bfloat16).at[i].add(g)),
       idx, gb)

# one-hot matmul segment-sum for a SMALL table (dense level)
Ts = 4096
idxs = jax.random.randint(key, (N,), 0, Ts, jnp.int32)
def onehot_segsum(i, g):
    # [N, Ts] @ ... via chunked dot: do [Ts, N] onehot as compare
    oh = (i[None, :] == jnp.arange(Ts)[:, None]).astype(jnp.bfloat16)
    return jnp.dot(oh, g.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
timeit("onehot_segsum_small_4096", jax.jit(onehot_segsum), idxs, g2)

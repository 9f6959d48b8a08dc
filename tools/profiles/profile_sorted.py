"""Measure sorted vs exact table-grad modes on the chip (real sync)."""
import dataclasses
import time

import jax
import jax.numpy as jnp

from quadraturefields_tpu.ops.hashgrid import (
    HashGridConfig, hashgrid_encode, hashgrid_init,
)


def bench(name, fn, batches, iters=5):
    float(fn(*batches[0]))
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(*batches[(i + 1) % len(batches)]))
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    ts = ", ".join(f"{t*1e3:.0f}" for t in times)
    print(f"{name}: {med*1e3:.1f} ms  [{ts}]", flush=True)
    return med


key = jax.random.PRNGKey(0)
N = 1 << 18
batches = [
    (jax.random.uniform(jax.random.PRNGKey(i), (N, 3)),)
    for i in range(3)
]

for interp in ("tet", "cube"):
    for mode in ("sorted", "exact"):
        cfg = HashGridConfig.from_max_resolution(
            4096, log2_hashmap_size=19, interp=interp, grad_mode=mode)
        table = hashgrid_init(key, cfg)

        def f(x, cfg=cfg, table=table):
            def loss(t):
                return jnp.sum(hashgrid_encode(t, x, cfg))
            g = jax.grad(loss)(table)
            return jnp.sum(g[::4096])

        bench(f"encode fwd+bwd 262k {interp}/{mode}", jax.jit(f), batches)

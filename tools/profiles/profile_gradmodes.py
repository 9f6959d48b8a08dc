"""Measure the hash-grid encode fwd+bwd at bench scale for each
table-gradient mode (PERF_NOTES.md: the table scatter dominates the
stage-1 step). Run on the TPU."""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from quadraturefields_tpu.ops.hashgrid import (
    HashGridConfig,
    hashgrid_encode,
    hashgrid_init,
)

N = 1 << 18
base = HashGridConfig.from_max_resolution(
    4096, log2_hashmap_size=19, interp="tet"
)
key = jax.random.PRNGKey(0)
x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
ct = jax.random.normal(jax.random.PRNGKey(2), (N, base.output_dim))

for mode in ("exact", "dedup", "stochastic"):
    cfg = dataclasses.replace(base, grad_mode=mode)
    table = hashgrid_init(key, cfg)

    @jax.jit
    def grad_step(t, x):
        return jax.grad(
            lambda tt: jnp.sum(hashgrid_encode(tt, x, cfg) * ct)
        )(t)

    g = grad_step(table, x)
    print(mode, "checksum", float(jnp.sum(jnp.abs(g))), flush=True)
    t0 = time.perf_counter()
    iters = 10
    for i in range(iters):
        g = grad_step(table, x)
    s = float(jnp.sum(g))  # forces a real readback
    dt = (time.perf_counter() - t0) / iters
    print(f"{mode}: {dt*1e3:.1f} ms fwd+bwd ({N} pts) [{s:.3e}]",
          flush=True)

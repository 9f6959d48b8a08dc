"""Probe Mosaic support for dynamic vector gathers from VMEM tables."""
import functools, time, sys
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 1 << 19   # table rows
F = 2
N = 1 << 15   # points per block

key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (T, F), jnp.float32)
idx = jax.random.randint(key, (N,), 0, T, jnp.int32)

def try_variant(name, fn):
    try:
        out = fn()
        out = jax.block_until_ready(out)
        s = float(jnp.sum(out))
        print(f"{name}: OK sum={s:.3f}", flush=True)
        # time it
        t0 = time.perf_counter()
        for _ in range(20):
            s = float(jnp.sum(fn()))
        print(f"{name}: {(time.perf_counter()-t0)/20*1e3:.3f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)

# V1: jnp.take inside kernel, whole table in VMEM
def kernel_take(idx_ref, table_ref, out_ref):
    out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

def v1():
    return pl.pallas_call(
        kernel_take,
        out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, table)

try_variant("v1_take_vmem", v1)

# V2: take along axis with flattened table (1D gather)
flat_table = table.reshape(-1)
idx_flat = idx * F

def kernel_take1d(idx_ref, table_ref, out_ref):
    i = idx_ref[:]
    g0 = jnp.take(table_ref[:], i, axis=0)
    g1 = jnp.take(table_ref[:], i + 1, axis=0)
    out_ref[:] = jnp.stack([g0, g1], axis=-1)

def v2():
    return pl.pallas_call(
        kernel_take1d,
        out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx_flat, flat_table)

try_variant("v2_take1d_vmem", v2)

# V3: xla baseline on same shape for comparison
def v3():
    return jax.jit(lambda t, i: jnp.take(t, i, axis=0))(table, idx)
try_variant("v3_xla_take", v3)

"""Bisect which kernel ops Mosaic accepts on this toolchain."""
import functools, sys
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 8192, 128

def run(name, kernel, out_shape, *args, **kw):
    try:
        out = pl.pallas_call(kernel, out_shape=out_shape, **kw)(*args)
        jax.block_until_ready(out)
        print(f"{name}: OK", flush=True)
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)

key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (R, L), jnp.float32)
rows = jax.random.randint(key, (R, L), 0, R, jnp.int32)

# 1. plain dynamic_gather
def k1(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)
run("dynamic_gather_axis0", k1,
    jax.ShapeDtypeStruct((R, L), jnp.float32), table, rows)

# 2. uint32 multiply + xor
def k2(i_ref, o_ref):
    u = i_ref[:].astype(jnp.uint32)
    h = u * jnp.uint32(2654435761)
    h = h ^ (u * jnp.uint32(805459861))
    o_ref[:] = (h & jnp.uint32(R - 1)).astype(jnp.int32)
run("u32_mul_xor", k2,
    jax.ShapeDtypeStruct((R, L), jnp.int32), rows)

# 3. broadcast rows [N] -> [N, 128] then gather
def k3(t_ref, r_ref, o_ref):
    r = r_ref[:]                       # [R, 1] int32
    ri = jnp.broadcast_to(r, (R, L))
    o_ref[:] = jnp.take_along_axis(t_ref[:], ri, axis=0)
rows1 = rows[:, :1]
run("broadcast_gather", k3,
    jax.ShapeDtypeStruct((R, L), jnp.float32), table, rows1)

# 4. iota-mask select + reduce to narrow output
def k4(t_ref, l_ref, o_ref):
    g = t_ref[:]
    lane0 = l_ref[:]                   # [R, 1]
    li = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    m = li == jnp.broadcast_to(lane0, (R, L))
    o_ref[:] = jnp.sum(jnp.where(m, g, 0.0), axis=1, keepdims=True)
lane = jax.random.randint(key, (R, 1), 0, L, jnp.int32)
run("onehot_select", k4,
    jax.ShapeDtypeStruct((R, 1), jnp.float32), table, lane)

# 5. narrow out write [1, B, 2] strided
def k5(x_ref, o_ref):
    v = x_ref[:, 0]
    o_ref[0, :, 0] = v
    o_ref[0, :, 1] = v * 2.0
run("narrow_strided_write", k5,
    jax.ShapeDtypeStruct((1, 1024, 2), jnp.float32),
    jax.random.normal(key, (1024, 3)))

# 6. 3-col input block read
def k6(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = jnp.sum(x, axis=1, keepdims=True)
run("narrow3_read", k6,
    jax.ShapeDtypeStruct((1024, 1), jnp.float32),
    jax.random.normal(key, (1024, 3)))

# 7. floor/clip int ops on [B, 8]
def k7(x_ref, o_ref):
    x = x_ref[:]
    k = jax.lax.broadcasted_iota(jnp.int32, (1024, 8), 1)
    base = jnp.floor(x[:, 0:1] * 33.0).astype(jnp.int32)
    o_ref[:] = jnp.clip(base + (k & 1), 0, 63)
run("int_b8_ops", k7,
    jax.ShapeDtypeStruct((1024, 8), jnp.int32),
    jax.random.uniform(key, (1024, 3)))

# 8. reshape [1024, 8] -> [8192] -> [8192, 1]
def k8(x_ref, o_ref):
    v = x_ref[:].reshape(8192)
    o_ref[:] = v.reshape(8192, 1)
run("reshape_b8_flat", k8,
    jax.ShapeDtypeStruct((8192, 1), jnp.float32),
    jax.random.normal(key, (1024, 8)))

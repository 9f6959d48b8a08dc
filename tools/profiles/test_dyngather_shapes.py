import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

def run(name, R, L, axis, dtype=jnp.float32, idx_dtype=jnp.int32):
    key = jax.random.PRNGKey(0)
    t = jax.random.normal(key, (R, L)).astype(dtype)
    i = jax.random.randint(key, (R, L), 0, R if axis == 0 else L
                           ).astype(idx_dtype)
    def k(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=axis)
    try:
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((R, L), dtype)
        )(t, i)
        jax.block_until_ready(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e).splitlines()[0][:120]}", flush=True)

run("ax1_8x128_f32", 8, 128, 1)       # lane shuffle, small
run("ax0_8x128_f32", 8, 128, 0)       # sublane gather, small
run("ax0_256x128_f32", 256, 128, 0)
run("ax0_8192x128_f32", 8192, 128, 0)
run("ax1_8192x128_f32", 8192, 128, 1)
run("ax0_8x128_i32idx_u32", 8, 128, 0, jnp.int32)
run("ax0_8x128_bf16", 16, 128, 0, jnp.bfloat16)

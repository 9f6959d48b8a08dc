import jax, jax.numpy as jnp
import numpy as np

N = 18_481_056  # the prod field table entry count that OOM'd
a = jax.device_put(np.zeros((N, 2), np.float32))
a.block_until_ready()
rows = -(- (N*2) // 128)
o = jax.device_put(np.zeros((rows, 128), np.float32))

def cur(out128, p):
    d = out128.reshape(-1)[: N * 2].reshape(N, 2)
    return p - 0.01 * d

def planar(out128, p):
    flat = out128.reshape(-1)[: N * 2]
    d0 = flat[0::2]
    d1 = flat[1::2]
    d = jnp.stack([d0, d1], axis=0).T        # [N,2] via [2,N]
    return p - 0.01 * d

def planar2(out128, p):
    # de-interleave without strided slices: [Q,128] -> [Q,64,2] ->
    # transpose to [2, Q, 64] -> [2, Q*64] -> slice -> T
    q = out128.shape[0]
    d3 = out128.reshape(q, 64, 2)
    d = jnp.transpose(d3, (2, 0, 1)).reshape(2, q * 64)[:, :N].T
    return p - 0.01 * d

for name, f in [("current", cur), ("planar-strided", planar),
                ("planar-transpose", planar2)]:
    try:
        comp = jax.jit(f).lower(o, a).compile()
        m = comp.memory_analysis()
        print(f"{name}: temp={m.temp_size_in_bytes/2**30:.2f}G "
              f"args={m.argument_size_in_bytes/2**30:.2f}G", flush=True)
    except Exception as e:
        print(name, "FAILED", repr(e)[:200], flush=True)

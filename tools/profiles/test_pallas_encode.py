"""Correctness + perf of the Pallas hash-grid encoder vs the XLA one."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from quadraturefields_tpu.ops.hashgrid import (
    HashGridConfig, hashgrid_init, hashgrid_encode,
)
from quadraturefields_tpu.ops.hashgrid_pallas import (
    pack_table, unpack_table, hashgrid_encode_pallas,
)

cfg = HashGridConfig.from_max_resolution(4096, log2_hashmap_size=19)
key = jax.random.PRNGKey(0)
table = hashgrid_init(key, cfg)
packed = pack_table(table, cfg)
print("packed", packed.shape, flush=True)

# roundtrip
rt = unpack_table(packed, cfg)
print("roundtrip ok:", bool(jnp.allclose(rt, table)), flush=True)

N = 1 << 18
x = jax.random.uniform(key, (N, 3))

enc_ref = jax.jit(lambda t, p: hashgrid_encode(t, p, cfg))
enc_pal = jax.jit(lambda t, p: hashgrid_encode_pallas(t, p, cfg))

try:
    out_p = enc_pal(packed, x)
    out_p = jax.block_until_ready(out_p)
    print("pallas compiled, out", out_p.shape, flush=True)
except Exception as e:
    print("PALLAS FAIL:", type(e).__name__, str(e)[:2000], flush=True)
    sys.exit(1)

out_r = enc_ref(table, x)
err = float(jnp.max(jnp.abs(out_p - out_r)))
print("max abs err vs XLA encoder:", err, flush=True)

def timeit(name, fn, *args, n=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)

timeit("pallas_encode_262k", enc_pal, packed, x)
timeit("xla_encode_262k", enc_ref, table, x)

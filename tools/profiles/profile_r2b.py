"""Re-run the round-2 probes with FRESH inputs per iteration.

The first profile_r2.py pass timed repeated executions on identical
input buffers; the axon remote platform appears to memoize, giving
impossible numbers (16.8M sort in 0.03 ms). Here every iteration gets
different data and per-iteration wall times are printed.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit_varied(name, fn, batches, iters=6):
    try:
        out = jax.block_until_ready(fn(*batches[0]))  # compile
        times = []
        for i in range(iters):
            args = batches[(i + 1) % len(batches)]
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*args))
            times.append(time.perf_counter() - t0)
        ts = ", ".join(f"{t*1e3:.2f}" for t in times)
        med = sorted(times)[len(times) // 2]
        print(f"{name}: median {med*1e3:.2f} ms  [{ts}]", flush=True)
        return med
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


ALL = len(sys.argv) < 2
WANT = set(sys.argv[1:])


def want(p):
    return ALL or p in WANT


key = jax.random.PRNGKey(0)

if want("sort"):
    M = 1 << 24
    f = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    batches = [
        (jax.random.randint(jax.random.PRNGKey(i), (M,), 0, 1 << 24,
                            jnp.int32).astype(jnp.uint32),
         jax.random.normal(jax.random.PRNGKey(100 + i), (M,),
                           jnp.float32))
        for i in range(3)
    ]
    timeit_varied(f"sort_key_val (u32,f32) {M/1e6:.1f}M", f, batches)

if want("onehot"):
    SUB = 64
    KPT = SUB * 128
    W = 256
    M = 1 << 24
    G = M // KPT
    TOT_ROWS = 1 << 17
    BLOCKS = TOT_ROWS // W

    starts = (jnp.arange(G, dtype=jnp.int32) * BLOCKS) // G

    def mk(i):
        k1 = jax.random.PRNGKey(i)
        k2 = jax.random.PRNGKey(50 + i)
        k3 = jax.random.PRNGKey(90 + i)
        rel = jax.random.randint(k1, (G, SUB, 128), 0, W, jnp.int32)
        abs_row = starts[:, None, None] * W + rel
        lanes = jax.random.randint(k2, (G, SUB, 128), 0, 128, jnp.int32)
        keys_ = ((abs_row << 7) | lanes).astype(jnp.uint32)
        vals = jax.random.normal(k3, (G, SUB, 128), jnp.float32)
        return starts, keys_, vals

    batches = [mk(i) for i in range(3)]

    def acc_kernel(starts_ref, k_ref, v_ref, out_ref, *, dot_dtype):
        b = pl.program_id(0)
        prev = starts_ref[jnp.maximum(b - 1, 0)]
        is_new = (b == 0) | (starts_ref[b] != prev)

        @pl.when(is_new)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        k = k_ref[0].astype(jnp.int32)
        rel_rows = (k >> 7) - starts_ref[b] * W
        ln = k & 127
        v = v_ref[0]
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        acc = jnp.zeros((W, 128), jnp.float32)
        for r in range(SUB):
            rr = rel_rows[r:r + 1, :]
            A = (row_iota == rr).astype(dot_dtype)
            Vr = jnp.where(
                lane_iota == ln[r:r + 1, :], v[r:r + 1, :], 0.0
            ).astype(dot_dtype)
            acc = acc + jax.lax.dot_general(
                A, Vr, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[:] = out_ref[:] + acc

    def make(dot_dtype):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, SUB, 128), lambda b, s: (b, 0, 0)),
                pl.BlockSpec((1, SUB, 128), lambda b, s: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((W, 128), lambda b, s: (s[b], 0)),
        )

        @jax.jit
        def onehot_acc(starts, keys_, vals):
            return pl.pallas_call(
                functools.partial(acc_kernel, dot_dtype=dot_dtype),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (TOT_ROWS, 128), jnp.float32),
            )(starts, keys_, vals)
        return onehot_acc

    for dt_name, dd in (("bf16", jnp.bfloat16),):
        fn = make(dd)
        med = timeit_varied(
            f"onehot-acc {M/1e6:.1f}M W={W} [{dt_name}]", fn, batches)
        if med:
            print(f"  -> {med/M*1e9:.3f} ns/contribution", flush=True)

if want("gatherx"):
    M = 1 << 24
    T = 1 << 19
    table = jax.random.normal(key, (T, 2), jnp.float32)

    @jax.jit
    def g(table, idx):
        return jnp.sum(table[idx], axis=0)

    batches = [
        (table,
         jax.random.randint(jax.random.PRNGKey(i), (M,), 0, T,
                            jnp.int32))
        for i in range(3)
    ]
    med = timeit_varied(f"xla gather {M/1e6:.1f}M rows of 2 f32", g,
                        batches)
    if med:
        print(f"  -> {med/M*1e9:.2f} ns/idx", flush=True)

if want("scatter"):
    M = 1 << 24
    E = (1 << 19) * 2

    @jax.jit
    def s(idx, vals):
        return jnp.zeros((E,), jnp.float32).at[idx].add(
            vals, mode="promise_in_bounds")

    batches = [
        (jax.random.randint(jax.random.PRNGKey(i), (M,), 0, E,
                            jnp.int32),
         jax.random.normal(jax.random.PRNGKey(70 + i), (M,),
                           jnp.float32))
        for i in range(3)
    ]
    med = timeit_varied(f"xla flat scatter-add {M/1e6:.1f}M", s, batches)
    if med:
        print(f"  -> {med/M*1e9:.2f} ns/idx", flush=True)

print("done", flush=True)

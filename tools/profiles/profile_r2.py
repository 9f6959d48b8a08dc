"""Round-2 kernel design probes on the real TPU.

Measured building blocks for the production hash-grid kernel:
  sort    XLA sort costs for the backward stream: key-only vs
          (key, payload) at 16.8M / 12.6M elements.
  search  searchsorted block partitioning of a sorted stream.
  onehot  windowed one-hot MXU accumulate (backward candidate): per
          sublane-row of 128 contributions, A[W,128] @ V[128,128]^T
          into a VMEM accumulator window (all ops 2D; Mosaic on this
          toolchain rejects 1-D reshapes and sublane dynamic_gather).
  gatherx XLA gather per-index cost vs table size and row width.
Run: python tools/profile_r2.py [probe ...]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, iters=10):
    try:
        out = jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


ALL = len(sys.argv) < 2
WANT = set(sys.argv[1:])


def want(p):
    return ALL or p in WANT


key = jax.random.PRNGKey(0)

# ---------------------------------------------------------------- sort
if want("sort"):
    for M in (1 << 24, 12 * (1 << 20)):
        keys = jax.random.randint(
            key, (M,), 0, 1 << 24, jnp.int32).astype(jnp.uint32)
        vals = jax.random.normal(key, (M,), jnp.float32)

        timeit(f"sort key-only u32 {M/1e6:.1f}M",
               jax.jit(jnp.sort), keys, iters=5)
        timeit(
            f"sort_key_val (u32,f32) {M/1e6:.1f}M",
            jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)),
            keys, vals, iters=5)

# ---------------------------------------------------------------- search
if want("search"):
    M = 1 << 24
    NB = 512
    skeys = jnp.sort(jax.random.randint(key, (M,), 0, 1 << 17,
                                        jnp.int32))
    bounds = jnp.arange(NB, dtype=jnp.int32) * ((1 << 17) // NB)
    timeit(
        f"searchsorted {NB} bounds in {M/1e6:.0f}M sorted",
        jax.jit(lambda s, b: jnp.searchsorted(s, b)),
        skeys, bounds, iters=5)

# ---------------------------------------------------------------- onehot
if want("onehot"):
    # windowed one-hot accumulate: G tiles of 64x128 contributions
    # into W-row windows of a [TOT_ROWS, 128] f32 accumulator
    SUB = 64            # sublane rows per tile
    KPT = SUB * 128     # 8192 contributions per tile
    W = 256
    M = 1 << 24
    G = M // KPT        # 2048 tiles
    TOT_ROWS = 1 << 17
    BLOCKS = TOT_ROWS // W

    # emulate the sorted stream: tile g targets window starts[g]
    # (non-decreasing); keys = (abs_row << 7) | lane
    starts = (jnp.arange(G, dtype=jnp.int32) * BLOCKS) // G
    rel = jax.random.randint(key, (G, SUB, 128), 0, W, jnp.int32)
    abs_row = starts[:, None, None] * W + rel
    lanes = jax.random.randint(key, (G, SUB, 128), 0, 128, jnp.int32)
    keys_ = ((abs_row << 7) | lanes).astype(jnp.uint32)
    vals = jax.random.normal(key, (G, SUB, 128), jnp.float32)

    def acc_kernel(starts_ref, k_ref, v_ref, out_ref, *, dot_dtype):
        b = pl.program_id(0)
        prev = starts_ref[jnp.maximum(b - 1, 0)]
        is_new = (b == 0) | (starts_ref[b] != prev)

        @pl.when(is_new)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        k = k_ref[0].astype(jnp.int32)              # [SUB, 128]
        rel_rows = (k >> 7) - starts_ref[b] * W
        ln = k & 127
        v = v_ref[0]
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0)
        lane_iota = jax.lax.broadcasted_iota(
            jnp.int32, (128, 128), 0)
        acc = jnp.zeros((W, 128), jnp.float32)
        for r in range(SUB):
            rr = rel_rows[r:r + 1, :]               # [1, 128]
            A = (row_iota == rr).astype(dot_dtype)  # [W, 128]
            Vr = jnp.where(
                lane_iota == ln[r:r + 1, :], v[r:r + 1, :], 0.0
            ).astype(dot_dtype)                     # [128l, 128j]
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

    for dt_name, dot_dtype in (("bf16", jnp.bfloat16),
                               ("f32", jnp.float32)):
        fn = make(dot_dtype)
        dt = timeit(
            f"onehot-acc {M/1e6:.1f}M contribs W={W} [{dt_name}]",
            fn, starts, keys_, vals, iters=5)
        if dt:
            print(f"  -> {dt/M*1e9:.3f} ns/contribution", flush=True)
        if dt_name == "bf16" and dt:
            out = np.asarray(fn(starts, keys_, vals))
            ref = np.zeros((TOT_ROWS * 128,), np.float32)
            flat = (np.asarray(abs_row) * 128
                    + np.asarray(lanes)).reshape(-1)
            np.add.at(
                ref, flat,
                np.asarray(vals, np.float32).astype(
                    jnp.bfloat16).astype(np.float32).reshape(-1))
            ref = ref.reshape(TOT_ROWS, 128)
            d = np.abs(out - ref)
            rel_err = d.max() / (np.abs(ref).max() + 1e-9)
            print(f"  max|d| vs numpy(bf16 vals): {d.max():.3e} "
                  f"(rel {rel_err:.2e})", flush=True)

# ---------------------------------------------------------------- gatherx
if want("gatherx"):
    for tbits, width, M in ((19, 2, 1 << 24), (12, 2, 1 << 24),
                            (19, 2, 12 << 20), (16, 16, 1 << 22)):
        T = 1 << tbits
        table = jax.random.normal(key, (T, width), jnp.float32)
        idx = jax.random.randint(key, (M,), 0, T, jnp.int32)

        @jax.jit
        def g(table, idx):
            return jnp.sum(table[idx], axis=0)

        dt = timeit(
            f"xla gather {M/1e6:.1f}M rows of {width} f32 from 2^{tbits}",
            g, table, idx, iters=3)
        if dt:
            print(f"  -> {dt/M*1e9:.2f} ns/idx", flush=True)

print("done", flush=True)

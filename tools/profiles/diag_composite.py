"""Is the 39.6 ms presorted-MXU composite device time or dispatch
overhead? Three discriminators, one chip session:

1. n-scaling: ms/dispatch at window sizes n=10 vs n=40 — pipelined
   async dispatch amortizes submission latency, so a drop with n means
   host/tunnel overhead, flat means device time.
2. cap-scaling: M=370688 vs 741376 at fixed n_segments — the merge
   grid is ~(M/J + rows/W) steps; device-bound time scales with it.
3. j_tile scaling: j_tile 512 (J=2048) vs 2048/4096 — if the kernel is
   DMA-latency bound per grid step (the stage-4 field-grad diagnosis),
   bigger J directly cuts step count.

Usage: python tools/profiles/diag_composite.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _enable_compile_cache

_enable_compile_cache()

from quadraturefields_tpu.ops.hashgrid_sorted import (  # noqa: E402
    presorted_row_segment_sum,
)

R = 640_000


def run(cap, j_tile, n):
    rng = np.random.default_rng(0)
    # ray-sorted keys with ~708k/640k density, like the baked frame
    keys = np.sort(
        rng.integers(0, R, size=cap).astype(np.int32)
    )
    vals = rng.standard_normal((cap, 8), dtype=np.float32)
    keys_d = jnp.asarray(keys)
    vals_d = jnp.asarray(vals)

    fn = jax.jit(
        lambda k, v: presorted_row_segment_sum(k, v, R, j_tile=j_tile)
    )
    out = fn(keys_d, vals_d)
    float(jnp.sum(out))
    ws = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(keys_d, vals_d)
        float(jnp.sum(out))
        ws.append(time.perf_counter() - t0)
    ms = sorted(ws)[1] / n * 1e3
    print(f"cap {cap} j_tile {j_tile} n {n}: {ms:.2f} ms/call",
          flush=True)
    return ms


def main():
    run(741376, 512, 10)
    run(741376, 512, 40)          # n-scaling
    run(370688, 512, 10)          # cap-scaling
    run(741376, 2048, 10)         # J-scaling
    run(741376, 4096, 10)
    run(741376, 8192, 10)


if __name__ == "__main__":
    main()

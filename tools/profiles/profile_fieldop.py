"""Price alternatives for the deformation-field table gradient — the
stage-4 step's dominant term (profile_stage4: sorted_tet_factor_grad
5.19 s of the 8.64 s step at the 2^17x25 contract).

The field's shape breaks the windowed-MXU sweep's economics: stage-1's
NGP table has 439k cell rows (107 sweep blocks; the sweep is ~free),
but the T=2^24 L16 field has 18.4M rows -> 4483 window blocks against
5125 contribution tiles, and the merge-path grid becomes DMA-latency
bound (~0.5 ms/grid-step, ~5 s total).

Variants measured at the real shape (nL = 2*cap*16 = 21M contributions,
18.4M rows, F=2):
  sorted_w256   the shipped kernel (window=256) — control
  sorted_w1024  4x taller accumulator window (n_blocks/4)
  sorted_w2048  8x taller
  scatter_rows  .at[idx].add(contrib [nL, 16]) — XLA row scatter
  scatter_segsum  sort(key) + segment-boundary dedup + row scatter of
                unique rows (hash spread means ~1.14 contribs/row —
                dedup mostly prices the sort+scan overhead)
  small_t       sorted kernel at log2_T=21 (the TPU-fast candidate:
                2.2M rows, 533 blocks — stage-1's regime)

Run (idle chip): python tools/profiles/profile_fieldop.py [log2_cap]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

if os.environ.get("QF_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/qf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import functools
import json

import jax.numpy as jnp
import numpy as np

from quadraturefields_tpu.ops.hashgrid_sorted import sorted_tet_factor_grad

LOG2_CAP = int(sys.argv[1]) if len(sys.argv) > 1 else 19
CAP = 1 << LOG2_CAP          # packed-hit cap; fused field query = 2*CAP
L, F = 16, 2
from quadraturefields_tpu.models.field import FieldConfig

ROWS_BIG = FieldConfig(
    log2_hashmap_size=24, layout="cell").hashgrid.total_entries
ROWS_SMALL = FieldConfig(
    log2_hashmap_size=21, layout="cell").hashgrid.total_entries


def timed(fn, *args, reps=5, warm=2):
    for _ in range(warm):
        out = fn(*args)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf[:1]))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    nL = 2 * CAP * L
    rng = np.random.default_rng(1)
    idx_big = jax.device_put(
        rng.integers(0, ROWS_BIG, nL, dtype=np.int32))
    idx_small = jax.device_put(
        rng.integers(0, ROWS_SMALL, nL, dtype=np.int32))
    wk = jax.device_put(rng.random((nL, 4), dtype=np.float32))
    c1 = jax.device_put(rng.integers(1, 7, nL, dtype=np.int32))
    c2 = jax.device_put(rng.integers(1, 7, nL, dtype=np.int32))
    g = jax.device_put(rng.random((nL, F), dtype=np.float32))
    out = {"nL": nL, "rows_big": ROWS_BIG, "rows_small": ROWS_SMALL}

    for w in (256, 1024, 2048):
        fn = jax.jit(functools.partial(
            sorted_tet_factor_grad, total_entries=ROWS_BIG, window=w))
        try:
            out[f"sorted_w{w}_ms"] = timed(fn, idx_big, wk, c1, c2, g) * 1e3
        except Exception as e:  # VMEM overflow etc.
            out[f"sorted_w{w}_ms"] = f"FAIL {type(e).__name__}"
        print(f"sorted_w{w}: {out[f'sorted_w{w}_ms']}", flush=True)

    # row scatter of the full outer-product contributions (exact mode)
    @jax.jit
    def scatter_rows(idx, wk, c1, c2, g):
        m = idx.shape[0]
        # corner one-hots -> [m, 8] weights (slots 0, c1, c2, 7)
        lane = jnp.arange(8, dtype=jnp.int32)[None, :]
        w8 = (
            jnp.where(lane == 0, wk[:, 0:1], 0.0)
            + jnp.where(lane == c1[:, None], wk[:, 1:2], 0.0)
            + jnp.where(lane == c2[:, None], wk[:, 2:3], 0.0)
            + jnp.where(lane == 7, wk[:, 3:4], 0.0)
        )
        contrib = (
            jnp.repeat(w8, F, axis=1) * jnp.tile(g, (1, 8))
        )  # [m, 8F]
        return (
            jnp.zeros((ROWS_BIG, 8 * F), jnp.float32)
            .at[idx]
            .add(contrib, mode="promise_in_bounds")
        )

    out["scatter_rows_ms"] = timed(scatter_rows, idx_big, wk, c1, c2, g) * 1e3
    print(f"scatter_rows: {out['scatter_rows_ms']:.1f}", flush=True)

    # sort + segment-sum duplicates + scatter unique rows
    @jax.jit
    def scatter_segsum(idx, wk, c1, c2, g):
        m = idx.shape[0]
        lane = jnp.arange(8, dtype=jnp.int32)[None, :]
        w8 = (
            jnp.where(lane == 0, wk[:, 0:1], 0.0)
            + jnp.where(lane == c1[:, None], wk[:, 1:2], 0.0)
            + jnp.where(lane == c2[:, None], wk[:, 2:3], 0.0)
            + jnp.where(lane == 7, wk[:, 3:4], 0.0)
        )
        contrib = jnp.repeat(w8, F, axis=1) * jnp.tile(g, (1, 8))
        iota = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
        idx_s, perm = jax.lax.sort((idx, iota), num_keys=1)
        c_s = contrib[perm]
        seg = jnp.concatenate(
            [jnp.ones((1,), bool), idx_s[1:] != idx_s[:-1]])
        sid = jnp.cumsum(seg.astype(jnp.int32)) - 1
        summed = jax.ops.segment_sum(
            c_s, sid, num_segments=m)          # [m, 16] (ragged tail 0)
        # entry id per segment (idx_s is constant within a segment;
        # unused ragged-tail sids get 0 and scatter zero rows there)
        entry = (
            jnp.zeros((m,), jnp.int32).at[sid].max(idx_s)
        )
        return (
            jnp.zeros((ROWS_BIG, 8 * F), jnp.float32)
            .at[entry]
            .add(summed, mode="promise_in_bounds")
        )

    out["scatter_segsum_ms"] = timed(
        scatter_segsum, idx_big, wk, c1, c2, g) * 1e3
    print(f"scatter_segsum: {out['scatter_segsum_ms']:.1f}", flush=True)

    fn_small = jax.jit(functools.partial(
        sorted_tet_factor_grad, total_entries=ROWS_SMALL))
    out["small_t_sorted_ms"] = timed(
        fn_small, idx_small, wk, c1, c2, g) * 1e3
    print(f"small_t_sorted: {out['small_t_sorted_ms']:.1f}", flush=True)

    print("PROFILE_FIELDOP " + json.dumps(
        {k: (round(v, 2) if isinstance(v, float) else v)
         for k, v in out.items()}), flush=True)


if __name__ == "__main__":
    main()

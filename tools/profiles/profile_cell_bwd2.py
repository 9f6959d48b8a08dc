"""Round-3 cell-backward decomposition, part 2 (tmux-run: compiles are
~6 min each on the remote toolchain).

Known (profile_cell_bwd.py, bench scale M=4.2M rows, rw=16, E=903k):
  sort17 9.7 ms | stack 3.9 ms | outer 23 ms | full 80 ms
  J=512 vs 1024: same | bf16 matmul vs f32: 77.6 vs 80 (not matmul)
=> ~66 ms lives in the Pallas row-accumulate kernel; this script
   isolates DMA layout (dense128), stream width (rw32 = L8/F4 scale),
   the lane-mask build (nomask), and kernel-only on presorted input.
"""
import functools
import sys, time
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from quadraturefields_tpu.ops import hashgrid_sorted as hs

M = (1 << 18) * 16
E = 903456
RW = 16

key = jax.random.PRNGKey(0)


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(name, fn, *args, n=10):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = _sync(out)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = _sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)


def make_inputs(m, rw, e):
    idx = jax.random.randint(key, (m,), 0, e, jnp.int32)
    vals = jax.random.normal(jax.random.PRNGKey(1), (m, rw), jnp.float32)
    return idx, vals


def kernel_only(keys_sorted, svals, total_entries, j_tile=512,
                window=hs.W, matmul="split2", mask=True):
    """The pallas_call of sorted_row_grad on PRE-SORTED input."""
    mm, rw = svals.shape
    epr = hs.LANES // rw
    n_tiles = mm // j_tile
    tot_rows = -(-total_entries // epr)
    n_blocks = -(-tot_rows // window)
    rows_pad = n_blocks * window
    first_rows = keys_sorted[::j_tile].astype(jnp.int32) // epr
    window_ids, slice_ids = hs._merge_path(
        first_rows, n_tiles, n_blocks, window
    )
    grid = n_tiles + n_blocks - 1
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1, j_tile), lambda i, w, s: (s[i], 0, 0)),
            pl.BlockSpec((j_tile, 1), lambda i, w, s: (s[i], 0)),
            pl.BlockSpec((j_tile, rw), lambda i, w, s: (s[i], 0)),
        ],
        out_specs=pl.BlockSpec(
            (window, hs.LANES), lambda i, w, s: (w[i], 0)
        ),
    )
    kern = functools.partial(
        hs._row_acc_kernel, row_width=rw, j_tile=j_tile, window=window,
        matmul=matmul,
    ) if mask else functools.partial(
        _nomask_kernel, j_tile=j_tile, window=window,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_pad, hs.LANES), jnp.float32),
    )(
        window_ids, slice_ids,
        keys_sorted.reshape(n_tiles, 1, j_tile),
        keys_sorted.reshape(n_tiles * j_tile, 1),
        svals.reshape(n_tiles * j_tile, rw),
    )
    return out


def _nomask_kernel(win_ref, slice_ref, krow_ref, kcol_ref, vals_ref,
                   out_ref, *, j_tile, window):
    """Timing-only: A @ lane-tiled vals WITHOUT the e%epr lane mask
    (wrong values, same shapes/traffic minus one iota-compare+where)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    prev = win_ref[jnp.maximum(i - 1, 0)]
    is_new = (i == 0) | (win_ref[i] != prev)

    @pl.when(is_new)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rw = vals_ref.shape[1]
    epr = hs.LANES // rw
    e_row = krow_ref[0].astype(jnp.int32)
    rel = e_row // epr - win_ref[i] * window
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (window, j_tile), 0)
    A = (row_iota == rel).astype(jnp.bfloat16)
    vt = pltpu.repeat(vals_ref[:], epr, 1).astype(jnp.bfloat16)
    out_ref[:] = out_ref[:] + jax.lax.dot_general(
        A, vt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


WHICH = set(sys.argv[1:]) or {"kernel", "dense128", "rw32", "nomask"}

if "kernel" in WHICH:
    idx, vals = make_inputs(M, RW, E)
    sk = jnp.sort(idx.astype(jnp.uint32))
    timeit("kernel-only rw=16 presorted", jax.jit(
        lambda k, v: kernel_only(k, v, E)), sk, vals)

if "nomask" in WHICH:
    idx, vals = make_inputs(M, RW, E)
    sk = jnp.sort(idx.astype(jnp.uint32))
    timeit("kernel-only rw=16 nomask bf16", jax.jit(
        lambda k, v: kernel_only(k, v, E, mask=False)), sk, vals)

if "dense128" in WHICH:
    M2, E2 = M // 8, E // 8 + 1
    idx2, vals2 = make_inputs(M2, 128, E2)
    sk2 = jnp.sort(idx2.astype(jnp.uint32))
    timeit("kernel-only rw=128 presorted (same bytes)", jax.jit(
        lambda k, v: kernel_only(k, v, E2)), sk2, vals2)

if "rw32" in WHICH:
    # L=8/F=4 encoding scale: half the rows, double the width
    M3, E3 = M // 2, E
    idx3, vals3 = make_inputs(M3, 32, E3)
    timeit("sorted_row_grad rw=32 M/2 (L8F4 scale)", jax.jit(
        functools.partial(hs.sorted_row_grad, total_entries=E3)),
        idx3, vals3)

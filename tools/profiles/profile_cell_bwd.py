"""Decompose the cell-layout backward: 17-op sort vs 2-op sort +
row-gather-by-permutation vs the Pallas accumulate. Host-transfer
synced (bench.py header)."""
import functools
import sys, time
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from quadraturefields_tpu.ops.hashgrid_sorted import sorted_row_grad

M = (1 << 18) * 16          # 4.2M contributions (bench scale)
E = 903456                  # cell table rows at bench scale
RW = 16

key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (M,), 0, E, jnp.int32)
vals = jax.random.normal(jax.random.PRNGKey(1), (M, RW), jnp.float32)
cols = tuple(vals[:, j] for j in range(RW))


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(name, fn, *args, n=10):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = _sync(out)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = _sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)


WHICH = set(sys.argv[1:]) or {"sort17", "sort2", "gatherperm", "stack",
                              "full", "outer"}

if "sort17" in WHICH:
    def s17(i, *cs):
        return jax.lax.sort((i.astype(jnp.uint32),) + cs, num_keys=1)[0]
    timeit("sort 1key+16payload 4.2M", jax.jit(s17), idx, *cols)

if "sort2" in WHICH:
    def s2(i):
        return jax.lax.sort(
            (i.astype(jnp.uint32),
             jnp.arange(M, dtype=jnp.int32)), num_keys=1
        )
    timeit("sort 1key+iota 4.2M", jax.jit(s2), idx)

if "gatherperm" in WHICH:
    def gp(i, v):
        _, perm = jax.lax.sort(
            (i.astype(jnp.uint32),
             jnp.arange(M, dtype=jnp.int32)), num_keys=1
        )
        return v[perm]
    timeit("sort2 + row16 permutation gather", jax.jit(gp), idx, vals)

if "stack" in WHICH:
    def st(*cs):
        return jnp.stack(cs, axis=-1)
    timeit("stack 16 cols -> [M,16]", jax.jit(st), *cols)

if "outer" in WHICH:
    w8 = jax.random.normal(key, (1 << 18, 16, 8), jnp.float32)
    g2 = jax.random.normal(key, (1 << 18, 16, 2), jnp.float32)
    def ou(w, g):
        return (w[..., :, None] * g[..., None, :]).reshape(-1, RW)
    timeit("contrib outer product build", jax.jit(ou), w8, g2)

if "full" in WHICH:
    timeit("sorted_row_grad full", jax.jit(
        lambda i, v: sorted_row_grad(i, v, E)), idx, vals)

if "sweep" in WHICH:
    for J in (1024, 2048, 4096):
        for WIN in (256,):
            timeit(
                f"sorted_row_grad J={J} W={WIN}",
                jax.jit(functools.partial(
                    sorted_row_grad, total_entries=E,
                    j_tile=J, window=WIN,
                )),
                idx, vals,
            )

if "dense128" in WHICH:
    # same value volume, rw=128 (epr=1): dense VMEM blocks, no lane
    # masking — isolates the narrow-block DMA/layout cost
    M2 = M // 8
    E2 = E // 8 + 1
    idx2 = jax.random.randint(key, (M2,), 0, E2, jnp.int32)
    vals2 = jax.random.normal(jax.random.PRNGKey(2), (M2, 128),
                              jnp.float32)
    timeit(
        "sorted_row_grad rw=128 (same bytes)",
        jax.jit(functools.partial(
            sorted_row_grad, total_entries=E2,
        )),
        idx2, vals2,
    )

if "fullpacked" in WHICH:
    timeit("sorted_row_grad full packed f32", jax.jit(
        lambda i, v: sorted_row_grad(i, v, E)), idx, vals)
    timeit("sorted_row_grad full packed split2", jax.jit(
        lambda i, v: sorted_row_grad(i, v, E, matmul="split2")),
        idx, vals)

if "prec" in WHICH:
    for mm in ("bf16", "split2", "f32"):
        timeit(
            f"sorted_row_grad matmul={mm}",
            jax.jit(functools.partial(
                sorted_row_grad, total_entries=E, matmul=mm,
            )),
            idx, vals,
        )

if "packedvs" in WHICH:
    # round-3 packed-input kernel vs the narrow-block kernel, full
    # sorted_row_grad at bench scale
    timeit("full packed=True", jax.jit(functools.partial(
        sorted_row_grad, total_entries=E, packed=True)), idx, vals)
    timeit("full packed=False", jax.jit(functools.partial(
        sorted_row_grad, total_entries=E, packed=False)), idx, vals)

if "v2" in WHICH:
    # round-3 v2: 2-op sort + permutation row gather feeding the packed
    # kernel, vs the 17-op payload sort
    timeit("full v2 perm+packed", jax.jit(functools.partial(
        sorted_row_grad, total_entries=E, sort_mode="perm")), idx, vals)

if "v2parts" in WHICH:
    def permgather(i, v):
        k, p = jax.lax.sort(
            (i.astype(jnp.uint32), jnp.arange(M, dtype=jnp.int32)),
            num_keys=1)
        return k, v[p]
    timeit("sort2+rowgather only", jax.jit(permgather), idx, vals)

    def packreshape(i, v):
        k, p = jax.lax.sort(
            (i.astype(jnp.uint32), jnp.arange(M, dtype=jnp.int32)),
            num_keys=1)
        return k, v[p].reshape(M // 8, 128)
    timeit("sort2+rowgather+packreshape", jax.jit(packreshape), idx, vals)

    def transp(i):
        k, p = jax.lax.sort(
            (i.astype(jnp.uint32), jnp.arange(M, dtype=jnp.int32)),
            num_keys=1)
        return k.reshape(M // 8, 8).T
    timeit("sort2+keysT", jax.jit(transp), idx)

if "outer2" in WHICH:
    # 2D contribution build (hashgrid.py fix) vs the 4D layout
    L8, F2 = 16, 2
    npt = M // L8
    w8 = jax.random.normal(key, (npt, L8 * 8), jnp.float32)
    g2 = jax.random.normal(key, (npt, L8 * F2), jnp.float32)
    def ou4(w, g):
        return (w.reshape(npt, L8, 8, 1)
                * g.reshape(npt, L8, 1, F2)).reshape(npt * L8, 16)
    def ou2(w, g):
        return (jnp.repeat(w.reshape(npt * L8, 8), F2, axis=1)
                * jnp.tile(g.reshape(npt * L8, F2), (1, 8)))
    timeit("outer 4D (old)", jax.jit(ou4), w8, g2)
    timeit("outer 2D (new)", jax.jit(ou2), w8, g2)

if "sortbytes" in WHICH:
    # is the 17-op sort byte-bound? 9-op (key + 8 u32-packed-bf16
    # pairs) moves half the payload bytes
    def s9(i, v):
        vb = v.astype(jnp.bfloat16)
        u = jax.lax.bitcast_convert_type(
            vb.reshape(M, 8, 2), jnp.uint32
        ).reshape(M, 8)
        ops = (i.astype(jnp.uint32),) + tuple(
            u[:, c] for c in range(8)
        )
        return jax.lax.sort(ops, num_keys=1)[0]
    timeit("sort 1key+8xu32(bf16 pairs)", jax.jit(s9), idx, vals)

if "sorthalfM" in WHICH:
    # L8F4 regime: half the elements, same total payload bytes
    M2 = M // 2
    idx2 = jax.random.randint(key, (M2,), 0, E, jnp.int32)
    cols32 = tuple(
        jax.random.normal(jax.random.PRNGKey(c), (M2,), jnp.float32)
        for c in range(32)
    )
    def s33(i, *cs):
        return jax.lax.sort((i.astype(jnp.uint32),) + cs, num_keys=1)[0]
    timeit("sort 1key+32payload 2.1M", jax.jit(s33), idx2, *cols32)

if "kernelpacked" in WHICH:
    # packed kernel on PRE-SORTED input: isolates kernel cost from sort
    import jax.numpy as jnp2
    sk = jnp.sort(idx.astype(jnp.uint32))
    from quadraturefields_tpu.ops import hashgrid_sorted as hs

    def kp(keys_sorted, v):
        mm = keys_sorted.shape[0]
        spr = 8
        J = 1024
        n_tiles = mm // J
        epr = 8
        tot_rows = -(-E // epr)
        n_blocks = -(-tot_rows // hs.W)
        rows_pad = n_blocks * hs.W
        first_rows = keys_sorted[::J].astype(jnp.int32) // epr
        window_ids, slice_ids = hs._merge_path(
            first_rows, n_tiles, n_blocks, hs.W
        )
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        keys_q = keys_sorted.reshape(mm // spr, spr)
        keys_t = keys_q.T
        q = J // spr
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles + n_blocks - 1,),
            in_specs=[
                pl.BlockSpec((spr, q), lambda i, w, s: (0, s[i])),
                pl.BlockSpec((q, spr), lambda i, w, s: (s[i], 0)),
                pl.BlockSpec((q, hs.LANES), lambda i, w, s: (s[i], 0)),
            ],
            out_specs=pl.BlockSpec(
                (hs.W, hs.LANES), lambda i, w, s: (w[i], 0)
            ),
        )
        return pl.pallas_call(
            functools.partial(
                hs._row_acc_kernel_packed, row_width=16, j_tile=J,
                window=hs.W, matmul="f32",
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows_pad, hs.LANES),
                                           jnp.float32),
        )(window_ids, slice_ids, keys_t, keys_q,
          v.reshape(mm // spr, 128))
    timeit("kernel-only packed presorted", jax.jit(kp), sk, vals)

if "sortbytes2" in WHICH:
    # DCE-proof: consume every sorted operand
    def s9b(i, v):
        vb = v.astype(jnp.bfloat16)
        u = jax.lax.bitcast_convert_type(
            vb.reshape(M, 8, 2), jnp.uint32
        ).reshape(M, 8)
        ops = (i.astype(jnp.uint32),) + tuple(u[:, c] for c in range(8))
        out = jax.lax.sort(ops, num_keys=1)
        return sum(o[::1024].astype(jnp.float32).sum() for o in out)
    timeit("sort9 u32(bf16x2) consumed", jax.jit(s9b), idx, vals)

    def s17b(i, v):
        ops = (i.astype(jnp.uint32),) + tuple(
            v[:, c] for c in range(16)
        )
        out = jax.lax.sort(ops, num_keys=1)
        return sum(o[::1024].astype(jnp.float32).sum() for o in out)
    timeit("sort17 f32 consumed", jax.jit(s17b), idx, vals)

    def s17h(i, v):
        vb = v.astype(jnp.bfloat16)
        ops = (i.astype(jnp.uint32),) + tuple(
            vb[:, c] for c in range(16)
        )
        out = jax.lax.sort(ops, num_keys=1)
        return sum(o[::1024].astype(jnp.float32).sum() for o in out)
    timeit("sort17 bf16 consumed", jax.jit(s17h), idx, vals)

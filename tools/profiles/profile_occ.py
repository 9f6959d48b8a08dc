"""Occupancy-lookup probe: can the march's 13.3 ns/idx occupancy
gathers (2/3 of the 62 ms march, profile_march.py) be beaten?

Candidates at bench shapes (coarse 2.13M probes on a 32^3 grid, fine
1.05M probes on a 128^3 grid, from profile_march's decomposition):

  A. current: 3-D advanced-index gather on the bool binaries
  B. XLA flat-index gather, dtype ladder (bool / int8 / f32)
  C. Pallas bit-table lookup, coarse: the 32^3 grid is 32768 bits =
     exactly ONE [8,128] u32 tile -> 8 unrolled (broadcast + lane
     dynamic_gather + select) steps per query block. Pure VMEM.
  D. Pallas bit-table lookup, fine: 128^3 bits = [512,128] u32 ->
     fori_loop over 64 groups x 8 unrolled rows of the same shuffle.

Run on the chip:  python tools/profiles/profile_occ.py
"""
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/qf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2], out


# ---------------------------------------------------------------- data
def make_queries(n, res, seed):
    rng = np.random.default_rng(seed)
    cells = rng.integers(0, res, size=(n, 3)).astype(np.int32)
    return jnp.asarray(cells)


def pack_bits(binaries_flat):
    """[res^3] bool -> [rows,128] int32 bitfield (bit k of word w is
    cell w*32+k)."""
    n = binaries_flat.shape[0]
    words = binaries_flat.reshape(n // 32, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    packed = (words * weights[None, :]).sum(axis=1, dtype=jnp.uint32)
    return packed.astype(jnp.int32).reshape(-1, 128)


# ------------------------------------------------------- XLA variants
@jax.jit
def xla_3d_bool(binaries, cells):
    return binaries[cells[:, 0], cells[:, 1], cells[:, 2]]


@functools.partial(jax.jit, static_argnums=(2,))
def xla_flat(flat, cells, res):
    idx = (cells[:, 0] * res + cells[:, 1]) * res + cells[:, 2]
    return flat[idx]


# -------------------------------------------------- Pallas bit lookup
def _bit_kernel(t_ref, q_ref, o_ref, *, rows):
    """q_ref: [B,128] flat cell idx; t_ref: [rows,128] i32 bitfield."""
    q = q_ref[:]
    w = q >> 5            # word index
    b = q & 31
    wl = w & 127          # lane of the word
    ws = w >> 7           # sublane row of the word
    acc = jnp.zeros(q.shape, jnp.int32)
    if rows <= 8:
        src = t_ref[:]
        for s in range(rows):
            row = jnp.broadcast_to(src[s:s + 1, :], q.shape)
            g = jnp.take_along_axis(row, wl, axis=1)
            acc = jnp.where(ws == s, g, acc)
    else:
        def body(gi, acc):
            blk = t_ref[pl.ds(gi * 8, 8), :]
            for s in range(8):
                row = jnp.broadcast_to(blk[s:s + 1, :], acc.shape)
                g = jnp.take_along_axis(row, wl, axis=1)
                acc = jnp.where(ws == gi * 8 + s, g, acc)
            return acc
        acc = jax.lax.fori_loop(0, rows // 8, body, acc)
    o_ref[:] = (acc >> b) & 1


@functools.partial(jax.jit, static_argnums=(2,))
def pallas_bits(table, cells_flat_idx, block_rows):
    rows = table.shape[0]
    n = cells_flat_idx.shape[0]
    per_block = block_rows * 128
    n_pad = -(-n // per_block) * per_block
    q = jnp.pad(cells_flat_idx, (0, n_pad - n)).reshape(-1, 128)
    out = pl.pallas_call(
        functools.partial(_bit_kernel, rows=rows),
        grid=(n_pad // per_block,),
        in_specs=[
            pl.BlockSpec((rows, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32),
    )(table, q)
    return out.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnums=(2, 3))
def pallas_occ(table, cells, res, block_rows):
    idx = (cells[:, 0] * res + cells[:, 1]) * res + cells[:, 2]
    return pallas_bits(table, idx, block_rows) > 0


def main():
    print(jax.devices(), flush=True)
    results = {}
    for name, res, n in [("coarse", 32, 8192 * 260),
                         ("fine", 128, 1 << 20)]:
        rng = np.random.default_rng(1)
        binaries = jnp.asarray(
            rng.random((res, res, res)) < 0.1
        )
        flatb = binaries.reshape(-1)
        cells = make_queries(n, res, seed=2)
        ref = np.asarray(xla_3d_bool(binaries, cells))

        t, _ = timeit(xla_3d_bool, binaries, cells)
        print(f"{name}: xla_3d_bool           {t*1e3:8.2f} ms "
              f"({t/n*1e9:5.2f} ns/idx)", flush=True)
        results[f"{name}_3d"] = t

        for dt, label in [(None, "bool"), (jnp.int8, "i8"),
                          (jnp.float32, "f32")]:
            flat = flatb if dt is None else flatb.astype(dt)
            t, out = timeit(xla_flat, flat, cells, res)
            ok = np.array_equal(np.asarray(out) != 0, ref)
            print(f"{name}: xla_flat_{label:<5}        {t*1e3:8.2f} ms "
                  f"({t/n*1e9:5.2f} ns/idx) ok={ok}", flush=True)
            results[f"{name}_flat_{label}"] = t

        table = pack_bits(flatb)
        for block_rows in (256, 512, 1024):
            try:
                t, out = timeit(pallas_occ, table, cells, res, block_rows)
                ok = np.array_equal(np.asarray(out), ref)
                print(f"{name}: pallas_bits b{block_rows:<5}     "
                      f"{t*1e3:8.2f} ms ({t/n*1e9:5.2f} ns/idx) ok={ok}",
                      flush=True)
                results[f"{name}_pallas_{block_rows}"] = t
            except Exception as e:
                print(f"{name}: pallas_bits b{block_rows} FAIL "
                      f"{str(e).splitlines()[0][:140]}", flush=True)
    print(results)


if __name__ == "__main__":
    main()

"""Pallas bit-table occupancy lookup.

The two-level march's occupancy gathers run at ~13.3 ns/idx on v5e —
2.7x the in-context table-gather floor — and are 2/3 of the march
(PERF_NOTES.md round-3 profile_march decomposition). For the COARSE
grid the whole occupancy field fits in a handful of [8, 128] u32 tiles
when packed as bits (32^3 cells = exactly one tile), so the lookup can
be a pure-VMEM lane shuffle instead of an HBM gather: broadcast each
bitfield row, `dynamic_gather` along the 128-lane axis, select by
sublane row, then extract the query's bit. Measured (isolated probe,
tools/profiles/profile_occ.py): 1.7x over the XLA flat gather at the
coarse shape; only 1.2x at the fine 128^3 shape whose 512-row bitfield
needs a 64-iteration loop of shuffles — so this path is applied to the
coarse lookup only and the fine lookup stays an XLA gather.

Replaces (for the coarse level) the binaries gather inside nerfacc's
CUDA grid traversal (reference occupancy test in
nerfacc.OccGridEstimator.sampling, call site examples/utils.py:137-147).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# rows beyond which the per-block shuffle loop stops paying for itself
# (probe: 8 rows -> 1.7x win, 512 rows -> ~1.2x; gate well below that)
_MAX_BIT_ROWS = 64


def pack_occupancy_bits(binaries):
    """[res,res,res] bool -> [res^3/4096, 128] int32 bitfield.

    Bit k of word w encodes flat cell w*32 + k (x-major flattening,
    matching occupancy_lookup's (x, y, z) indexing). Pure vector math —
    cheap enough to run in-step on the coarse grid.
    """
    flat = binaries.reshape(-1)
    n = flat.shape[0]
    assert n % 4096 == 0, "bit packing needs res^3 % 4096 == 0"
    words = flat.reshape(n // 32, 32).astype(jnp.uint32)
    weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    packed = (words * weights[None, :]).sum(axis=1, dtype=jnp.uint32)
    return packed.astype(jnp.int32).reshape(-1, 128)


def _bit_lookup_kernel(t_ref, q_ref, o_ref, *, rows):
    """q_ref: [B,128] flat cell indices; t_ref: [rows,128] i32 bits."""
    q = q_ref[:]
    w = q >> 5            # word index of the query's cell
    b = q & 31            # bit within the word
    wl = w & 127          # lane holding the word
    ws = w >> 7           # sublane row holding the word
    acc = jnp.zeros(q.shape, jnp.int32)
    if rows <= 8:
        src = t_ref[:]
        for s in range(rows):
            row = jnp.broadcast_to(src[s:s + 1, :], q.shape)
            g = jnp.take_along_axis(row, wl, axis=1)
            acc = jnp.where(ws == s, g, acc)
    else:
        import jax.experimental.pallas as pl

        def body(gi, acc):
            blk = t_ref[pl.ds(gi * 8, 8), :]
            for s in range(8):
                row = jnp.broadcast_to(blk[s:s + 1, :], acc.shape)
                g = jnp.take_along_axis(row, wl, axis=1)
                acc = jnp.where(ws == gi * 8 + s, g, acc)
            return acc

        acc = jax.lax.fori_loop(0, rows // 8, body, acc)
    o_ref[:] = (acc >> b) & 1


@functools.partial(jax.jit, static_argnums=(2, 3))
def _bit_lookup(table, flat_idx, block_rows: int, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = table.shape[0]
    n = flat_idx.shape[0]
    per_block = block_rows * 128
    n_pad = -(-n // per_block) * per_block
    q = jnp.pad(flat_idx, (0, n_pad - n)).reshape(-1, 128)
    out = pl.pallas_call(
        functools.partial(_bit_lookup_kernel, rows=rows),
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
        interpret=interpret,
    )(table, q)
    return out.reshape(-1)[:n]


def bits_lookup_applicable(res: int) -> bool:
    """Whether the Pallas bit path covers a res^3 grid profitably."""
    if os.environ.get("QF_OCC_BITS", "1") == "0":
        return False
    if res % 16 != 0:
        return False
    rows = res**3 // 4096
    return 1 <= rows <= _MAX_BIT_ROWS


def occupancy_lookup_bits(binaries, aabb, x, *, block_rows: int = 256,
                          interpret: bool | None = None):
    """Drop-in for grid.occupancy_lookup on small (coarse) grids.

    Same semantics: binaries[cell(x)], out-of-box -> False. On TPU the
    bit extraction runs as the Pallas VMEM kernel; elsewhere (CPU
    tests) it falls back to an XLA gather on the same packed bitfield
    so the packing path is exercised everywhere.
    """
    res = binaries.shape[0]
    unit = (x - aabb[:3]) / (aabb[3:] - aabb[:3])
    inside = jnp.all((unit >= 0.0) & (unit < 1.0), axis=-1)
    cell = jnp.clip((unit * res).astype(jnp.int32), 0, res - 1)
    flat_idx = (cell[..., 0] * res + cell[..., 1]) * res + cell[..., 2]
    shape = flat_idx.shape
    flat_idx = flat_idx.reshape(-1)

    table = pack_occupancy_bits(binaries)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if interpret:
        # XLA fallback: gather the word, extract the bit
        words = table.reshape(-1)
        bit = (words[flat_idx >> 5] >> (flat_idx & 31)) & 1
    else:
        bit = _bit_lookup(table, flat_idx, block_rows, False)
    occ = (bit > 0).reshape(shape)
    return occ & inside

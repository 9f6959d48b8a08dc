"""Sorted chunk-accumulate kernel for the hash-table gradient.

STATUS: correct (see tests/test_hashgrid_backward.py) but NOT wired into
the encoder VJP. Measured on v5e it runs at ~5.5 s for 16.8M
contributions: the one-hot matmul places each contribution at the cost
of CHUNK x LANES = 32k MACs (1.1 PFLOP/step total) — amplification no
tile-size choice fixes. Together with the sliding-window variant
(serialized by in-loop DMAs) this bounds the design space: on v5e,
dynamic placement is either XLA scatter (~13 ns/scalar, the floor the
shipped flat-scatter VJP already hits), one-hot matmuls (k-FLOP
amplification), or per-element DMA (~us each). Kept as the measured
record for the round-2 kernel work.

XLA's TPU scatter costs ~13 ns per scalar index (PERF_NOTES.md), making
the table gradient the dominant cost of NGP training. This path
replaces the scatter with:

  1. one multi-operand `lax.sort` keyed by table *row* (the 128-lane
     row of the value layout) — measured 84 ms for 16.8M 4-operand
     elements on v5e;
  2. an XLA `searchsorted` partitioning the sorted stream by output
     chunk (CHUNK rows each);
  3. a Pallas kernel where grid step c OWNS output chunk c: it walks
     its contribution range with dynamic-offset DMAs from HBM and
     accumulates via one-hot matmuls [CHUNK, TILE] @ [TILE, 128] on
     the MXU — no scatter anywhere, each output row written exactly
     once.

Value layout: flat value id v = entry*F + f; row = v >> 7,
lane = v & 127. F == 2 with v0 even means both features of an entry
land in the same row at adjacent lanes, so one contribution carries a
(v0, v1) pair.

An earlier sliding-window variant (while-loop flushes inside the
kernel) was correct but ran 100x slow — data-dependent while loops with
DMAs serialize badly; the chunk-owner structure keeps the grid static.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE = 1024      # contributions per inner step (i32 1-D layout unit)
CHUNK = 256      # output rows owned per grid step


def _kernel(starts_ref,     # scalar prefetch: [n_chunks+1] i32
            keys_hbm,       # [M] i32 sorted row ids (ANY)
            lane_hbm,       # [M] i32 (ANY)
            v0_hbm,         # [M] f32 (ANY)
            v1_hbm,         # [M] f32 (ANY)
            out_ref,        # [CHUNK, 128] f32 block (VMEM)
            kbuf, lbuf, v0buf, v1buf,  # VMEM [TILE] scratch
            sems,           # DMA semaphores (4,)
            *, m_total: int):
    c = pl.program_id(0)
    row0 = c * CHUNK
    start = starts_ref[c]
    end = starts_ref[c + 1]
    n = end - start

    out_ref[:] = jnp.zeros((CHUNK, LANES), jnp.float32)

    def inner(i, _):
        # HBM DMA slices must be TILE-aligned (Mosaic can't prove
        # divisibility of arbitrary offsets): walk aligned tiles
        # covering [start, end) and mask ownership below
        off = (start // TILE + i) * TILE
        off = pl.multiple_of(
            jnp.minimum(off, m_total - TILE), TILE
        )
        for ref, buf, s in (
            (keys_hbm, kbuf, 0),
            (lane_hbm, lbuf, 1),
            (v0_hbm, v0buf, 2),
            (v1_hbm, v1buf, 3),
        ):
            pltpu.make_async_copy(
                ref.at[pl.ds(off, TILE)], buf, sems.at[s]
            ).start()
        for ref, buf, s in (
            (keys_hbm, kbuf, 0),
            (lane_hbm, lbuf, 1),
            (v0_hbm, v0buf, 2),
            (v1_hbm, v1buf, 3),
        ):
            pltpu.make_async_copy(
                ref.at[pl.ds(off, TILE)], buf, sems.at[s]
            ).wait()

        keys = kbuf[:]
        lane0 = lbuf[:]
        v0 = v0buf[:]
        v1 = v1buf[:]
        # exact ownership mask: this chunk's rows only (slices overlap
        # neighbors at the boundaries)
        pos_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE,), 0)
        in_slice = (pos_iota + off >= start) & (pos_iota + off < end)
        mask = in_slice & (keys >= row0) & (keys < row0 + CHUNK)
        slots = jnp.where(mask, keys - row0, CHUNK)  # CHUNK = miss

        lane_iota = jax.lax.broadcasted_iota(
            jnp.int32, (TILE, LANES), 1
        )
        V = jnp.where(
            lane_iota == lane0[:, None], v0[:, None], 0.0
        ) + jnp.where(
            lane_iota == (lane0 + 1)[:, None], v1[:, None], 0.0
        )
        slot_iota = jax.lax.broadcasted_iota(
            jnp.int32, (CHUNK, TILE), 0
        )
        onehot = (slot_iota == slots[None, :]).astype(jnp.bfloat16)
        out_ref[:] += jax.lax.dot_general(
            onehot,
            V.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    n_inner = jnp.where(
        n > 0, (end - 1) // TILE - start // TILE + 1, 0
    )
    jax.lax.fori_loop(0, n_inner, inner, 0)


def sorted_table_grad(
    row_ids,   # [M] i32: value row ids (= (entry*F) >> 7)
    lane0,     # [M] i32 even lane of feature 0
    v0,        # [M] f32
    v1,        # [M] f32
    total_values: int,
    interpret: bool = False,
):
    """Accumulate per-entry feature pairs into a dense value-space
    gradient. Returns [total_values] f32 (flattened [entries, F])."""
    rows_total = -(-total_values // LANES)
    rows_total = -(-rows_total // CHUNK) * CHUNK
    m = row_ids.shape[0]
    m_pad = max(-(-m // TILE) * TILE, TILE)
    if m_pad != m:
        pad = m_pad - m
        row_ids = jnp.concatenate(
            [row_ids, jnp.full((pad,), rows_total - 1, jnp.int32)]
        )
        lane0 = jnp.concatenate([lane0, jnp.zeros((pad,), jnp.int32)])
        v0 = jnp.concatenate([v0, jnp.zeros((pad,))])
        v1 = jnp.concatenate([v1, jnp.zeros((pad,))])

    keys_s, lane_s, v0_s, v1_s = jax.lax.sort(
        (row_ids, lane0, v0, v1), num_keys=1
    )
    n_chunks = rows_total // CHUNK
    bounds = jnp.arange(n_chunks + 1, dtype=jnp.int32) * CHUNK
    starts = jnp.searchsorted(keys_s, bounds, side="left").astype(
        jnp.int32
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (CHUNK, LANES), lambda c, *_: (c, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE,), jnp.int32),
            pltpu.VMEM((TILE,), jnp.int32),
            pltpu.VMEM((TILE,), jnp.float32),
            pltpu.VMEM((TILE,), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, m_total=m_pad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (rows_total, LANES), jnp.float32
        ),
        interpret=interpret,
    )(starts, keys_s, lane_s, v0_s, v1_s)
    return out.reshape(-1)[:total_values]

"""Sorted windowed-accumulate table gradient for the hash encoder.

The hash-table gradient is a segment-sum of ~16.8M (entry, value)
contributions into ~7.3M table entries. XLA's TPU scatter-add costs
~8.6 ns per scalar index (measured, tools/profiles/profile_r2c.py), i.e.
~290 ms/step at stage-1 scale — the single largest cost of NGP
training on v5e (reference hot loop: tcnn's fused backward,
examples/radiance_fields/ngp.py:340-358).

This module replaces the scatter with:
  1. ONE `lax.sort` of the contribution stream by table entry
     (u32 key, two f32 feature payloads) — ~95 ms;
  2. a Pallas kernel that walks the sorted stream in [64, 128] tiles
     and accumulates each tile into a W-row window of the packed
     [rows, 128] gradient table with per-sublane-row one-hot matmuls
     A[W,128] @ V[128,128]^T on the MXU — ~2.1 ns/contribution
     (measured; f32 == bf16 speed, so the matmul runs in f32 and the
     result is exact modulo f32 summation order).

Windowing correctness: the out-block index per grid step comes from a
scalar-prefetch array built with a merge-path over (tile-start,
block-start) events, so every (tile, window) overlap is visited, the
windows are visited in non-decreasing order (Pallas keeps a revisited
block in VMEM and flushes on change), every window is visited at least
once (zero-init), and the one-hot build masks rows outside the
window — a tile spanning multiple windows is simply visited once per
window.

Packed layout: entry e, feature f live at flat position e*2+f, i.e.
row e >> 6, lanes (e & 63)*2 and (e & 63)*2 + 1 (both features share a
row, so one matmul per sublane-row carries both).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 64                  # sublane rows per stream tile
TILE = SUB * LANES        # 8192 contributions per grid step
W = 256                   # accumulator window height (rows)


def _use_interpret() -> bool:
    # tests run on the CPU backend; the real chip registers as tpu/axon
    return jax.default_backend() == "cpu"


def _acc_kernel(win_ref, slice_ref, k_ref, v0_ref, v1_ref, out_ref):
    i = pl.program_id(0)
    prev = win_ref[jnp.maximum(i - 1, 0)]
    is_new = (i == 0) | (win_ref[i] != prev)

    @pl.when(is_new)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    e = k_ref[0].astype(jnp.int32)                 # [SUB, 128] entries
    rel = (e >> 6) - win_ref[i] * W                # window-relative rows
    ln0 = (e & 63) * 2
    v0 = v0_ref[0]
    v1 = v1_ref[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    acc = jnp.zeros((W, LANES), jnp.float32)
    for r in range(SUB):
        rr = rel[r:r + 1, :]                       # [1, 128]
        l0 = ln0[r:r + 1, :]
        # A[w, j] = 1 iff contribution j targets window row w
        # (false for every j outside this window — the mask)
        A = (row_iota == rr).astype(jnp.float32)   # [W, 128]
        # V[l, j] = v0_j at lane l0_j, v1_j at lane l0_j + 1
        V = jnp.where(lane_iota == l0, v0[r:r + 1, :], 0.0) + jnp.where(
            lane_iota == l0 + 1, v1[r:r + 1, :], 0.0
        )                                          # [128, 128]
        acc = acc + jax.lax.dot_general(
            A, V, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = out_ref[:] + acc


def _merge_path(first_rows, n_tiles: int, n_blocks: int, window: int = W):
    """Grid schedule: (window_ids, slice_ids), each [n_tiles+n_blocks-1].

    Merge-path over tile-start events (at block coordinate
    first_rows[g] // W) and block-start events: after sorting the
    events (blocks first on ties, so a tile whose previous tile ends
    exactly at a block start still gets visited there), the running
    counts of each event type ARE the per-step (tile, window) pointers.
    """
    fb = first_rows // window                      # [G] tile start block
    pos = jnp.concatenate([
        fb[1:], jnp.arange(1, n_blocks, dtype=fb.dtype)
    ])
    is_tile = jnp.concatenate([
        jnp.ones((n_tiles - 1,), jnp.int32),
        jnp.zeros((n_blocks - 1,), jnp.int32),
    ])
    # sort by (pos, tag) with blocks (tag 0) first on equal pos
    order_key = pos * 2 + is_tile
    _, tag = jax.lax.sort((order_key, is_tile), num_keys=1)
    g_ptr = jnp.cumsum(tag)
    b_ptr = jnp.cumsum(1 - tag)
    zero = jnp.zeros((1,), tag.dtype)
    slice_ids = jnp.concatenate([zero, g_ptr]).astype(jnp.int32)
    window_ids = jnp.concatenate([zero, b_ptr]).astype(jnp.int32)
    return window_ids, slice_ids


def _row_acc_kernel(
    win_ref, slice_ref, krow_ref, kcol_ref, vals_ref, out_ref,
    *, row_width: int, j_tile: int, window: int = W,
    matmul: str = "f32",
):
    """One grid step: place a [J, RW] tile of sorted row-contributions
    into the current [W, 128] window with a single one-hot matmul.

    OUT[w, l] += sum_j 1[rel_j == w] * 1[l // RW == e_j % epr]
                      * vals[j, l % RW]
    The first factor is A [W, J]; the last two collapse into D [J, 128]
    built by lane-tiling vals (pltpu.repeat) and masking the target
    lane block — two iota compares total, no per-sublane loop.
    """
    i = pl.program_id(0)
    prev = win_ref[jnp.maximum(i - 1, 0)]
    is_new = (i == 0) | (win_ref[i] != prev)

    @pl.when(is_new)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    epr = LANES // row_width                      # entries per 128-lane row
    e_row = krow_ref[0].astype(jnp.int32)         # [1, J]
    e_col = kcol_ref[:, 0:1].astype(jnp.int32)    # [J, 1]
    rel = e_row // epr - win_ref[i] * window      # [1, J] window rows
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (window, j_tile), 0)
    A = (row_iota == rel).astype(jnp.float32)     # [W, J]
    vt = pltpu.repeat(vals_ref[:], epr, 1)        # [J, 128] lane-tiled
    lane_iota = jax.lax.broadcasted_iota(
        jnp.int32, (j_tile, LANES), 1
    )
    D = jnp.where(
        lane_iota // row_width == e_col % epr, vt, 0.0
    )                                             # [J, 128]
    dn = (((1,), (0,)), ((), ()))
    if matmul == "f32":
        # full-precision f32 matmul: the MXU runs it as a multi-pass
        # bf16 decomposition — exact but ~3x the MACs of split2
        acc = jax.lax.dot_general(
            A, D, dn, preferred_element_type=jnp.float32,
        )
    else:
        # A is one-hot 0/1, exact in bf16; split D = hi + lo bf16 so
        # each selected value is reproduced with ~16 mantissa bits
        # (vs f32's 24) and accumulation stays f32 on the MXU.
        Ab = A.astype(jnp.bfloat16)
        hi = D.astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            Ab, hi, dn, preferred_element_type=jnp.float32,
        )
        if matmul == "split2":
            lo = (D - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                Ab, lo, dn, preferred_element_type=jnp.float32,
            )
    out_ref[:] = out_ref[:] + acc


def _row_acc_kernel_packed(
    win_ref, slice_ref, keys_t_ref, keys_q_ref, vals_ref, out_ref,
    *, row_width: int, j_tile: int, window: int = W,
    matmul: str = "f32",
):
    """Dense-input variant of _row_acc_kernel (round-3: the [J, rw]
    narrow value blocks cost ~5x their bytes in DMA/layout —
    tools/profiles/profile_cell_bwd2.py: 23.2 ms narrow vs 4.9 ms dense for the
    same payload). Contributions arrive packed `spr` per 128-lane row:
    vals row q holds contributions q*spr..q*spr+spr-1, contribution
    slot s at lanes [s*rw, (s+1)*rw). Keys arrive twice (both tiny):
    keys_t [spr, Q] lane-major for the one-hot row build, keys_q
    [Q, spr] sublane-major for the target-lane-block mask.

    Per slot s: A_s [window, Q] one-hot on window rows, D_s [Q, 128] =
    slot values lane-tiled and masked to the entry's lane block; the
    slot matmuls accumulate into the same [window, 128] window, so the
    MXU MAC count is identical to the narrow kernel's.
    """
    i = pl.program_id(0)
    prev = win_ref[jnp.maximum(i - 1, 0)]
    is_new = (i == 0) | (win_ref[i] != prev)

    @pl.when(is_new)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    epr = LANES // row_width
    spr = LANES // row_width                      # contribution slots/row
    q = j_tile // spr
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (window, q), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (q, LANES), 1)
    win_row0 = win_ref[i] * window
    dn = (((1,), (0,)), ((), ()))
    acc = jnp.zeros((window, LANES), jnp.float32)
    for s in range(spr):
        e_row = keys_t_ref[s:s + 1, :].astype(jnp.int32)   # [1, Q]
        rel = e_row // epr - win_row0
        A = (row_iota == rel)
        e_col = keys_q_ref[:, s:s + 1].astype(jnp.int32)   # [Q, 1]
        vt = pltpu.repeat(
            vals_ref[:, s * row_width:(s + 1) * row_width], spr, 1
        )                                                  # [Q, 128]
        D = jnp.where(lane_iota // row_width == e_col % epr, vt, 0.0)
        if matmul == "f32":
            acc = acc + jax.lax.dot_general(
                A.astype(jnp.float32), D, dn,
                preferred_element_type=jnp.float32,
            )
        else:
            Ab = A.astype(jnp.bfloat16)
            hi = D.astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                Ab, hi, dn, preferred_element_type=jnp.float32,
            )
            if matmul == "split2":
                lo = (D - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                acc = acc + jax.lax.dot_general(
                    Ab, lo, dn, preferred_element_type=jnp.float32,
                )
    out_ref[:] = out_ref[:] + acc


def _row_acc_kernel_pair(
    win_ref, slice_ref, keys_t_ref, keys_q_ref, vals_ref,
    even_ref, odd_ref, *, pair_width: int, j_tile: int, window: int,
):
    """bf16-pair variant: each contribution's F=2 features per corner
    arrive as ONE u32 lane (feature 0 in the low 16 bits, feature 1 in
    the high 16, both bf16), halving sort payload + kernel DMA bytes
    (sort17-f32 60.8 ms vs sort9-u32 37.4 ms at bench scale,
    tools/profiles/profile_cell_bwd.py "sortbytes2"; tcnn itself
    accumulates its table gradient in fp16 atomics, so reduced-precision
    contributions are reference-faithful).

    vals row q holds 16 contributions x 8 u32 lanes; slot s at u32
    lanes [s*8, (s+1)*8). The two feature planes accumulate into
    separate [window, 128] outputs (even = feature 0, odd = feature 1),
    each with entry e at row e//16, lanes (e%16)*8 + c — interleaving
    back to [E, 16] happens outside the kernel in 2D ops.
    """
    i = pl.program_id(0)
    prev = win_ref[jnp.maximum(i - 1, 0)]
    is_new = (i == 0) | (win_ref[i] != prev)

    @pl.when(is_new)
    def _():
        even_ref[:] = jnp.zeros_like(even_ref)
        odd_ref[:] = jnp.zeros_like(odd_ref)

    spr = LANES // pair_width                     # 16 contributions/row
    epr = LANES // pair_width                     # 16 entries/plane row
    q = j_tile // spr
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (window, q), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (q, LANES), 1)
    win_row0 = win_ref[i] * window
    dn = (((1,), (0,)), ((), ()))
    acc_e = jnp.zeros((window, LANES), jnp.float32)
    acc_o = jnp.zeros((window, LANES), jnp.float32)
    for s in range(spr):
        e_row = keys_t_ref[s:s + 1, :].astype(jnp.int32)   # [1, Q]
        rel = e_row // epr - win_row0
        A = (row_iota == rel).astype(jnp.bfloat16)
        e_col = keys_q_ref[:, s:s + 1].astype(jnp.int32)   # [Q, 1]
        vt = pltpu.repeat(
            vals_ref[:, s * pair_width:(s + 1) * pair_width], spr, 1
        )                                                  # [Q,128] u32
        mask = lane_iota // pair_width == e_col % epr
        lo = jax.lax.bitcast_convert_type(
            vt << 16, jnp.float32
        )
        hi = jax.lax.bitcast_convert_type(
            vt & jnp.uint32(0xFFFF0000), jnp.float32
        )
        D_lo = jnp.where(mask, lo, 0.0).astype(jnp.bfloat16)
        D_hi = jnp.where(mask, hi, 0.0).astype(jnp.bfloat16)
        acc_e = acc_e + jax.lax.dot_general(
            A, D_lo, dn, preferred_element_type=jnp.float32,
        )
        acc_o = acc_o + jax.lax.dot_general(
            A, D_hi, dn, preferred_element_type=jnp.float32,
        )
    even_ref[:] = even_ref[:] + acc_e
    odd_ref[:] = odd_ref[:] + acc_o


def _row_acc_kernel_factor(
    win_ref, slice_ref, keys_t_ref, keys_q_ref, vals_ref,
    even_ref, odd_ref, *, f_half: int, pay_w: int, j_tile: int,
    window: int,
):
    """Factorized-payload variant of _row_acc_kernel_pair (tet interp):
    the sort carries each contribution's FACTORS — 4 Kuhn-simplex
    weights (2 packed-bf16 u32 lanes) and the F upstream gradient
    values (F/2 u32 lanes) — instead of the 8*F outer-product values,
    and this kernel recomputes the products in VMEM. The two dynamic
    tet corner slots ride in the key's low 6 bits (key = entry<<6 |
    c1<<3 | c2; slots 0 and 7 are static), so sort order by entry is
    unchanged. Cuts the backward sort from 1+4F to 3+F/2 u32 operands
    (17 -> 5 at F=4) and the vals DMA by 4x.

    Plane layout matches _row_acc_kernel_pair: entry e's block is
    8*f_half lanes at block e % epr; block lane k = corner*f_half + p;
    even plane carries feature 2p, odd feature 2p+1.
    """
    i = pl.program_id(0)
    prev = win_ref[jnp.maximum(i - 1, 0)]
    is_new = (i == 0) | (win_ref[i] != prev)

    @pl.when(is_new)
    def _():
        even_ref[:] = jnp.zeros_like(even_ref)
        odd_ref[:] = jnp.zeros_like(odd_ref)

    pw_plane = 8 * f_half                         # lanes per entry block
    spr = LANES // pay_w                          # contributions per row
    epr = LANES // pw_plane                       # entries per plane row
    q = j_tile // spr
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (window, q), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (q, LANES), 1)
    k_in_block = lane_iota % pw_plane
    c_lane = k_in_block // f_half                 # corner slot per lane
    p_lane = k_in_block % f_half                  # feature pair per lane
    block_lane = lane_iota // pw_plane
    win_row0 = win_ref[i] * window
    dn = (((1,), (0,)), ((), ()))

    def unpack_lo(v):
        return jax.lax.bitcast_convert_type(v << 16, jnp.float32)

    def unpack_hi(v):
        return jax.lax.bitcast_convert_type(
            v & jnp.uint32(0xFFFF0000), jnp.float32
        )

    acc_e = jnp.zeros((window, LANES), jnp.float32)
    acc_o = jnp.zeros((window, LANES), jnp.float32)
    for s in range(spr):
        kt = keys_t_ref[s:s + 1, :].astype(jnp.int32)      # [1, Q]
        rel = (kt >> 6) // epr - win_row0
        A = (row_iota == rel).astype(jnp.bfloat16)         # [window, Q]
        kq = keys_q_ref[:, s:s + 1].astype(jnp.int32)      # [Q, 1]
        ke = kq >> 6
        c1 = (kq >> 3) & 7
        c2 = kq & 7
        # vals lanes are BLOCK-ordered: payload i at lane i*spr + s
        # (sorted_tet_factor_grad stages them 2-D to dodge the 32x
        # tile-padding of a [mm, pay_w] interleaved stack)
        w01 = vals_ref[:, s:s + 1]                         # [Q, 1] u32
        w23 = vals_ref[:, spr + s:spr + s + 1]
        w_sel = (
            jnp.where(c_lane == 0, unpack_lo(w01), 0.0)
            + jnp.where(c_lane == c1, unpack_hi(w01), 0.0)
            + jnp.where(c_lane == c2, unpack_lo(w23), 0.0)
            + jnp.where(c_lane == 7, unpack_hi(w23), 0.0)
        )                                                  # [Q, 128]
        g_even = jnp.zeros((q, LANES), jnp.float32)
        g_odd = jnp.zeros((q, LANES), jnp.float32)
        for j in range(f_half):
            gp = vals_ref[:, (2 + j) * spr + s:(2 + j) * spr + s + 1]
            g_even = g_even + jnp.where(p_lane == j, unpack_lo(gp), 0.0)
            g_odd = g_odd + jnp.where(p_lane == j, unpack_hi(gp), 0.0)
        blockm = block_lane == ke % epr
        D_lo = jnp.where(blockm, w_sel * g_even, 0.0).astype(jnp.bfloat16)
        D_hi = jnp.where(blockm, w_sel * g_odd, 0.0).astype(jnp.bfloat16)
        acc_e = acc_e + jax.lax.dot_general(
            A, D_lo, dn, preferred_element_type=jnp.float32,
        )
        acc_o = acc_o + jax.lax.dot_general(
            A, D_hi, dn, preferred_element_type=jnp.float32,
        )
    even_ref[:] = even_ref[:] + acc_e
    odd_ref[:] = odd_ref[:] + acc_o


def sorted_tet_factor_grad(idx, wk, c1, c2, g, total_entries: int, *,
                           window: int = W, force_kernel: bool = False):
    """Segment-sum tet-interp cell-row contributions into a
    [total_entries, 8*F] table gradient, carrying only the contribution
    FACTORS through the sort (grad_payload="bf16factor").

    idx: [M] entry ids; wk: [M, 4] Kuhn weights (corner order 0, c1,
    c2, 7); c1, c2: [M] the two dynamic corner slot ids (1..6); g:
    [M, F] upstream feature gradients, F even. Each factor rounds to
    bf16 and the product rounds to bf16 before f32 MXU accumulation —
    the same per-contribution precision regime as grad_payload=
    "bf16pair" (tcnn accumulates fp16 atomics upstream)."""
    m, F = g.shape
    assert F % 2 == 0
    f_half = F // 2
    pw_plane = 8 * f_half
    assert pw_plane * 2 <= LANES and LANES % pw_plane == 0
    n_real = 2 + f_half                            # payload u32 lanes
    pay_w = n_real
    while LANES % pay_w:
        pay_w += 1
    spr = LANES // pay_w
    q = 128
    J = q * spr
    epr = LANES // pw_plane
    tot_rows = -(-total_entries // epr)
    n_blocks = -(-tot_rows // window)
    rows_pad = n_blocks * window
    # key = entry<<6 | c1<<3 | c2 — must fit u32 incl. the sentinel
    assert (rows_pad + window) * epr < (1 << 26), total_entries

    def pack(a, b):
        a16 = jax.lax.bitcast_convert_type(
            a.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        b16 = jax.lax.bitcast_convert_type(
            b.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        return a16 | (b16 << 16)

    key = (
        (idx.astype(jnp.uint32) << 6)
        | (c1.astype(jnp.uint32) << 3)
        | c2.astype(jnp.uint32)
    )
    payload = [pack(wk[:, 0], wk[:, 1]), pack(wk[:, 2], wk[:, 3])]
    for j in range(f_half):
        payload.append(pack(g[:, 2 * j], g[:, 2 * j + 1]))

    pad = (-m) % J
    if pad:
        sentinel = jnp.uint32((rows_pad + window) * epr) << 6
        key = jnp.concatenate([key, jnp.full((pad,), sentinel, jnp.uint32)])
        payload = [
            jnp.concatenate([p, jnp.zeros((pad,), jnp.uint32)])
            for p in payload
        ]
    sorted_ops = jax.lax.sort((key,) + tuple(payload), num_keys=1)
    keys = sorted_ops[0]
    cols = list(sorted_ops[1:])
    while len(cols) < pay_w:                       # dead lanes (F=2 case)
        cols.append(jnp.zeros_like(cols[0]))
    mm = keys.shape[0]
    # kernel vals layout: BLOCK order [mm/spr, pay_w*spr] with lane
    # i*spr + s for payload i / in-row contribution s — built by pure
    # 2-D reshape+concat. (The interleaved stack(cols, -1) form goes
    # through a [mm, pay_w] HLO whose minor dim tile-pads 32x — a
    # 16 GB temp at the khady 2^22 contract; PERF_NOTES round 4.)
    svals = jnp.concatenate(
        [c.reshape(mm // spr, spr) for c in cols], axis=1
    )                                              # [mm/spr, LANES]

    if _use_interpret() and not force_kernel:
        # CPU backend: reconstruct the bf16-rounded products and use a
        # plain segment-sum (the unrolled interpret kernel is orders
        # slower; grad_mode "auto" resolves off the sorted path on CPU
        # anyway — this branch serves the parity tests). force_kernel
        # runs the real Pallas kernel in interpret mode (kernel tests).
        return _factor_grad_reference(
            keys, cols, total_entries, F=F, pw_plane=pw_plane
        )

    n_tiles = mm // J
    first_rows = (keys[::J].astype(jnp.int32) >> 6) // epr
    window_ids, slice_ids = _merge_path(
        first_rows, n_tiles, n_blocks, window
    )
    grid = n_tiles + n_blocks - 1
    keys_q = keys.reshape(mm // spr, spr)
    keys_t = keys_q.T
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((spr, q), lambda i, w, s: (0, s[i])),
            pl.BlockSpec((q, spr), lambda i, w, s: (s[i], 0)),
            pl.BlockSpec((q, LANES), lambda i, w, s: (s[i], 0)),
        ],
        out_specs=[
            pl.BlockSpec((window, LANES), lambda i, w, s: (w[i], 0)),
            pl.BlockSpec((window, LANES), lambda i, w, s: (w[i], 0)),
        ],
    )
    even, odd = pl.pallas_call(
        functools.partial(
            _row_acc_kernel_factor, f_half=f_half, pay_w=pay_w,
            j_tile=J, window=window,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, LANES), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(
        window_ids,
        slice_ids,
        keys_t,
        keys_q,
        svals,
    )
    return _interleave_planes(even, odd, total_entries, pw_plane)


def _factor_grad_reference(keys, cols, total_entries: int, *, F: int,
                           pw_plane: int):
    """XLA reference of the factor kernel's math (bit-identical modulo
    f32 summation order): unpack factors, rebuild bf16-rounded products,
    segment-sum. Used on the CPU backend and by the parity tests."""
    f_half = F // 2

    def lo(v):
        return jax.lax.bitcast_convert_type(v << 16, jnp.float32)

    def hi(v):
        return jax.lax.bitcast_convert_type(
            v & jnp.uint32(0xFFFF0000), jnp.float32
        )

    e = (keys >> 6).astype(jnp.int32)
    c1 = ((keys >> 3) & 7).astype(jnp.int32)
    c2 = (keys & 7).astype(jnp.int32)
    w4 = jnp.stack(
        [lo(cols[0]), hi(cols[0]),
         lo(cols[1]), hi(cols[1])], axis=1,
    )                                              # [mm, 4]
    slots = jnp.stack(
        [jnp.zeros_like(c1), c1, c2, jnp.full_like(c1, 7)], axis=1
    )                                              # [mm, 4]
    w8 = jnp.sum(
        jnp.where(
            slots[:, :, None] == jnp.arange(8, dtype=jnp.int32),
            w4[:, :, None], 0.0,
        ),
        axis=1,
    )                                              # [mm, 8]
    gs = []
    for j in range(f_half):
        gs.append(lo(cols[2 + j]))
        gs.append(hi(cols[2 + j]))
    gF = jnp.stack(gs, axis=1)                     # [mm, F]
    contrib = (
        jnp.repeat(w8, F, axis=1) * jnp.tile(gF, (1, 8))
    ).astype(jnp.bfloat16).astype(jnp.float32)     # [mm, 8F]
    valid = e < total_entries
    seg = jax.ops.segment_sum(
        jnp.where(valid[:, None], contrib, 0.0),
        jnp.clip(e, 0, total_entries - 1),
        num_segments=total_entries,
        indices_are_sorted=True,
    )
    return seg


def _interleave_planes(even, odd, total_entries: int, pw: int):
    """[rows_pad, LANES] even/odd feature planes -> [total_entries,
    2*pw] rows.

    Round-5: lane-strided 2-D slices, exactly as _deinterleave_rows —
    the flat strided columns executed as per-element gathers
    (~7.7 ns/elem, ~54 ms/step at the stage-1 headline table's 439k
    cell rows x 16 payload cols); `plane[:, j::pw]` is the same
    element sequence as `plane.reshape(-1)[j::pw]` but lowers as a
    regular vector pattern (58x faster at the corner-grad shape, no
    padded temps; see _deinterleave_rows)."""
    cols = []
    for j in range(pw):
        cols.append(even[:, j::pw].reshape(-1)[:total_entries])
        cols.append(odd[:, j::pw].reshape(-1)[:total_entries])
    return jnp.stack(cols, axis=0).T


def sorted_pair_grad(idx, lo, hi, total_entries: int, *,
                     window: int = W):
    """Segment-sum [M, 8]-wide (lo, hi) feature-pair contributions into
    a [total_entries, 16] table gradient, with contributions rounded to
    bf16 and carried as packed u32 pairs through a 9-operand sort.

    The cell-layout row is row[c*2 + f] (corner c, feature f); lo/hi
    carry feature 0/1 per corner. Accumulation is f32 on the MXU; only
    each individual contribution is bf16-rounded (~0.4% rel), the
    regime tcnn's fp16 atomic accumulation already accepts.
    """
    m, pw = lo.shape
    assert pw * 2 <= LANES and LANES % pw == 0
    spr = LANES // pw                              # contributions/row
    q = 128
    J = q * spr
    epr = LANES // pw                              # entries per plane row
    pad = (-m) % J
    tot_rows = -(-total_entries // epr)
    n_blocks = -(-tot_rows // window)
    rows_pad = n_blocks * window
    # pack: u32 lane = bf16(lo) bits | bf16(hi) bits << 16
    lo16 = jax.lax.bitcast_convert_type(
        lo.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    hi16 = jax.lax.bitcast_convert_type(
        hi.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    u = lo16 | (hi16 << 16)                        # [m, 8] u32
    if pad:
        idx = jnp.concatenate([
            idx, jnp.full((pad,), (rows_pad + window) * epr, jnp.int32)
        ])
        u = jnp.concatenate([u, jnp.zeros((pad, pw), jnp.uint32)])

    ops = (idx.astype(jnp.uint32),) + tuple(
        u[:, c] for c in range(pw)
    )
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    keys = sorted_ops[0]
    svals = jnp.stack(sorted_ops[1:], axis=-1)     # [mm, 8] u32
    return _pair_accumulate(
        keys, svals, total_entries, pw=pw, window=window
    )


def _pair_accumulate(keys, svals, total_entries: int, *, pw: int,
                     window: int = W):
    """Post-sort half of the pair gradient: walk the globally sorted
    (keys, packed-u32 pairs) stream through the windowed-MXU kernel and
    de-interleave the two feature planes into [total_entries, 2*pw]."""
    mm = keys.shape[0]
    spr = LANES // pw
    q = 128
    J = q * spr
    epr = LANES // pw
    assert mm % J == 0, (mm, J)
    n_tiles = mm // J
    tot_rows = -(-total_entries // epr)
    n_blocks = -(-tot_rows // window)
    rows_pad = n_blocks * window

    first_rows = keys[::J].astype(jnp.int32) // epr
    window_ids, slice_ids = _merge_path(
        first_rows, n_tiles, n_blocks, window
    )
    grid = n_tiles + n_blocks - 1
    keys_q = keys.reshape(mm // spr, spr)
    keys_t = keys_q.T
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((spr, q), lambda i, w, s: (0, s[i])),
            pl.BlockSpec((q, spr), lambda i, w, s: (s[i], 0)),
            pl.BlockSpec((q, LANES), lambda i, w, s: (s[i], 0)),
        ],
        out_specs=[
            pl.BlockSpec((window, LANES), lambda i, w, s: (w[i], 0)),
            pl.BlockSpec((window, LANES), lambda i, w, s: (w[i], 0)),
        ],
    )
    even, odd = pl.pallas_call(
        functools.partial(
            _row_acc_kernel_pair, pair_width=pw, j_tile=J,
            window=window,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, LANES), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(
        window_ids,
        slice_ids,
        keys_t,
        keys_q,
        svals.reshape(mm // spr, LANES),
    )
    # interleave feature planes back to row[c*2 + f]: planar strided
    # columns stacked [2pw, E] then transposed — avoids the row-major
    # [E, pw] reshape temp (see _deinterleave_rows)
    return _interleave_planes(even, odd, total_entries, pw)


def sorted_row_grad(idx, vals, total_entries: int, *,
                    j_tile: int = 512, window: int = W,
                    matmul: str = "f32", packed: bool = True):
    """Segment-sum row contributions into a [total_entries, RW] table
    gradient: one lax.sort by entry id + the one-hot-matmul window
    accumulate above. RW = vals.shape[1] must divide 128.

    The cell-layout encoder's table cotangent (each (point, level)
    contributes one full C*F-wide row to ONE hashed cell entry): a row
    scatter would cost ~81 ns/row and a flat scalar scatter ~13 ns x RW
    per row on v5e (PERF_NOTES.md); this path is one 17-operand sort
    plus ~2k MXU MACs per row. Exact modulo f32 summation order.
    """
    m, rw = vals.shape
    assert LANES % rw == 0, rw
    epr = LANES // rw
    J = j_tile                                     # contributions per tile
    if packed:
        # Mosaic requires the keys_t block's lane dim (q = J/spr) to be
        # a multiple of 128; bump the tile so q lands on 128
        spr_ = LANES // rw
        q_ = -(-max(J // spr_, 1) // 128) * 128
        J = q_ * spr_
    pad = (-m) % J
    tot_rows = -(-total_entries // epr)
    n_blocks = -(-tot_rows // window)
    rows_pad = n_blocks * window
    if pad:
        idx = jnp.concatenate([
            idx, jnp.full((pad,), (rows_pad + window) * epr, jnp.int32)
        ])
        vals = jnp.concatenate(
            [vals, jnp.zeros((pad, rw), vals.dtype)]
        )
    mm = idx.shape[0]
    n_tiles = mm // J

    cols = tuple(vals[:, j].astype(jnp.float32) for j in range(rw))
    sorted_ops = jax.lax.sort(
        (idx.astype(jnp.uint32),) + cols, num_keys=1
    )
    keys = sorted_ops[0]
    svals = jnp.stack(sorted_ops[1:], axis=-1)     # [mm, RW]
    return _windowed_row_accumulate(
        keys, svals, total_entries,
        J=J, window=window, matmul=matmul, packed=packed,
        rows_pad=rows_pad, n_blocks=n_blocks,
    )


def presorted_row_segment_sum(keys, vals, n_segments: int, *,
                              j_tile: int = 512, window: int = W):
    """Segment-sum rows of an ALREADY key-sorted stream — the sort-free
    tail of sorted_row_grad (merge-path schedule + windowed one-hot MXU
    accumulate, ~2 ns/row vs ~81 ns/row for an XLA row scatter).

    keys: [M] int32/uint32, non-decreasing; rows with key >= n_segments
    are dropped (use key = n_segments for padding). vals: [M, RW] with
    RW dividing 128. Replaces jax.ops.segment_sum on ray-sorted packed
    render streams (reference nerfacc accumulate_along_rays,
    field_rendering.py:483-547).
    """
    m, rw = vals.shape
    assert LANES % rw == 0, rw
    if _use_interpret():
        # CPU backend (tests, dryrun meshes): the interpret-mode Pallas
        # kernel is orders slower AND its ShapeDtypeStruct out_shape
        # trips shard_map's check_vma — use XLA's segment_sum, exactly
        # like grad_mode "auto" resolves to "exact" off-chip
        seg = jax.ops.segment_sum(
            vals.astype(jnp.float32),
            jnp.clip(keys, 0, n_segments),
            num_segments=n_segments + 1,
            indices_are_sorted=True,
        )
        return seg[:n_segments]
    epr = LANES // rw
    spr_ = LANES // rw
    q_ = -(-max(j_tile // spr_, 1) // 128) * 128
    J = q_ * spr_
    # one extra segment swallows the caller's n_segments sentinel rows
    total_entries = n_segments + 1
    pad = (-m) % J
    tot_rows = -(-total_entries // epr)
    n_blocks = -(-tot_rows // window)
    rows_pad = n_blocks * window
    if pad:
        keys = jnp.concatenate([
            keys.astype(jnp.uint32),
            jnp.full((pad,), (rows_pad + window) * epr, jnp.uint32),
        ])
        vals = jnp.concatenate(
            [vals, jnp.zeros((pad, rw), vals.dtype)]
        )
    else:
        keys = keys.astype(jnp.uint32)
    out = _windowed_row_accumulate(
        keys, vals.astype(jnp.float32), total_entries,
        J=J, window=window, matmul="f32", packed=True,
        rows_pad=rows_pad, n_blocks=n_blocks,
    )
    return out[:n_segments]


def _deinterleave_rows(out, total_entries: int, rw: int):
    """[rows_pad, LANES] kernel output (entries interleaved rw-wide) ->
    [total_entries, rw] WITHOUT a row-major [E, rw] reshape temp.

    XLA lays `flat.reshape(E, rw)` temps out as {1,0:T(8,128)} — the rw
    lanes pad to 128 (64x at rw=2), which at the stage-4 production
    field size (18.5M entries) is an 8.81G HLO temp that OOM'd the
    step compile (prod_pipe log 2026-08-18; /tmp/probe_layout.py:
    current=OOM, planar-strided temp=0.14G). rw strided slices + stack
    + transpose produce the same [E, rw] through compact layouts (the
    transpose-of-[rw, E] form is the column-major layout the resident
    table already uses).

    BUT the FLAT strided slices (`flat[j::rw]`) execute as per-element
    gathers (~7.7 ns/elem measured): 36 ms at the baked frame's 640k
    segments, 146 ms at the corner table-grad's 8.4M — the round-4
    regression behind BOTH the baked 11.6-vs-35.9 FPS gap and the
    868k->497k corner-layout control drop (VERDICT r4 weak #1/#6).
    Round-5 fix: slice component j as the LANE-strided 2-D slice
    `out[:, j::rw]` instead — same elements in the same order (lane
    l%rw==j, row-major), but a regular vector pattern XLA lowers
    without gathers OR padded [E, rw] temps. Measured at the corner
    shape (E=8.4M, rw=2): flat slices 145.6 ms, direct row-major
    reshape 13.9 ms (and a multi-GB 32x-padded relayout temp that
    compile-OOMs the 2^20 corner step), lane-strided **2.5 ms**
    (/tmp/diag_deint2.py 2026-08-21)."""
    cols = [out[:, j::rw].reshape(-1)[:total_entries] for j in range(rw)]
    return jnp.stack(cols, axis=0).T


def _windowed_row_accumulate(keys, svals, total_entries: int, *,
                             J: int, window: int, matmul: str,
                             packed: bool, rows_pad: int, n_blocks: int):
    mm, rw = svals.shape
    epr = LANES // rw
    n_tiles = mm // J
    first_rows = keys[::J].astype(jnp.int32) // epr
    window_ids, slice_ids = _merge_path(
        first_rows, n_tiles, n_blocks, window
    )

    grid = n_tiles + n_blocks - 1
    if packed:
        spr = LANES // rw
        q = J // spr
        keys_q = keys.reshape(mm // spr, spr)
        keys_t = keys_q.T                          # [spr, mm/spr]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((spr, q), lambda i, w, s: (0, s[i])),
                pl.BlockSpec((q, spr), lambda i, w, s: (s[i], 0)),
                pl.BlockSpec((q, LANES), lambda i, w, s: (s[i], 0)),
            ],
            out_specs=pl.BlockSpec(
                (window, LANES), lambda i, w, s: (w[i], 0)
            ),
        )
        out = pl.pallas_call(
            functools.partial(
                _row_acc_kernel_packed, row_width=rw, j_tile=J,
                window=window, matmul=matmul,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (rows_pad, LANES), jnp.float32
            ),
            interpret=_use_interpret(),
        )(
            window_ids,
            slice_ids,
            keys_t,
            keys_q,
            svals.reshape(mm // spr, LANES),
        )
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, 1, J), lambda i, w, s: (s[i], 0, 0)),
                pl.BlockSpec((J, 1), lambda i, w, s: (s[i], 0)),
                pl.BlockSpec((J, rw), lambda i, w, s: (s[i], 0)),
            ],
            out_specs=pl.BlockSpec(
                (window, LANES), lambda i, w, s: (w[i], 0)
            ),
        )
        out = pl.pallas_call(
            functools.partial(
                _row_acc_kernel, row_width=rw, j_tile=J, window=window,
                matmul=matmul,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (rows_pad, LANES), jnp.float32
            ),
            interpret=_use_interpret(),
        )(
            window_ids,
            slice_ids,
            keys.reshape(n_tiles, 1, J),
            keys.reshape(n_tiles * J, 1),
            svals.reshape(n_tiles * J, rw),
        )
    return _deinterleave_rows(out, total_entries, rw)


def sorted_table_grad(idx, v0, v1, total_entries: int):
    """Segment-sum contributions into a [total_entries, 2] gradient.

    idx: [M] int32 entry ids (0 <= idx < total_entries);
    v0, v1: [M] f32 per-feature contribution values.
    Exact modulo f32 summation order.
    """
    m = idx.shape[0]
    pad = (-m) % TILE
    tot_rows = -(-total_entries // SUB)            # 64 entries per row
    n_blocks = -(-tot_rows // W)
    rows_pad = n_blocks * W
    if pad:
        # sentinel entries land beyond every window's row range
        idx = jnp.concatenate([
            idx, jnp.full((pad,), (rows_pad + W) * SUB, jnp.int32)
        ])
        v0 = jnp.concatenate([v0, jnp.zeros((pad,), v0.dtype)])
        v1 = jnp.concatenate([v1, jnp.zeros((pad,), v1.dtype)])
    mm = idx.shape[0]
    n_tiles = mm // TILE

    keys, s0, s1 = jax.lax.sort(
        (idx.astype(jnp.uint32), v0.astype(jnp.float32),
         v1.astype(jnp.float32)),
        num_keys=1,
    )
    first_rows = (keys[::TILE].astype(jnp.int32)) >> 6
    window_ids, slice_ids = _merge_path(first_rows, n_tiles, n_blocks)

    grid = n_tiles + n_blocks - 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, SUB, LANES), lambda i, w, s: (s[i], 0, 0)),
            pl.BlockSpec((1, SUB, LANES), lambda i, w, s: (s[i], 0, 0)),
            pl.BlockSpec((1, SUB, LANES), lambda i, w, s: (s[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((W, LANES), lambda i, w, s: (w[i], 0)),
    )
    out = pl.pallas_call(
        _acc_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_pad, LANES), jnp.float32),
        interpret=_use_interpret(),
    )(
        window_ids,
        slice_ids,
        keys.reshape(n_tiles, SUB, LANES),
        s0.reshape(n_tiles, SUB, LANES),
        s1.reshape(n_tiles, SUB, LANES),
    )
    return _deinterleave_rows(out, total_entries, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def presorted_row_segment_sum_vjp(keys, vals, n_segments: int):
    """Differentiable presorted_row_segment_sum (d vals = g[keys]):
    drop-in for jax.ops.segment_sum on ray-sorted packed render streams
    inside training losses."""
    return presorted_row_segment_sum(keys, vals, n_segments)


def _psum_fwd(keys, vals, n_segments):
    return presorted_row_segment_sum(keys, vals, n_segments), keys


def _psum_bwd(n_segments, keys, g):
    k = jnp.clip(keys, 0, n_segments - 1)
    dv = jnp.where((keys < n_segments)[:, None], g[k], 0.0)
    return (None, dv)


presorted_row_segment_sum_vjp.defvjp(_psum_fwd, _psum_bwd)

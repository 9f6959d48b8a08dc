"""Cell-layout hash encoding (HashGridConfig.layout="cell") and its
sorted-row table gradient (ops/hashgrid_sorted.sorted_row_grad).

The cell layout is the round-3 encoding redesign: ONE table-row gather
per (point, level) instead of 4/8 corner gathers, trading tcnn numeric
parity (corners are per-cell, so the encoding is trilinear inside each
cell and discontinuous at boundaries). Replaces tiny-cuda-nn's HashGrid
at the same call sites (reference ngp.py:340-358).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadraturefields_tpu.ops.hashgrid import (
    HashGridConfig,
    _cell_fwd_impl,
    hashgrid_encode,
    hashgrid_init,
)
from quadraturefields_tpu.ops.hashgrid_sorted import W, sorted_row_grad

_PRIMES = (1, 2654435761, 805459861)


def _cfg(**kw):
    base = dict(
        n_levels=3,
        log2_hashmap_size=9,
        base_resolution=4,
        per_level_scale=2.0,
        layout="cell",
        grad_mode="exact",
    )
    base.update(kw)
    return HashGridConfig(**base)


def _numpy_cell_encode(table, x, cfg):
    """Straight-line numpy reference of the cell-layout encode."""
    n = x.shape[0]
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    out = np.zeros((n, cfg.n_levels * cfg.n_features), np.float64)
    for l in range(cfg.n_levels):
        scale = cfg.level_scales[l]
        res = cfg.level_resolutions[l]
        n_axis = res - 1
        size = cfg.level_sizes[l]
        pos = x * scale + 0.5
        cell = np.clip(np.floor(pos).astype(np.int64), 0, n_axis - 1)
        frac = np.clip(pos - cell, 0.0, 1.0)
        if n_axis**3 <= size:
            idx = cell[:, 0] + cell[:, 1] * n_axis + cell[:, 2] * n_axis**2
        else:
            h = (cell[:, 0].astype(np.uint32) * np.uint32(_PRIMES[0]))
            h = h ^ (cell[:, 1].astype(np.uint32) * np.uint32(_PRIMES[1]))
            h = h ^ (cell[:, 2].astype(np.uint32) * np.uint32(_PRIMES[2]))
            idx = (h & np.uint32(size - 1)).astype(np.int64)
        rows = np.asarray(table, np.float64)[idx + cfg.level_offsets[l]]
        c = 0
        for i in (0, 1):
            for j in (0, 1):
                for k in (0, 1):
                    w = (
                        (i * frac[:, 0] + (1 - i) * (1 - frac[:, 0]))
                        * (j * frac[:, 1] + (1 - j) * (1 - frac[:, 1]))
                        * (k * frac[:, 2] + (1 - k) * (1 - frac[:, 2]))
                    )
                    F = cfg.n_features
                    out[:, l * F : (l + 1) * F] += (
                        w[:, None] * rows[:, c * F : (c + 1) * F]
                    )
                    c += 1
    return out.astype(np.float32)


def test_cell_row_shapes():
    cfg = _cfg()
    assert cfg.row_width == 16
    # dense level 0: 4^3 corners -> 3^3 = 27 cells, padded to 32 rows
    assert cfg.level_sizes[0] == 32
    table = hashgrid_init(jax.random.PRNGKey(0), cfg)
    assert table.shape == (cfg.total_entries, 16)


def test_cell_encode_matches_numpy():
    cfg = _cfg()
    table = hashgrid_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
    got = np.asarray(hashgrid_encode(table, x, cfg))
    ref = _numpy_cell_encode(table, x, cfg)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_cell_encode_trilinear_inside_cell():
    """Inside one cell the encode is exactly trilinear: the value at
    the cell center equals the corner-feature mean for that row."""
    cfg = _cfg(n_levels=1)
    table = hashgrid_init(jax.random.PRNGKey(2), cfg)
    # level 0: scale=3, res=4, 3 cells/axis. Center of cell (1,1,1):
    # pos = x*3 + 0.5 = 1.5 -> x = 1/3... pick pos=(1.5,1.5,1.5)
    x = jnp.asarray([[1.0 / 3.0, 1.0 / 3.0, 1.0 / 3.0]])
    got = np.asarray(hashgrid_encode(table, x, cfg))[0]
    idx = 1 + 1 * 3 + 1 * 9  # dense cell index of (1,1,1)
    row = np.asarray(table)[idx].reshape(8, 2)
    np.testing.assert_allclose(got, row.mean(axis=0), rtol=1e-5)


@pytest.mark.parametrize("interp", ["cube", "tet"])
def test_cell_custom_vjp_matches_autodiff(interp):
    """The custom VJP (exact mode) must equal jax.grad through the
    plain forward implementation, for both table and positions."""
    cfg = _cfg(interp=interp)
    table = hashgrid_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (129, 3)) * 0.9 + 0.05

    def loss_custom(t, xx):
        out = hashgrid_encode(t, xx, cfg)
        return jnp.sum(jnp.sin(out) * out)

    def loss_plain(t, xx):
        out = _cell_fwd_impl(t, xx, cfg)[0]
        return jnp.sum(jnp.sin(out) * out)

    gt_c, gx_c = jax.grad(loss_custom, argnums=(0, 1))(table, x)
    gt_p, gx_p = jax.grad(loss_plain, argnums=(0, 1))(table, x)
    np.testing.assert_allclose(
        np.asarray(gt_c), np.asarray(gt_p), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gx_c), np.asarray(gx_p), rtol=1e-4, atol=1e-5
    )


def test_cell_grad_mode_sorted_matches_exact():
    cfg_s = _cfg(grad_mode="sorted")
    cfg_e = _cfg(grad_mode="exact")
    table = hashgrid_init(jax.random.PRNGKey(0), cfg_s)
    x = jax.random.uniform(jax.random.PRNGKey(1), (513, 3))

    def g(cfg):
        return jax.grad(
            lambda t: jnp.sum(hashgrid_encode(t, x, cfg) ** 2)
        )(table)

    np.testing.assert_allclose(
        np.asarray(g(cfg_s)), np.asarray(g(cfg_e)), rtol=2e-5, atol=2e-6
    )


@pytest.mark.parametrize(
    "m,total_entries,rw",
    [
        (512, 8 * W * 2, 16),        # one tile, 2 windows
        (512 * 3 + 117, 8 * W * 5, 16),  # padding path
        (700, 64, 16),               # tiny table
        (513, 4 * W * 3, 32),        # rw=32 (L=8/F=4 cell variant)
    ],
)
def test_sorted_row_grad_matches_numpy(m, total_entries, rw):
    rng = np.random.default_rng(m + rw)
    idx = rng.integers(0, total_entries, m).astype(np.int32)
    vals = rng.normal(size=(m, rw)).astype(np.float32)
    out = np.asarray(
        sorted_row_grad(jnp.asarray(idx), jnp.asarray(vals), total_entries)
    )
    ref = np.zeros((total_entries, rw), np.float32)
    np.add.at(ref, idx, vals)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_cell_tet_equals_dense_placement():
    """tet weights placed densely must reproduce the sparse 4-corner
    sum: check against cube on the simplex-interior where both are
    linear... instead simply check tet weights sum to 1 and the encode
    is exact at cell corners for both interps."""
    for interp in ("cube", "tet"):
        cfg = _cfg(n_levels=1, interp=interp)
        table = hashgrid_init(jax.random.PRNGKey(3), cfg)
        # pos=(1,1,1) (x=1/6) floors into cell (1,1,1) with frac=0:
        # exactly corner slot 0 of dense row 1+3+9=13 for both interps
        x = jnp.asarray([[1.0 / 6.0] * 3])
        got = np.asarray(hashgrid_encode(table, x, cfg))[0]
        row = np.asarray(table)[13].reshape(8, 2)
        np.testing.assert_allclose(got, row[0], rtol=1e-4, atol=1e-6)


def test_ngp_cell_layout_equal_params():
    from quadraturefields_tpu.models.ngp import NGPConfig, ngp_init

    c_corner = NGPConfig(n_levels=4, max_resolution=64,
                         log2_hashmap_size=12)
    c_cell = dataclasses.replace(c_corner, layout="cell")
    p0 = ngp_init(jax.random.PRNGKey(0), c_corner)
    p1 = ngp_init(jax.random.PRNGKey(0), c_cell)
    n0 = p0["table"].size
    n1 = p1["table"].size
    # equal parameter budget within dense-level rounding
    assert abs(n1 - n0) / n0 < 0.6, (n0, n1)
    assert c_cell.hashgrid.output_dim == c_corner.hashgrid.output_dim


@pytest.mark.parametrize("m,total_entries", [(4096, 1000), (9999, 257)])
def test_sorted_pair_grad_matches_bf16_numpy(m, total_entries):
    """bf16-pair path: equals a numpy segment-sum of the bf16-rounded
    contributions (accumulation f32-exact modulo order)."""
    import ml_dtypes
    from quadraturefields_tpu.ops.hashgrid_sorted import sorted_pair_grad

    rng = np.random.default_rng(m)
    idx = rng.integers(0, total_entries, m).astype(np.int32)
    lo = rng.normal(0, 1, (m, 8)).astype(np.float32)
    hi = rng.normal(0, 1, (m, 8)).astype(np.float32)
    got = np.asarray(sorted_pair_grad(
        jnp.asarray(idx), jnp.asarray(lo), jnp.asarray(hi),
        total_entries,
    ))
    lo_b = lo.astype(ml_dtypes.bfloat16).astype(np.float64)
    hi_b = hi.astype(ml_dtypes.bfloat16).astype(np.float64)
    want = np.zeros((total_entries, 16), np.float64)
    for c in range(8):
        np.add.at(want[:, 2 * c], idx, lo_b[:, c])
        np.add.at(want[:, 2 * c + 1], idx, hi_b[:, c])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_cell_bf16pair_close_to_f32_grad():
    """End-to-end cell backward with grad_payload=bf16pair stays within
    bf16 rounding of the exact-f32 table gradient."""
    import dataclasses as dc
    from quadraturefields_tpu.ops.hashgrid import (
        HashGridConfig, hashgrid_encode, hashgrid_init,
    )

    cfg = HashGridConfig(
        n_levels=4, log2_hashmap_size=9, base_resolution=4,
        per_level_scale=1.5, layout="cell", grad_mode="sorted",
        grad_payload="bf16pair",
    )
    cfg_f32 = dc.replace(cfg, grad_payload="f32")
    key = jax.random.PRNGKey(0)
    table = hashgrid_init(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))

    def loss(t, c):
        return jnp.sum(jnp.sin(hashgrid_encode(t, x, c)))

    g_pair = jax.grad(lambda t: loss(t, cfg))(table)
    g_f32 = jax.grad(lambda t: loss(t, cfg_f32))(table)
    err = float(jnp.max(jnp.abs(g_pair - g_f32)))
    scale = float(jnp.max(jnp.abs(g_f32))) + 1e-9
    assert err / scale < 1.5e-2, (err, scale)


@pytest.mark.parametrize("interp", ["cube", "tet"])
def test_cell_f4_custom_vjp_matches_autodiff(interp):
    """L8/F4 cell variant: custom VJP == autodiff through the pure
    forward (any even F is supported; F=4 halves gather indices)."""
    cfg = HashGridConfig(
        n_levels=4, n_features=4, log2_hashmap_size=9,
        base_resolution=4, per_level_scale=1.6, layout="cell",
        interp=interp, grad_mode="exact",
    )
    key = jax.random.PRNGKey(0)
    table = hashgrid_init(key, cfg)
    assert table.shape[1] == 32
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))

    def loss(t):
        return jnp.sum(jnp.sin(hashgrid_encode(t, x, cfg)) ** 2)

    def loss_pure(t):
        out, _ = _cell_fwd_impl(t, x, cfg)
        return jnp.sum(jnp.sin(out) ** 2)

    g = jax.grad(loss)(table)
    g_ref = jax.grad(loss_pure)(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-5, atol=2e-5)


def test_cell_f4_bf16pair_close_to_f32():
    import dataclasses as dc

    cfg = HashGridConfig(
        n_levels=4, n_features=4, log2_hashmap_size=9,
        base_resolution=4, per_level_scale=1.6, layout="cell",
        grad_mode="sorted", grad_payload="bf16pair",
    )
    cfg_f32 = dc.replace(cfg, grad_payload="f32")
    key = jax.random.PRNGKey(0)
    table = hashgrid_init(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))

    def loss(t, c):
        return jnp.sum(jnp.sin(hashgrid_encode(t, x, c)))

    g_pair = jax.grad(lambda t: loss(t, cfg))(table)
    g_f32 = jax.grad(lambda t: loss(t, cfg_f32))(table)
    err = float(jnp.max(jnp.abs(g_pair - g_f32)))
    scale = float(jnp.max(jnp.abs(g_f32))) + 1e-9
    assert err / scale < 1.5e-2, (err, scale)


@pytest.mark.parametrize("m,total_entries,F", [
    (4096, 1000, 4), (9999, 257, 2),
])
def test_sorted_tet_factor_grad_matches_numpy(m, total_entries, F):
    """Factorized payload path: equals a numpy segment-sum of the
    bf16(bf16(w) * bf16(g)) products placed at the tet corner slots."""
    import ml_dtypes
    from quadraturefields_tpu.ops.hashgrid_sorted import (
        sorted_tet_factor_grad,
    )

    rng = np.random.default_rng(m)
    idx = rng.integers(0, total_entries, m).astype(np.int32)
    wk = rng.normal(0, 1, (m, 4)).astype(np.float32)
    c1 = rng.integers(1, 7, m).astype(np.int32)
    # c2 distinct from c1 (as the Kuhn construction guarantees)
    c2 = ((c1 - 1 + rng.integers(1, 6, m)) % 6 + 1).astype(np.int32)
    assert (c1 != c2).all()
    g = rng.normal(0, 1, (m, F)).astype(np.float32)
    got = np.asarray(sorted_tet_factor_grad(
        jnp.asarray(idx), jnp.asarray(wk), jnp.asarray(c1),
        jnp.asarray(c2), jnp.asarray(g), total_entries,
    ))
    assert got.shape == (total_entries, 8 * F)
    bf = lambda a: a.astype(ml_dtypes.bfloat16).astype(np.float32)
    wkb, gb = bf(wk), bf(g)
    slots = np.stack(
        [np.zeros(m, np.int32), c1, c2, np.full(m, 7, np.int32)], axis=1
    )
    want = np.zeros((total_entries, 8 * F), np.float64)
    for t in range(4):
        for f in range(F):
            np.add.at(
                want[:, 0], 0 * idx, 0.0
            )  # keep numpy happy on empty slices
            col = slots[:, t] * F + f
            vals = bf(wkb[:, t] * gb[:, f]).astype(np.float64)
            np.add.at(want, (idx, col), vals)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("F", [2, 4])
def test_cell_tet_bf16factor_close_to_f32(F):
    """End-to-end cell/tet backward with grad_payload=bf16factor stays
    within bf16 rounding of the exact-f32 table gradient."""
    import dataclasses as dc

    cfg = HashGridConfig(
        n_levels=4, n_features=F, log2_hashmap_size=9,
        base_resolution=4, per_level_scale=1.6, layout="cell",
        interp="tet", grad_mode="sorted", grad_payload="bf16factor",
    )
    cfg_f32 = dc.replace(cfg, grad_payload="f32")
    key = jax.random.PRNGKey(0)
    table = hashgrid_init(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))

    def loss(t, c):
        return jnp.sum(jnp.sin(hashgrid_encode(t, x, c)))

    g_fac = jax.grad(lambda t: loss(t, cfg))(table)
    g_f32 = jax.grad(lambda t: loss(t, cfg_f32))(table)
    err = float(jnp.max(jnp.abs(g_fac - g_f32)))
    scale = float(jnp.max(jnp.abs(g_f32))) + 1e-9
    assert err / scale < 1.5e-2, (err, scale)
    # dL/dx is payload-independent (computed from the dense weights)
    dx_fac = jax.grad(
        lambda xx: jnp.sum(jnp.sin(hashgrid_encode(table, xx, cfg)))
    )(x)
    dx_f32 = jax.grad(
        lambda xx: jnp.sum(jnp.sin(hashgrid_encode(table, xx, cfg_f32)))
    )(x)
    np.testing.assert_allclose(
        np.asarray(dx_fac), np.asarray(dx_f32), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("F", [2, 4])
def test_factor_kernel_interpret_matches_reference(F):
    """The real Pallas factor kernel (interpret mode, small shapes)
    matches the XLA reference path bit-for-bit modulo f32 sum order."""
    from quadraturefields_tpu.ops.hashgrid_sorted import (
        sorted_tet_factor_grad,
    )

    m, total_entries = 700, 300
    rng = np.random.default_rng(F)
    idx = rng.integers(0, total_entries, m).astype(np.int32)
    wk = rng.normal(0, 1, (m, 4)).astype(np.float32)
    c1 = rng.integers(1, 7, m).astype(np.int32)
    c2 = ((c1 - 1 + rng.integers(1, 6, m)) % 6 + 1).astype(np.int32)
    g = rng.normal(0, 1, (m, F)).astype(np.float32)
    args = (jnp.asarray(idx), jnp.asarray(wk), jnp.asarray(c1),
            jnp.asarray(c2), jnp.asarray(g), total_entries)
    ref = np.asarray(sorted_tet_factor_grad(*args))
    ker = np.asarray(sorted_tet_factor_grad(*args, force_kernel=True))
    np.testing.assert_allclose(ker, ref, rtol=2e-5, atol=2e-5)

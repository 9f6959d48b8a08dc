import jax
import jax.numpy as jnp
import numpy as np

from quadraturefields_tpu.ops.hashgrid import (
    HashGridConfig,
    hashgrid_encode,
    hashgrid_init,
)


def small_cfg():
    return HashGridConfig(
        n_levels=4,
        n_features=2,
        log2_hashmap_size=10,
        base_resolution=4,
        per_level_scale=2.0,
    )


def test_config_geometry():
    cfg = HashGridConfig.from_max_resolution(
        4096, n_levels=16, base_resolution=16
    )
    # reference derivation: growth = exp((ln 4096 - ln 16)/15)
    assert np.isclose(cfg.per_level_scale, np.exp(np.log(256.0) / 15))
    res = cfg.level_resolutions
    assert res[0] == 16
    assert res[-1] >= 4096
    # low levels dense, high levels hashed at 2^19
    assert cfg.level_sizes[0] == (16**3 + 7) // 8 * 8
    assert cfg.level_sizes[-1] == 1 << 19


def test_encode_shapes_and_dtype():
    cfg = small_cfg()
    key = jax.random.PRNGKey(0)
    table = hashgrid_init(key, cfg)
    x = jax.random.uniform(key, (37, 3))
    out = hashgrid_encode(table, x, cfg)
    assert out.shape == (37, cfg.output_dim)


def test_encode_trilinear_interpolation_exact():
    """On a single dense level, the encoding must be the exact trilerp of
    the 8 surrounding corner features."""
    cfg = HashGridConfig(
        n_levels=1, n_features=1, log2_hashmap_size=12,
        base_resolution=4, per_level_scale=2.0,
    )
    key = jax.random.PRNGKey(1)
    table = hashgrid_init(key, cfg)
    res = cfg.level_resolutions[0]
    scale = cfg.level_scales[0]

    x = jnp.array([[0.37, 0.11, 0.74]])
    out = np.asarray(hashgrid_encode(table, x, cfg))[0, 0]

    pos = np.asarray(x)[0] * scale + 0.5
    base = np.floor(pos).astype(int)
    frac = pos - base
    expected = 0.0
    tbl = np.asarray(table)
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                c = np.clip(base + [i, j, k], 0, res - 1)
                idx = c[0] + c[1] * res + c[2] * res * res
                w = (
                    (i * frac[0] + (1 - i) * (1 - frac[0]))
                    * (j * frac[1] + (1 - j) * (1 - frac[1]))
                    * (k * frac[2] + (1 - k) * (1 - frac[2]))
                )
                expected += w * tbl[idx, 0]
    assert np.isclose(out, expected, rtol=1e-5)


def test_encode_continuity():
    """Tiny input perturbation -> tiny output change (trilerp continuity)."""
    cfg = small_cfg()
    key = jax.random.PRNGKey(2)
    table = hashgrid_init(key, cfg)
    x = jnp.array([[0.5, 0.5, 0.5]])
    a = hashgrid_encode(table, x, cfg)
    b = hashgrid_encode(table, x + 1e-6, cfg)
    assert np.max(np.abs(np.asarray(a - b))) < 1e-4


def test_grad_wrt_table_and_position():
    cfg = small_cfg()
    key = jax.random.PRNGKey(3)
    table = hashgrid_init(key, cfg)
    x = jnp.array([[0.3, 0.6, 0.2]])

    g_table = jax.grad(
        lambda t: jnp.sum(hashgrid_encode(t, x, cfg))
    )(table)
    assert np.isfinite(np.asarray(g_table)).all()
    assert np.abs(np.asarray(g_table)).sum() > 0

    g_x = jax.grad(lambda p: jnp.sum(hashgrid_encode(table, p, cfg)))(x)
    # numeric check of position gradient
    eps = 1e-4
    for axis in range(3):
        dx = jnp.zeros((1, 3)).at[0, axis].set(eps)
        num = (
            jnp.sum(hashgrid_encode(table, x + dx, cfg))
            - jnp.sum(hashgrid_encode(table, x - dx, cfg))
        ) / (2 * eps)
        assert np.isclose(np.asarray(g_x)[0, axis], num, rtol=1e-2, atol=1e-3)


def test_tet_interpolation_properties():
    """Tetrahedral mode: exact at grid corners, continuous, and equals
    trilinear for linear fields."""
    cfg_tet = HashGridConfig(
        n_levels=1, n_features=1, log2_hashmap_size=14,
        base_resolution=4, per_level_scale=2.0, interp="tet",
    )
    key = jax.random.PRNGKey(7)
    table = hashgrid_init(key, cfg_tet)
    res = cfg_tet.level_resolutions[0]
    scale = cfg_tet.level_scales[0]

    # exact at grid corners: pos = x*scale + 0.5 = integer (corner
    # coords >= 1 so x stays inside [0, 1] after the encode clip)
    for corner in [(1, 2, 3), (1, 1, 1), (2, 1, 2)]:
        x = (jnp.asarray([corner], jnp.float32) - 0.5) / scale
        out = float(hashgrid_encode(table, x, cfg_tet)[0, 0])
        cidx = corner[0] + corner[1] * res + corner[2] * res * res
        assert np.isclose(out, float(table[cidx, 0]), atol=1e-5)

    # continuity across faces of the Kuhn simplices
    x0 = jnp.asarray([[0.31, 0.44, 0.27]])
    for d in range(3):
        dx = jnp.zeros((1, 3)).at[0, d].set(1e-6)
        a = hashgrid_encode(table, x0, cfg_tet)
        b = hashgrid_encode(table, x0 + dx, cfg_tet)
        assert abs(float(a[0, 0] - b[0, 0])) < 1e-3

    # gradients exist
    g = jax.grad(lambda t: jnp.sum(hashgrid_encode(t, x0, cfg_tet)))(table)
    assert np.abs(np.asarray(g)).sum() > 0


def test_custom_vjp_matches_autodiff_of_reference_impl():
    """The custom-VJP table/position grads must match plain autodiff of
    the same math (built here without the custom rule)."""
    from quadraturefields_tpu.ops.hashgrid import (
        _corner_indices_weights,
    )

    cfg = small_cfg()
    key = jax.random.PRNGKey(9)
    table = hashgrid_init(key, cfg)
    x = jax.random.uniform(key, (17, 3), minval=0.05, maxval=0.95)

    def plain_encode(t, p):
        idx, w = _corner_indices_weights(jnp.clip(p, 0.0, 1.0), cfg)
        feats = t[idx]
        n = p.shape[0]
        return jnp.sum(
            feats.reshape(n, cfg.n_levels, cfg.corners, 2)
            * w.reshape(n, cfg.n_levels, cfg.corners, 1),
            axis=2,
        ).reshape(n, -1)

    def loss_custom(t, p):
        return jnp.sum(jnp.sin(hashgrid_encode(t, p, cfg)))

    def loss_plain(t, p):
        return jnp.sum(jnp.sin(plain_encode(t, p)))

    gt_c, gx_c = jax.grad(loss_custom, argnums=(0, 1))(table, x)
    gt_p, gx_p = jax.grad(loss_plain, argnums=(0, 1))(table, x)
    np.testing.assert_allclose(
        np.asarray(gt_c), np.asarray(gt_p), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(gx_c), np.asarray(gx_p), rtol=1e-4, atol=1e-6
    )


def test_hash_indices_in_range():
    cfg = HashGridConfig(
        n_levels=2, n_features=2, log2_hashmap_size=6,
        base_resolution=16, per_level_scale=2.0,
    )
    key = jax.random.PRNGKey(4)
    table = hashgrid_init(key, cfg)
    x = jax.random.uniform(key, (1000, 3))
    out = hashgrid_encode(table, x, cfg)  # would crash/NaN on bad indexing
    assert np.isfinite(np.asarray(out)).all()


def test_grad_mode_auto_dispatch():
    """auto resolves per backend/config (sorted on accelerators with
    F=2, exact otherwise); whatever it picks must equal the exact
    gradient."""
    import dataclasses

    # tiny table (dedup regime) and big table (exact regime)
    for log2_t, n in ((6, 4096), (19, 64)):
        cfg_a = HashGridConfig(
            n_levels=2,
            log2_hashmap_size=log2_t,
            base_resolution=8,
            per_level_scale=2.0,
            grad_mode="auto",
        )
        cfg_e = dataclasses.replace(cfg_a, grad_mode="exact")
        table = hashgrid_init(jax.random.PRNGKey(0), cfg_a)
        x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))

        def tg(cfg):
            return jax.grad(
                lambda t: jnp.sum(hashgrid_encode(t, x, cfg))
            )(table)

        np.testing.assert_allclose(
            tg(cfg_a), tg(cfg_e), atol=1e-4, rtol=1e-4
        )


def test_grad_mode_stochastic_unbiased():
    """Averaged over many fresh point draws, the stochastic-corner
    table gradient converges to the exact one (unbiased estimator)."""
    import dataclasses

    cfg_e = HashGridConfig(
        n_levels=3,
        log2_hashmap_size=6,
        base_resolution=4,
        per_level_scale=2.0,
        interp="tet",
        grad_mode="exact",
    )
    cfg_s = dataclasses.replace(cfg_e, grad_mode="stochastic")
    table = hashgrid_init(jax.random.PRNGKey(0), cfg_e)
    acc_s = jnp.zeros_like(table)
    acc_e = jnp.zeros_like(table)

    @jax.jit
    def both(xr):
        def f(t, cfg):
            return jnp.sum(hashgrid_encode(t, xr, cfg))

        return (
            jax.grad(f)(table, cfg_s),
            jax.grad(f)(table, cfg_e),
        )

    n_draws = 150
    for r in range(n_draws):
        xr = jax.random.uniform(jax.random.PRNGKey(100 + r), (1024, 3))
        gs, ge = both(xr)
        acc_s += gs
        acc_e += ge
    rel = float(
        jnp.linalg.norm(acc_s - acc_e) / jnp.linalg.norm(acc_e)
    )
    assert rel < 0.05, rel

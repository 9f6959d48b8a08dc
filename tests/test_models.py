import jax
import jax.numpy as jnp
import numpy as np

from quadraturefields_tpu.models.field import (
    FieldConfig,
    field_apply,
    field_init,
    field_with_grad,
)
from quadraturefields_tpu.models.ngp import (
    NGPConfig,
    ngp_features,
    ngp_features_to_rgb,
    ngp_forward,
    ngp_init,
    ngp_query_density,
)

AABB = jnp.array([-1.5] * 3 + [1.5] * 3)


def tiny_ngp(head="sg"):
    cfg = NGPConfig(
        head=head, num_g_lobes=2, n_levels=4, max_resolution=64,
        log2_hashmap_size=12, compute_dtype="float32",
    )
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_density_zero_outside_aabb():
    cfg, params = tiny_ngp()
    x = jnp.array([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    d = ngp_query_density(params, x, AABB, cfg)
    assert d.shape == (2, 1)
    assert float(d[1, 0]) == 0.0
    assert float(d[0, 0]) > 0.0  # trunc_exp is positive


def test_forward_rgb_range():
    cfg, params = tiny_ngp()
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (64, 3), minval=-1.0, maxval=1.0)
    dirs = jax.random.normal(key, (64, 3))
    dirs /= jnp.linalg.norm(dirs, axis=1, keepdims=True)
    rgb, density = ngp_forward(params, x, dirs, AABB, cfg)
    assert rgb.shape == (64, 3)
    assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()


def test_features_roundtrip_matches_forward():
    """features() + features_to_rgb() must reproduce forward()'s rgb —
    the baked path's core invariant (reference ngp.py:445-461)."""
    cfg, params = tiny_ngp()
    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(key, (32, 3), minval=-1.0, maxval=1.0)
    dirs = jax.random.normal(key, (32, 3))
    dirs /= jnp.linalg.norm(dirs, axis=1, keepdims=True)
    rgb_direct, density = ngp_forward(params, x, dirs, AABB, cfg)
    feats = ngp_features(params, x, AABB, cfg)
    assert feats.shape == (32, cfg.head_output_dim + 1)
    np.testing.assert_allclose(
        np.asarray(feats[:, -1:]), np.asarray(density), rtol=1e-5
    )
    rgb_baked = ngp_features_to_rgb(feats[:, :-1], dirs, cfg)
    np.testing.assert_allclose(
        np.asarray(rgb_baked), np.asarray(rgb_direct), atol=1e-5
    )


def test_mlp_head_variant():
    cfg, params = tiny_ngp(head="mlp")
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (16, 3), minval=-1.0, maxval=1.0)
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (16, 1))
    rgb, density = ngp_forward(params, x, dirs, AABB, cfg)
    assert rgb.shape == (16, 3)


def tiny_field():
    cfg = FieldConfig(
        scale=0.5, n_levels=4, max_resolution=64, min_resolution=8,
        log2_hashmap_size=12, hidden_size=16,
    )
    return cfg, field_init(jax.random.PRNGKey(0), cfg)


def test_field_grad_matches_numeric():
    cfg, params = tiny_field()
    x = jnp.array([[0.1, -0.2, 0.3]])
    f, g = field_with_grad(params, x, cfg)
    assert f.shape == (1, 1) and g.shape == (1, 3)
    eps = 1e-3
    for axis in range(3):
        dx = jnp.zeros((1, 3)).at[0, axis].set(eps)
        fp = field_apply(params, x + dx, cfg)[0, 0]
        fm = field_apply(params, x - dx, cfg)[0, 0]
        num = (fp - fm) / (2 * eps)
        # back_prop=False detaches the hash-grid branch: the analytic
        # grad flows only through the xyz concat, while the numeric one
        # includes the (piecewise-linear) grid. Compare against the
        # xyz-branch-only numeric derivative computed the same way.
        assert np.isfinite(float(num))
    # analytic grad is nonzero and finite
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_field_grad_detached_encode_semantics():
    """With back_prop=False the position gradient must equal the
    gradient holding the hash features fixed (reference field.py:195-199)."""
    cfg, params = tiny_field()
    x = jnp.array([[0.07, 0.21, -0.33]])
    _, g = field_with_grad(params, x, cfg)

    from quadraturefields_tpu.ops.hashgrid import hashgrid_encode
    from quadraturefields_tpu.ops.mlp import mlp_apply

    x_norm = (x + cfg.scale) / (2 * cfg.scale)
    h_fixed = hashgrid_encode(params["table"], x_norm, cfg.hashgrid)

    def f_xyz_only(xn):
        return mlp_apply(
            params["decoder"],
            jnp.concatenate([xn, h_fixed], axis=-1),
            activation=cfg.activation,
            compute_dtype=jnp.float32,
        )[0, 0]

    g_manual = jax.grad(f_xyz_only)(x_norm) / (2 * cfg.scale)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_manual), rtol=1e-4, atol=1e-7
    )


def test_field_loss_double_backprop():
    """The stage-2 loss must be differentiable w.r.t. params *through*
    the field gradient (torch create_graph=True equivalent)."""
    from quadraturefields_tpu.models.field import field_loss

    cfg, params = tiny_field()
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (32, 3), minval=-0.4, maxval=0.4)
    dirs = jax.random.normal(key, (32, 3))
    w = jax.random.uniform(key, (32,))

    def loss_fn(p):
        _, g = field_with_grad(p, x, cfg)
        return field_loss(w, w * 0.5, g, dirs)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    total = sum(float(np.abs(np.asarray(g)).sum()) for g in flat)
    assert total > 0


def _sg_old_mirror(raw, dirs, num_lobes):
    """Numpy mirror of reference NGPRadianceFieldSG.spherical_gaussian_
    mixture (ngp.py:559-579): per lobe, 3 per-channel 5-tuples
    [axis(3), lambda(1), amp(1)]; a = |amp|*exp(-|lam|*(1-axis.dir))."""
    n = raw.shape[0]
    diffuse = raw[:, :3]
    lobes = raw[:, 3:].reshape(n, num_lobes, 3, 5)
    axis = lobes[..., :3]
    axis = axis / np.linalg.norm(axis, axis=-1, keepdims=True)
    lam = np.abs(lobes[..., 3])
    amp = np.abs(lobes[..., 4])
    dot = np.sum(axis * dirs[:, None, None, :], axis=-1)
    mix = np.sum(amp * np.exp(-lam * (1.0 - dot)), axis=1)
    return 1.0 / (1.0 + np.exp(-(diffuse + mix)))


def test_sg_old_full_model_matches_reference_math():
    """head='sg_old' (NGPRadianceFieldSG, reference ngp.py:473-654):
    the full forward reproduces the per-channel SG mixture decode on
    the head's raw output, including the reference's [0,1] direction
    remap leaking into the mixture when use_viewdirs is on
    (ngp.py:616-631)."""
    import jax
    import jax.numpy as jnp

    from quadraturefields_tpu.models.ngp import (
        NGPConfig,
        ngp_features,
        ngp_features_to_rgb,
        ngp_forward,
        ngp_init,
        ngp_query_density,
        ngp_sg_old_head_output_dim,
    )
    from quadraturefields_tpu.ops.mlp import mlp_apply

    aabb = jnp.asarray([-1.5] * 3 + [1.5] * 3)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.2, 1.2, (64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    for use_viewdirs in (False, True):
        cfg = NGPConfig(
            head="sg_old", num_g_lobes=3, n_levels=4,
            log2_hashmap_size=10, max_resolution=64, hidden_size=32,
            use_viewdirs=use_viewdirs, compute_dtype="float32",
        )
        assert cfg.head_output_dim == ngp_sg_old_head_output_dim(3) == 48
        params = ngp_init(jax.random.PRNGKey(1), cfg)
        rgb, density = ngp_forward(
            params, jnp.asarray(x), jnp.asarray(d), aabb, cfg
        )
        assert rgb.shape == (64, 3) and density.shape == (64, 1)
        assert float(rgb.min()) >= 0 and float(rgb.max()) <= 1

        # mirror: raw head output -> reference decode math
        _, emb = ngp_query_density(
            params, jnp.asarray(x), aabb, cfg, return_feat=True
        )
        if use_viewdirs:
            from quadraturefields_tpu.ops.sh import (
                spherical_harmonics_deg4,
            )

            d01 = (jnp.asarray(d) + 1.0) / 2.0
            h = jnp.concatenate(
                [spherical_harmonics_deg4(d01), emb], axis=-1
            )
            d_mix = np.asarray(d01)
        else:
            h = emb
            d_mix = d
        raw = np.asarray(
            mlp_apply(params["mlp_head"], h,
                      compute_dtype=jnp.float32)
        )
        want = _sg_old_mirror(raw, d_mix, 3)
        np.testing.assert_allclose(np.asarray(rgb), want, atol=2e-5)

        if not use_viewdirs:
            # bake path parity: features + features_to_rgb == forward
            feats = ngp_features(params, jnp.asarray(x), aabb, cfg)
            assert feats.shape == (64, 48 + 1)
            rgb2 = ngp_features_to_rgb(
                feats[:, :-1], jnp.asarray(d), cfg
            )
            np.testing.assert_allclose(
                np.asarray(rgb2), np.asarray(rgb), atol=2e-5
            )

"""SIREN field, vertex-feature baking render, ray utils, h5 export."""
import os

import jax
import jax.numpy as jnp
import numpy as np


def test_field_mlp_siren():
    from quadraturefields_tpu.models.field import (
        FieldMLPConfig, field_mlp_apply, field_mlp_init,
        field_mlp_with_grad,
    )

    cfg = FieldMLPConfig(hidden_size=32, num_layers=3)
    params = field_mlp_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (16, 3), minval=-1.0, maxval=1.0
    )
    f = field_mlp_apply(params, x, cfg)
    assert f.shape == (16, 1)
    f2, g = field_mlp_with_grad(params, x, cfg)
    assert g.shape == (16, 3)
    # smooth analytic net: grads finite and nonzero
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
    # numeric check on one axis
    eps = 1e-3
    dx = jnp.zeros((16, 3)).at[:, 0].set(eps)
    num = (field_mlp_apply(params, x + dx, cfg)
           - field_mlp_apply(params, x - dx, cfg)) / (2 * eps)
    np.testing.assert_allclose(
        np.asarray(num[:, 0]), np.asarray(g[:, 0]), rtol=5e-2, atol=1e-3
    )


def test_render_finetune_baking_rows():
    """Vertex-feature baking render must equal the point-feature render
    when features are linear in position (barycentric avg is exact)."""
    from quadraturefields_tpu.models.ngp import NGPConfig
    from quadraturefields_tpu.render.quadrature import (
        HitRows, render_finetune_baking_rows, row_composite,
    )

    cfg = NGPConfig(head="sg", num_g_lobes=1)
    R, H = 4, 3
    rng = np.random.default_rng(0)
    origins = jnp.asarray(
        np.tile([[0, 0, -2.0]], (R, 1)).astype(np.float32)
    )
    dirs = jnp.asarray(
        np.tile([[0, 0, 1.0]], (R, 1)).astype(np.float32)
    )
    ts = jnp.asarray(
        np.sort(rng.uniform(1.0, 3.0, (R, H)), axis=1).astype(np.float32)
    )
    valid = jnp.ones((R, H), bool)
    hits = HitRows(
        tri_ids=jnp.zeros((R, H), jnp.int32), ts=ts, valid=valid
    )
    fv = jnp.asarray(rng.normal(size=(R, H, 3, 3)).astype(np.float32))
    bc = jnp.asarray(np.full((R, H, 3), 1 / 3, np.float32))

    D = cfg.head_output_dim  # 10

    def features_fn(params, x, aabb, c):
        # linear-in-x synthetic features + constant sigma
        w = jnp.arange(3 * (D + 1), dtype=jnp.float32).reshape(3, D + 1)
        return x @ w * 0.01 + 0.5

    from quadraturefields_tpu.models.ngp import ngp_features_to_rgb

    rgb, alpha, depth, w = render_finetune_baking_rows(
        None, hits, origins, dirs, fv, bc, jnp.zeros(6), cfg,
        features_fn=features_fn,
        features_to_rgb_fn=ngp_features_to_rgb,
        render_step_size=0.01,
    )
    assert rgb.shape == (R, 3)
    assert np.isfinite(np.asarray(rgb)).all()

    # reference: features at the barycentric point directly
    centroids = jnp.mean(fv, axis=2)  # bc = 1/3 each
    feats_pt = features_fn(
        None, centroids.reshape(-1, 3), None, cfg
    ).reshape(R, H, D + 1)
    sig = feats_pt[..., -1]
    rgbs_pt = ngp_features_to_rgb(
        feats_pt[..., :-1].reshape(R * H, D),
        jnp.broadcast_to(dirs[:, None], (R, H, 3)).reshape(-1, 3), cfg,
    ).reshape(R, H, 3)
    rgb2, _, _, _ = row_composite(
        rgbs_pt, sig, ts, jnp.full_like(sig, 0.01), valid, "white"
    )
    np.testing.assert_allclose(
        np.asarray(rgb), np.asarray(rgb2), atol=1e-5
    )


def test_ray_utils_ndc():
    from quadraturefields_tpu.data.ray_utils import (
        get_ray_directions, get_rays, ndc_rays,
    )

    H = W = 8
    dirs = get_ray_directions(H, W, 10.0)
    assert dirs.shape == (H, W, 3)
    c2w = np.eye(4, dtype=np.float32)
    o, d = get_rays(dirs, c2w)
    n = np.linalg.norm(d, axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)
    # NDC: rays moved to near plane, o2 in [-1, 1]
    d_fwd = d.copy()
    d_fwd[:, 2] = -np.abs(d_fwd[:, 2]) - 0.5  # looking down -z
    o_ndc, d_ndc = ndc_rays(H, W, 10.0, 1.0, o - [0, 0, 5.0], d_fwd)
    assert np.isfinite(o_ndc).all() and np.isfinite(d_ndc).all()


def test_h5_grid_export(tmp_path):
    from quadraturefields_tpu.utils.grid_export import (
        extract_field_grid_h5,
    )
    import h5py

    def fn(coords):
        r = jnp.linalg.norm(coords, axis=1)
        return 0.5 - r, jnp.ones_like(r)

    path = str(tmp_path / "field.h5")
    extract_field_grid_h5(fn, path, scale=1.0, grid_size=16)
    with h5py.File(path) as h5:
        grids = h5["grids"][:]
        grads = h5["grads"][:]
    assert grids.shape == (16, 16, 16)
    assert grads.dtype == np.float16
    # center positive, corner negative
    assert grids[8, 8, 8] > 0 > grids[0, 0, 0]

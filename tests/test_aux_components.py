"""Auxiliary components: iterative test renderer, distortion loss,
vanilla NeRF, DeltaField, own-view spirals, dnerf loader, mc tools,
profiling utils, COLMAP reader."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_window_test_renderer_matches_single_pass():
    """The memory-bounded iterative renderer must match the one-shot
    renderer on a trained-ish model (random init ok)."""
    from quadraturefields_tpu.models.ngp import NGPConfig, ngp_init
    from quadraturefields_tpu.ops.grid import (
        OccGridConfig, occ_grid_init, max_march_steps,
    )
    from quadraturefields_tpu.render.renderer import (
        RenderConfig, make_test_renderer, render_rays_occgrid,
    )

    aabb = jnp.asarray([-1.5] * 3 + [1.5] * 3)
    cfg = NGPConfig(head="sg", num_g_lobes=2, n_levels=4,
                    max_resolution=64, log2_hashmap_size=12,
                    compute_dtype="float32")
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    occ_state = occ_grid_init(aabb, OccGridConfig(resolution=16))
    step = 2e-2
    rcfg = RenderConfig(
        render_step_size=step,
        max_steps=max_march_steps(np.asarray(aabb), step),
        max_samples_total=1 << 15,
    )
    n = 64
    rng = np.random.default_rng(0)
    o = np.tile([[0, 0, -3.0]], (n, 1)).astype(np.float32)
    d = rng.normal(size=(n, 3)) * 0.15 + [0, 0, 1]
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)

    res = render_rays_occgrid(
        params, aabb, cfg, occ_state, jnp.asarray(o), jnp.asarray(d),
        rcfg, render_bkgd=jnp.ones(3),
    )
    test_fn = make_test_renderer(params, aabb, cfg, rcfg,
                                 window_steps=32, window_budget=1 << 13)
    rgb_it, opa_it, _, total = test_fn(
        occ_state, jnp.asarray(o), jnp.asarray(d),
        render_bkgd=jnp.ones(3),
    )
    np.testing.assert_allclose(
        np.asarray(rgb_it), np.asarray(res.rgb), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(opa_it), np.asarray(res.opacity), atol=5e-3
    )


def test_window_test_renderer_matches_single_pass_unbounded():
    """The windowed eval path must reproduce the one-shot render on an
    UNBOUNDED scene: contracted occupancy lookups, exponential cone
    steps, and marching to far_plane instead of the ROI box exit
    (reference render_image_with_occgrid_test handles contraction the
    same way, utils.py:175-350)."""
    from quadraturefields_tpu.models.ngp import NGPConfig, ngp_init
    from quadraturefields_tpu.ops.grid import (
        OccGridConfig, occ_grid_init, max_march_steps_cone,
    )
    from quadraturefields_tpu.render.renderer import (
        RenderConfig, make_test_renderer, render_rays_occgrid,
    )

    aabb = jnp.asarray([-1.0] * 3 + [1.0] * 3)
    cfg = NGPConfig(head="sg", num_g_lobes=2, n_levels=4,
                    max_resolution=64, log2_hashmap_size=12,
                    unbounded=True, compute_dtype="float32")
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    occ_state = occ_grid_init(aabb, OccGridConfig(resolution=16))
    dt, cone, near, far = 2e-2, 0.004, 0.2, 20.0
    rcfg = RenderConfig(
        render_step_size=dt,
        cone_angle=cone,
        near_plane=near,
        far_plane=far,
        max_steps=max_march_steps_cone(near, far, dt, cone),
        max_samples_total=1 << 15,
    )
    n = 48
    rng = np.random.default_rng(1)
    o = np.tile([[0, 0, -2.0]], (n, 1)).astype(np.float32)
    d = rng.normal(size=(n, 3)) * 0.3 + [0, 0, 1]
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)

    res = render_rays_occgrid(
        params, aabb, cfg, occ_state, jnp.asarray(o), jnp.asarray(d),
        rcfg, render_bkgd=jnp.ones(3),
    )
    test_fn = make_test_renderer(params, aabb, cfg, rcfg,
                                 window_steps=32, window_budget=1 << 13)
    rgb_it, opa_it, _, total = test_fn(
        occ_state, jnp.asarray(o), jnp.asarray(d),
        render_bkgd=jnp.ones(3),
    )
    assert total > 0
    # background must be composited: with far marching complete, the
    # windowed opacity matches the one-shot (which saturates on this
    # random-init field), not the truncated ROI-box value
    np.testing.assert_allclose(
        np.asarray(rgb_it), np.asarray(res.rgb), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(opa_it), np.asarray(res.opacity), atol=5e-3
    )


def test_distortion_loss_matches_naive():
    from quadraturefields_tpu.ops.distortion import flatten_eff_distloss

    rng = np.random.default_rng(0)
    n_rays = 4
    idx = np.sort(rng.integers(0, n_rays, 32)).astype(np.int32)
    w = rng.random(32).astype(np.float32)
    m = np.sort(rng.random(32)).astype(np.float32)
    for r in range(n_rays):  # sort midpoints within each ray
        sel = idx == r
        m[sel] = np.sort(m[sel])
    t = np.full(32, 0.01, np.float32)

    naive = 0.0
    for r in range(n_rays):
        sel = idx == r
        wr, mr, tr = w[sel], m[sel], t[sel]
        bi = np.sum(
            wr[:, None] * wr[None, :] * np.abs(mr[:, None] - mr[None, :])
        )
        naive += bi + np.sum(wr**2 * tr) / 3.0
    naive /= n_rays

    got = float(flatten_eff_distloss(
        jnp.asarray(w), jnp.asarray(m), jnp.asarray(t),
        jnp.asarray(idx), n_rays,
    ))
    assert np.isclose(got, naive, rtol=1e-4), (got, naive)


def test_vanilla_nerf_and_tnerf():
    from quadraturefields_tpu.models.mlp_nerf import (
        TNeRFConfig, VanillaNeRFConfig, tnerf_forward, tnerf_init,
        vanilla_nerf_forward, vanilla_nerf_init,
        vanilla_nerf_query_density,
    )

    cfg = VanillaNeRFConfig(net_depth=2, net_width=32,
                            net_width_condition=16)
    params = vanilla_nerf_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
    d = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    rgb, sigma = vanilla_nerf_forward(params, x, d, cfg)
    assert rgb.shape == (8, 3) and sigma.shape == (8, 1)
    assert (np.asarray(sigma) >= 0).all()
    assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()
    dens = vanilla_nerf_query_density(params, x, cfg)
    assert dens.shape == (8, 1)

    tcfg = TNeRFConfig(nerf=cfg)
    tparams = tnerf_init(jax.random.PRNGKey(3), tcfg)
    t = jnp.full((8, 1), 0.5)
    rgb_t, sigma_t = tnerf_forward(tparams, x, t, d, tcfg)
    assert rgb_t.shape == (8, 3)


def test_delta_field():
    from quadraturefields_tpu.models.field import (
        DeltaFieldConfig, delta_field_apply, delta_field_init,
    )

    cfg = DeltaFieldConfig(n_levels=2, log2_hashmap_size=12,
                           max_resolution=256, min_resolution=128)
    params = delta_field_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (16, 3), minval=-1.0, maxval=1.0
    )
    out = delta_field_apply(params, x, cfg)
    assert out.shape == (16,)
    assert np.isfinite(np.asarray(out)).all()


def test_own_views_spiral():
    from quadraturefields_tpu.data.own_views import SubjectLoaderOwnViews

    loader = SubjectLoaderOwnViews(resolution=32, camera_scale=2.0,
                                   n_views=4)
    assert len(loader) == 4
    rays = loader.rays_for_view(0)
    assert rays.origins.shape == (32 * 32, 3)
    # unit dirs; cameras look roughly at the origin
    n = np.linalg.norm(rays.viewdirs, axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)
    center_dir = rays.viewdirs.reshape(32, 32, 3)[16, 16]
    to_origin = -rays.origins[0] / np.linalg.norm(rays.origins[0])
    assert float(center_dir @ to_origin) > 0.95


def test_dnerf_loader(tmp_path):
    from quadraturefields_tpu.data.dnerf_synthetic import SubjectLoader
    from quadraturefields_tpu.data.fixture import write_fixture_dataset

    root = str(tmp_path)
    write_fixture_dataset(root, res=16, n_train=3, n_test=1)
    # add time fields
    for split in ("train", "test"):
        p = os.path.join(root, "fixture", f"transforms_{split}.json")
        with open(p) as f:
            meta = json.load(f)
        for i, fr in enumerate(meta["frames"]):
            fr["time"] = i / max(1, len(meta["frames"]) - 1)
        with open(p, "w") as f:
            json.dump(meta, f)
    ds = SubjectLoader("fixture", root, "train", num_rays=64)
    batch = ds.fetch_train_batch()
    assert batch["timestamps"].shape == (64, 1)
    assert 0.0 <= batch["timestamps"].min() <= batch["timestamps"].max() <= 1.0


def test_mc_tools_visibility_and_expand():
    from quadraturefields_tpu.data.nerf_synthetic import Rays
    from quadraturefields_tpu.geometry.mc_tools import (
        clean_mesh, expand_binaries, prune_mesh_train_visibility,
    )
    from quadraturefields_tpu.geometry.meshio import Mesh
    from tests.test_geometry import make_sphere_mesh

    b = np.zeros((4, 4, 4), bool)
    b[1:3, 1:3, 1:3] = True
    big = expand_binaries(b, M=16)
    assert big.shape == (16, 16, 16)
    assert big[8, 8, 8] and not big[0, 0, 0]

    v1, f1 = make_sphere_mesh(radius=0.5, n=8)
    v2 = v1 + np.array([10.0, 0, 0], np.float32)  # never visible
    mesh = Mesh(np.concatenate([v1, v2]),
                np.concatenate([f1, f1 + v1.shape[0]]))
    o = np.tile([[0, 0, -3.0]], (64, 1)).astype(np.float32)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(64, 3)) * 0.2 + [0, 0, 1]
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    datasets = [{"rays": Rays(origins=o, viewdirs=d)}]
    pruned = prune_mesh_train_visibility(mesh, datasets, max_hits=4)
    assert pruned.faces.shape[0] > 0
    assert pruned.vertices[:, 0].max() < 5.0  # far sphere removed

    cleaned = clean_mesh(mesh)
    assert cleaned.faces.shape[0] <= mesh.faces.shape[0]


def test_profiling_utils():
    from quadraturefields_tpu.utils.profiling import StageTimer, Throughput

    t = StageTimer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    assert t.counts["a"] == 2
    assert "a:" in t.summary()
    tp = Throughput()
    tp.add(100)
    assert tp.rate() > 0


def test_colmap_text_reader(tmp_path):
    from quadraturefields_tpu.data.colmap import SceneManager

    d = tmp_path / "sparse0"
    d.mkdir()
    (d / "cameras.txt").write_text(
        "# comment\n1 PINHOLE 640 480 500.0 500.0 320.0 240.0\n"
    )
    (d / "images.txt").write_text(
        "# comment\n"
        "1 1 0 0 0 0.1 0.2 0.3 1 img1.png\n"
        "\n"
    )
    m = SceneManager(str(d) + "/")
    m.load_cameras()
    m.load_images()
    cam = m.cameras[1]
    assert cam.fx == 500.0 and cam.cx == 320.0
    im = m.images[1]
    np.testing.assert_allclose(im.R(), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(im.tvec, [0.1, 0.2, 0.3])


def test_checkpoint_roundtrip(tmp_path):
    from quadraturefields_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint,
    )

    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.asarray(7),
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, state)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3)
    )
    assert int(restored["step"]) == 7

"""uint8 codec round-trips + texture compression + UV atlas."""
import jax.numpy as jnp
import numpy as np

from quadraturefields_tpu.ops import quantize as q


def test_sigma_roundtrip():
    sigma = jnp.asarray([0.0, 1.0, 10.0, 100.0, 500.0])
    rec = q.inverse_of_compressed_sigma(q.compress_sigma(sigma))
    # alpha-space quantization: compare in alpha domain
    a0 = 1 - np.exp(-np.asarray(sigma) * 0.005)
    a1 = 1 - np.exp(-np.asarray(rec) * 0.005)
    np.testing.assert_allclose(a1, a0, atol=1.0 / 255)


def test_color_roundtrip_sigmoid():
    c = jnp.asarray([[-3.0, 0.0, 2.5]])
    rec = q.inverse_of_compressed_colors(q.compress_colors(c))
    s0 = 1 / (1 + np.exp(-np.asarray(c)))
    s1 = 1 / (1 + np.exp(-np.asarray(rec)))
    np.testing.assert_allclose(s1, s0, atol=1.5 / 255)


def test_color_roundtrip_linear():
    c = jnp.asarray([[-10.0, 0.0, 11.0]])
    rec = q.inverse_of_compressed_colors(
        q.compress_colors(c, compress_type="linear"),
        compress_type="linear",
    )
    np.testing.assert_allclose(np.asarray(rec), np.asarray(c), atol=0.1)


def test_axis_roundtrip():
    v = jnp.asarray([[0.3, -0.5, 0.81], [1.0, 0.0, 0.0], [0.0, 0.0, -1.0]])
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    az, el = q.compress_polar_coordinates(v)
    rec = q.inverse_of_azimuth_and_elevation(az, el)
    dots = np.sum(np.asarray(rec) * np.asarray(v), axis=-1)
    assert (dots > 0.999).all(), dots


def test_lambda_roundtrip():
    lam = jnp.asarray([0.1, 1.0, 10.0, 50.0])
    rec = q.inverse_of_compressed_lambda(q.compress_lambda(lam))
    np.testing.assert_allclose(
        np.log(np.asarray(rec)), np.log(np.asarray(lam)), atol=0.05
    )


def test_feature_compression_roundtrip(tmp_path):
    from quadraturefields_tpu.baking.compression import FeatureCompression

    num_lobes = 3
    n = 64
    rng = np.random.default_rng(0)
    feats = np.zeros((n, 3 + 7 * num_lobes + 1), np.float32)
    feats[:, :3] = rng.normal(0, 2, (n, 3))            # diffuse
    for i in range(num_lobes):
        o = 3 + 7 * i
        axis = rng.normal(size=(n, 3))
        axis /= np.linalg.norm(axis, axis=1, keepdims=True)
        feats[:, o:o + 3] = axis
        feats[:, o + 3] = rng.uniform(0.1, 20.0, n)    # lambda
        feats[:, o + 4:o + 7] = rng.normal(0, 2, (n, 3))
    feats[:, -1] = rng.uniform(0, 200, n)              # sigma

    comp = FeatureCompression(num_lobes, initialize=True, texture_size=16)
    idx = np.stack([np.arange(n) // 16, np.arange(n) % 16], axis=1)
    comp.load_features_into_maps(feats, idx)
    comp.save_to_file(str(tmp_path) + "/")
    loaded = FeatureCompression(
        num_lobes, path=str(tmp_path) + "/"
    )
    rec = np.asarray(
        loaded.get_features_from_texture_map(jnp.asarray(idx))
    )
    # compare the decoded SG color under random dirs (the rendering
    # quantity); exact feature values differ by quantization
    from quadraturefields_tpu.models.ngp import (
        NGPConfig, ngp_features_to_rgb,
    )

    cfg = NGPConfig(head="sg", num_g_lobes=num_lobes)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rgb0 = np.asarray(
        ngp_features_to_rgb(jnp.asarray(feats[:, :-1]),
                            jnp.asarray(dirs.astype(np.float32)), cfg)
    )
    rgb1 = np.asarray(
        ngp_features_to_rgb(jnp.asarray(rec[:, :-1]),
                            jnp.asarray(dirs.astype(np.float32)), cfg)
    )
    assert np.abs(rgb0 - rgb1).mean() < 0.05
    # sigma decodes within quantization error (alpha domain)
    a0 = 1 - np.exp(-feats[:, -1] * 0.005)
    a1 = 1 - np.exp(-rec[:, -1] * 0.005)
    np.testing.assert_allclose(a1, a0, atol=1.0 / 255)


def test_uv_atlas_and_rasterize():
    from quadraturefields_tpu.baking.uvatlas import (
        build_uv_atlas, rasterize_v_image,
    )
    from quadraturefields_tpu.geometry.meshio import Mesh

    # two separated quads = two segments
    quad = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    verts = np.concatenate([quad, quad + [0, 0, 2.0]])
    faces = np.array(
        [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32
    )
    mesh = Mesh(verts, faces)
    seg = np.array([0, 0, 1, 1], np.int32)
    atlas_mesh, uv, _ = build_uv_atlas(mesh, seg, texture_size=128)
    assert uv.shape == (atlas_mesh.vertices.shape[0], 2)
    assert uv.min() >= 0 and uv.max() < 128

    v_img, tri_img = rasterize_v_image(atlas_mesh, uv, 128)
    filled = tri_img >= 0
    assert filled.sum() > 500
    # texel positions lie on one of the two quad planes
    z = v_img[filled][:, 2]
    near0 = np.abs(z) < 0.05
    near2 = np.abs(z - 2.0) < 0.05
    assert (near0 | near2).mean() > 0.99


def test_prune_spiral_coverage_keeps_unseen_faces():
    """A face no train ray ever hits is deleted at ANY weight threshold;
    spiral extra_views (the reference's trainval-coverage analog,
    prune_mesh_after_finetuning.py:62-66) must keep it. Quad A sits at
    the origin under a narrow top-down train bundle; quad B at x=+2 is
    outside that bundle but inside the spiral rings' frustums."""
    import jax
    import numpy as np

    from quadraturefields_tpu.baking.stage6 import prune_mesh
    from quadraturefields_tpu.data.nerf_synthetic import Rays
    from quadraturefields_tpu.data.own_views import spiral_prune_rings
    from quadraturefields_tpu.geometry.intersect import MeshIntersection
    from quadraturefields_tpu.geometry.meshio import Mesh
    from quadraturefields_tpu.models.ngp import NGPConfig, ngp_init

    quad_v = np.asarray(
        [[-0.4, -0.4, 0], [0.4, -0.4, 0], [0.4, 0.4, 0], [-0.4, 0.4, 0]],
        np.float32,
    )
    quad_f = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    v_b = quad_v + np.asarray([2.0, 0, 0], np.float32)
    mesh = Mesh(np.concatenate([quad_v, v_b]),
                np.concatenate([quad_f, quad_f + 4]))
    mi = MeshIntersection(mesh=mesh, simplify_mesh=False,
                          num_intersections=4)

    # narrow top-down train bundle over quad A only
    n = 256
    rng = np.random.default_rng(0)
    xy = rng.uniform(-0.35, 0.35, (n, 2)).astype(np.float32)
    origins = np.concatenate(
        [xy, np.full((n, 1), 3.0, np.float32)], axis=1
    )
    viewdirs = np.tile(np.asarray([[0, 0, -1.0]], np.float32), (n, 1))

    class OneView:
        def __len__(self):
            return 1

        def fetch_eval_view(self, i):
            return {"rays": Rays(origins=origins, viewdirs=viewdirs)}

    cfg = NGPConfig(head="mlp", use_viewdirs=False,
                    log2_hashmap_size=12, max_resolution=64)
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    aabb = np.asarray([-3, -3, -3, 3, 3, 3], np.float32)
    rings = spiral_prune_rings(distance=4.0, n_per_ring=4,
                               z_fracs=(0.3, 0.7), resolution=64)

    kw = dict(render_step_size=5e-3, weight_thres=0.0,
              rays_per_batch=1024)
    pruned_no, w_no = prune_mesh(
        params, cfg, mi, OneView(), aabb, **kw
    )
    pruned_sp, w_sp = prune_mesh(
        params, cfg, mi, OneView(), aabb, extra_views=rings, **kw
    )
    # faces 0/1 (quad A) hit by the train bundle in both
    assert w_no[0] > 0 and w_no[1] > 0
    # quad B invisible to the train bundle, visible from the rings
    assert w_no[2] == 0 and w_no[3] == 0
    assert w_sp[2] > 0 and w_sp[3] > 0
    assert pruned_no.faces.shape[0] == 2
    assert pruned_sp.faces.shape[0] == 4

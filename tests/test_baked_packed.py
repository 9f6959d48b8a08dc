"""Packed-hit baked renderer parity vs the dense-row path.

The packed path uploads only valid hits (slot, tri, t) and composites
in the ray-sorted stream with segmented scans; it must reproduce the
dense [R, H] row_composite output to scan-order tolerance.
"""
import numpy as np

from quadraturefields_tpu.baking.compression import FeatureCompression
from quadraturefields_tpu.baking.stage6 import BakedRenderer, segment_and_atlas
from quadraturefields_tpu.geometry.meshio import Mesh
from quadraturefields_tpu.models.ngp import NGPConfig


def _sphere_renderer(tex=128):
    import bench

    verts, faces = bench._bumpy_sphere(30)
    mesh = Mesh(verts, faces)
    am, uv, v_img, tri_img = segment_and_atlas(mesh, tex)
    comp = FeatureCompression(
        num_lobes=2, initialize=True, texture_size=tex,
        compression_type="sigmoid",
    )
    rng = np.random.default_rng(0)
    rows, cols = np.nonzero(tri_img >= 0)
    feats = rng.normal(0, 1, (rows.shape[0], 3 + 7 * 2 + 1)).astype(
        np.float32
    )
    feats[:, -1] = rng.uniform(50, 400, rows.shape[0])
    comp.load_features_into_maps(feats, np.stack([rows, cols], 1))
    return BakedRenderer(
        am, uv, comp, NGPConfig(head="sg", num_g_lobes=2), max_hits=8,
        render_step_size=5e-3,
    )


def test_packed_matches_dense():
    r = _sphere_renderer()
    rng = np.random.default_rng(1)
    n = 256
    eye = np.asarray([2.5, 0.0, 0.5], np.float32)
    tgt = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    d = tgt - eye
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    o = np.broadcast_to(eye, d.shape).copy()
    rgb_d, a_d, dep_d = r.render_rays(o, d, packed=False)
    rgb_p, a_p, dep_p = r.render_rays(o, d, packed=True)
    np.testing.assert_allclose(rgb_d, rgb_p, atol=2e-5)
    np.testing.assert_allclose(a_d, a_p, atol=2e-5)
    np.testing.assert_allclose(dep_d, dep_p, atol=1e-4)


def test_adaptive_cap_renders_every_hit():
    """Regression for the fixed pack_cap_hits=2.0 truncation bug: a mesh
    whose rays each carry 8 hits (demand 8x rays) must render packed ==
    dense. With the old fixed cap the packed path silently dropped hit
    levels 2+ (measured 10 dB of baked PSNR on the prod mesh)."""
    import bench

    from quadraturefields_tpu.baking.compression import FeatureCompression
    from quadraturefields_tpu.models.ngp import NGPConfig

    # 8 stacked unit quads: a +z ray through the stack hits all 8
    quad_v = np.asarray(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    quad_f = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    verts, faces = [], []
    for k in range(8):
        v = quad_v.copy()
        v[:, 2] = 0.1 * k
        verts.append(v)
        faces.append(quad_f + 4 * k)
    mesh = Mesh(np.concatenate(verts), np.concatenate(faces))
    tex = 128
    am, uv, v_img, tri_img = segment_and_atlas(mesh, tex)
    comp = FeatureCompression(
        num_lobes=2, initialize=True, texture_size=tex,
        compression_type="sigmoid",
    )
    rng = np.random.default_rng(0)
    rows, cols = np.nonzero(tri_img >= 0)
    feats = rng.normal(0, 1, (rows.shape[0], 3 + 7 * 2 + 1)).astype(
        np.float32
    )
    feats[:, -1] = rng.uniform(20, 80, rows.shape[0])
    comp.load_features_into_maps(feats, np.stack([rows, cols], 1))
    r = BakedRenderer(
        am, uv, comp, NGPConfig(head="sg", num_g_lobes=2), max_hits=8,
        render_step_size=5e-3,
    )
    n = 64
    xy = rng.uniform(-0.9, 0.9, (n, 2)).astype(np.float32)
    o = np.concatenate(
        [xy, np.full((n, 1), -1.0, np.float32)], axis=1
    )
    d = np.tile(np.asarray([[0, 0, 1.0]], np.float32), (n, 1))
    tri_ids, _, valid = r.mesh_intersect.intersect_rows(o, d)
    assert int(valid.sum()) == 8 * n  # demand 8x rays > old 2x cap
    rgb_d, a_d, _ = r.render_rays(o, d, packed=False)
    for uv_transport in (False, True):
        rgb_p, a_p, _ = r.render_rays(o, d, uv_transport=uv_transport)
        np.testing.assert_allclose(rgb_d, rgb_p, atol=2e-5)
        np.testing.assert_allclose(a_d, a_p, atol=2e-5)


def test_pack_hits_overflow_drops_depth_levels():
    """When cap < valid hits, whole trailing DEPTH levels drop, never
    whole rays: every surviving slot's h-level must be < the cutoff and
    every ray keeps its nearest hit."""
    r = _sphere_renderer()
    tri_ids = np.full((64, 8), -1, np.int32)
    ts = np.zeros((64, 8), np.float32)
    tri_ids[:, :4] = 7  # every ray has 4 hits
    ts[:, :4] = np.asarray([1.0, 1.5, 2.0, 2.5])
    cap = 64 * 2 + 10  # fits two full levels, not three
    slots, tri_p, ts_p = r.pack_hits(tri_ids, ts, cap)
    valid = slots >= 0
    assert valid.sum() == 64 * 2
    h = slots[valid] % 8
    assert h.max() == 1  # levels 0 and 1 kept, 2+ dropped
    rays = np.unique(slots[valid] // 8)
    assert rays.shape[0] == 64

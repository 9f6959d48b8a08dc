"""UV-atlas injectivity on curved meshes (VERDICT #6).

The reference gets per-chart injectivity from xatlas
(generate_uv_xatlas_old.py:49-94); our PCA-plane projection is only
injective after fold-splitting. These tests rasterize curved fixture
meshes in numpy and assert that no texel center lies strictly inside
two different triangles — the failure mode that silently averages two
surface regions into one texel during baking.
"""
import numpy as np

from quadraturefields_tpu.baking.uvatlas import (
    build_uv_atlas,
    split_folded_segments,
)
from quadraturefields_tpu.geometry.meshio import Mesh


def _uv_sphere(n=24, radius=1.0):
    th = np.linspace(0, np.pi, n + 1)
    ph = np.linspace(0, 2 * np.pi, n + 1)[:-1]
    T, P = np.meshgrid(th, ph, indexing="ij")
    x = radius * np.sin(T) * np.cos(P)
    y = radius * np.sin(T) * np.sin(P)
    z = radius * np.cos(T)
    verts = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)

    def vid(i, j):
        return i * n + (j % n)

    faces = []
    for i in range(n):
        for j in range(n):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j), vid(i + 1, j + 1)
            faces.append([a, b, c])
            faces.append([b, d, c])
    return Mesh(verts, np.asarray(faces, np.int32))


def _strict_interior_claims(uv, faces, size):
    """Count, per texel, the triangles whose *strict interior* contains
    the texel center. Adjacent triangles only share boundary texels, so
    any texel with count >= 2 is a genuine chart/projection overlap."""
    counts = np.zeros((size, size), np.int32)
    tri = uv[faces]                                   # [F, 3, 2]
    for t in tri:
        lo = np.floor(t.min(0)).astype(int)
        hi = np.ceil(t.max(0)).astype(int) + 1
        lo = np.clip(lo, 0, size)
        hi = np.clip(hi, 0, size)
        if (hi <= lo).any():
            continue
        xs = np.arange(lo[0], hi[0]) + 0.5
        ys = np.arange(lo[1], hi[1]) + 0.5
        X, Y = np.meshgrid(xs, ys, indexing="ij")
        p = np.stack([X, Y], -1)                      # [w, h, 2]
        d = t[1:] - t[0]                              # [2, 2]
        det = d[0, 0] * d[1, 1] - d[0, 1] * d[1, 0]
        if abs(det) < 1e-9:
            continue
        rel = p - t[0]
        b1 = (rel[..., 0] * d[1, 1] - rel[..., 1] * d[1, 0]) / det
        b2 = (rel[..., 1] * d[0, 0] - rel[..., 0] * d[0, 1]) / det
        eps = 1e-4
        inside = (b1 > eps) & (b2 > eps) & (b1 + b2 < 1.0 - eps)
        counts[lo[0]:hi[0], lo[1]:hi[1]] += inside.astype(np.int32)
    return counts


def test_sphere_single_segment_is_fold_split():
    """A whole sphere as ONE segment is maximally folded; the splitter
    must partition it into cone-limited connected charts."""
    mesh = _uv_sphere(16)
    segs = split_folded_segments(
        mesh, np.zeros((mesh.faces.shape[0],), np.int64)
    )
    assert len(np.unique(segs)) >= 4
    # every refined segment passes the cone criterion
    from quadraturefields_tpu.baking.uvatlas import _face_normals

    normals = _face_normals(mesh)
    v, f = mesh.vertices, mesh.faces
    areas = 0.5 * np.linalg.norm(
        np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]]),
        axis=1,
    )
    for lab in np.unique(segs):
        sel = segs == lab
        # zero-area faces rasterize to nothing and carry no weight in
        # the area-weighted cone criterion; skip them here too
        sel &= areas > 1e-12 * max(areas.max(), 1e-30)
        n = normals[sel]
        if n.shape[0] <= 1:
            continue
        w = areas[sel]
        mean = (n * w[:, None]).sum(0)
        mean /= max(np.linalg.norm(mean), 1e-12)
        assert (n @ mean).min() >= 0.5 - 1e-6


def test_sphere_atlas_injective():
    mesh = _uv_sphere(20)
    size = 256
    atlas_mesh, uv, _ = build_uv_atlas(
        mesh, np.zeros((mesh.faces.shape[0],), np.int64), size
    )
    counts = _strict_interior_claims(uv, atlas_mesh.faces, size)
    n_collisions = int((counts >= 2).sum())
    assert n_collisions == 0, f"{n_collisions} overlapping texels"


def test_parallel_sheets_atlas_injective():
    """Two disconnected parallel quads with identical normals: the
    connectivity split (not the normal cone) must separate them."""
    verts = np.array(
        [
            [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],       # z=0
            [0, 0, 0.1], [1, 0, 0.1], [1, 1, 0.1], [0, 1, 0.1],
        ],
        np.float32,
    )
    faces = np.array(
        [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32
    )
    mesh = Mesh(verts, faces)
    size = 128
    atlas_mesh, uv, _ = build_uv_atlas(
        mesh, np.zeros((4,), np.int64), size
    )
    counts = _strict_interior_claims(uv, atlas_mesh.faces, size)
    assert int((counts >= 2).sum()) == 0


def test_fold_split_preserves_flat_segments():
    """A near-planar segment must pass through unsplit (chart count and
    texel sharing parity with the pre-split behavior)."""
    # gentle paraboloid patch: normals well inside a 60-degree cone
    n = 12
    xs = np.linspace(-0.5, 0.5, n)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    Z = 0.1 * (X**2 + Y**2)
    verts = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            b = a + 1
            c = a + n
            d = c + 1
            faces.append([a, b, c])
            faces.append([b, d, c])
    mesh = Mesh(verts, np.asarray(faces, np.int32))
    segs = split_folded_segments(
        mesh, np.zeros((mesh.faces.shape[0],), np.int64)
    )
    assert len(np.unique(segs)) == 1


def test_obj_uv_round_trip(tmp_path):
    from quadraturefields_tpu.geometry.meshio import (
        load_obj_with_uv,
        save_obj_with_uv,
    )

    mesh = _uv_sphere(6)
    rng = np.random.default_rng(0)
    uv = rng.uniform(0, 64, (mesh.vertices.shape[0], 2)).astype(
        np.float32
    )
    path = str(tmp_path / "atlas.obj")
    save_obj_with_uv(path, mesh, uv)
    mesh2, uv2 = load_obj_with_uv(path)
    np.testing.assert_allclose(mesh2.vertices, mesh.vertices, atol=1e-5)
    np.testing.assert_array_equal(mesh2.faces, mesh.faces)
    np.testing.assert_allclose(uv2, uv, atol=1e-4)


def test_skyline_pack_valid_and_beats_shelf():
    """Skyline bottom-left packing (VERDICT round-2 #7): rects stay in
    bounds, never overlap, and fit a mixed elongated/square workload at
    a scale where shelf packing overflows."""
    from quadraturefields_tpu.baking.uvatlas import (
        _shelf_pack, _skyline_pack,
    )

    rng = np.random.default_rng(0)
    n = 120
    sizes = np.concatenate([
        rng.uniform([40, 4], [120, 10], (n // 3, 2)),   # wide strips
        rng.uniform([4, 40], [10, 120], (n // 3, 2)),   # tall strips
        rng.uniform([8, 8], [48, 48], (n - 2 * (n // 3), 2)),
    ]).astype(np.float32)

    # at this size the workload fills 83% of the atlas: skyline packs
    # it, shelf overflows (measured; shelf first fits at 328 = 79%)
    atlas = 320
    off = _skyline_pack(sizes, atlas)
    assert off is not None
    # bounds + pairwise overlap on the ceiled integer rects
    iw = np.ceil(sizes[:, 0]).astype(int)
    ih = np.ceil(sizes[:, 1]).astype(int)
    x0, y0 = off[:, 0].astype(int), off[:, 1].astype(int)
    assert (x0 >= 0).all() and (y0 >= 0).all()
    assert (x0 + iw <= atlas).all() and (y0 + ih <= atlas).all()
    x1, y1 = x0 + iw, y0 + ih
    for i in range(n):
        ox = np.minimum(x1[i], x1) - np.maximum(x0[i], x0)
        oy = np.minimum(y1[i], y1) - np.maximum(y0[i], y0)
        bad = (ox > 0) & (oy > 0)
        bad[i] = False
        assert not bad.any(), f"rect {i} overlaps {np.where(bad)[0]}"
    # utilization at the tight size: area / atlas^2
    util = float((iw * ih).sum()) / atlas**2
    assert util >= 0.8, util
    # shelf needs a strictly larger atlas on this workload
    assert _shelf_pack(sizes, atlas) is None


def test_atlas_stats_reported():
    mesh = _uv_sphere(16)
    _, _, stats = build_uv_atlas(
        mesh, np.zeros((mesh.faces.shape[0],), np.int64), 256
    )
    assert 0.0 < stats["tri_utilization"] <= 1.0
    assert stats["rect_utilization"] >= stats["tri_utilization"]
    assert stats["n_charts"] >= 1


def test_area_tolerant_split_ignores_sliver_outliers():
    """A flat grid with a few zero-ish-area flipped slivers: the strict
    splitter fragments on the outliers (one bad face fails a whole
    segment), the area-tolerant mode keeps the macro chart whole. This
    is the decimated-mesh regime: marching-tets + vertex clustering
    leaves sliver faces whose normals are noise (see
    tools/profiles/diag_atlas_sweep.py measurements)."""
    n = 12
    xs, ys = np.meshgrid(np.arange(n + 1), np.arange(n + 1),
                         indexing="ij")
    verts = np.stack(
        [xs, ys, np.zeros_like(xs)], -1
    ).reshape(-1, 3).astype(np.float32)

    def vid(i, j):
        return i * (n + 1) + j

    faces = []
    for i in range(n):
        for j in range(n):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j), vid(i + 1, j + 1)
            faces.append([a, b, c])
            faces.append([b, d, c])
    faces = np.asarray(faces, np.int32)
    # tilt a handful of interior faces nearly vertical (normals far
    # outside the cone) by raising one vertex; their area stays small
    # relative to the grid
    bumped = verts.copy()
    for k in (vid(3, 3), vid(7, 5), vid(5, 9)):
        bumped[k, 2] = 0.4
    mesh = Mesh(bumped, faces)
    segs0 = np.zeros((faces.shape[0],), np.int64)

    strict = split_folded_segments(mesh, segs0, cos_thres=0.9)
    tolerant = split_folded_segments(
        mesh, segs0, cos_thres=0.9, area_tol=0.05
    )
    assert len(np.unique(tolerant)) < len(np.unique(strict))
    assert len(np.unique(tolerant)) == 1


def test_scale_refinement_grows_utilization():
    """The retry-shrink loop lands at init_ratio * 0.85^(2k); the
    binary refinement must claw back part of that factor without
    breaking feasibility (offsets still pack)."""
    mesh = _uv_sphere(16)
    segs = np.zeros((mesh.faces.shape[0],), np.int64)
    _, _, s_plain = build_uv_atlas(
        mesh, segs, 256, padding=1.0, scale_refine=0
    )
    _, uv, s_ref = build_uv_atlas(
        mesh, segs, 256, padding=1.0, scale_refine=4
    )
    assert s_ref["tri_utilization"] >= s_plain["tri_utilization"]
    # refined packing must still be in-bounds
    assert uv.min() >= 0.0 and uv.max() <= 256.0

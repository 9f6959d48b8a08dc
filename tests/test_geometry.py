"""C++ geometry library: BVH multi-hit vs brute force, marching
tetrahedra surface accuracy, decimation, segmentation, mesh IO."""
import numpy as np
import pytest

from quadraturefields_tpu.geometry import (
    BVH,
    Mesh,
    decimate_vertex_clustering,
    load_ply,
    marching_tetrahedra,
    save_ply,
    segment_mesh,
)


def make_sphere_mesh(radius=1.0, n=24):
    """UV-sphere triangle mesh."""
    thetas = np.linspace(0, np.pi, n)
    phis = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    verts = []
    for t in thetas:
        for p in phis:
            verts.append(
                [
                    radius * np.sin(t) * np.cos(p),
                    radius * np.sin(t) * np.sin(p),
                    radius * np.cos(t),
                ]
            )
    verts = np.array(verts, np.float32)
    faces = []
    m = 2 * n
    for i in range(n - 1):
        for j in range(m):
            a = i * m + j
            b = i * m + (j + 1) % m
            c = (i + 1) * m + j
            d = (i + 1) * m + (j + 1) % m
            faces.append([a, b, c])
            faces.append([b, d, c])
    return verts, np.array(faces, np.int32)


def brute_force_hits(verts, faces, o, d, max_hits):
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    e1, e2 = b - a, c - a
    p = np.cross(d, e2)
    det = np.einsum("ij,ij->i", e1, p)
    ok = np.abs(det) > 1e-9
    inv = np.where(ok, 1.0 / np.where(ok, det, 1), 0)
    s = o - a
    u = np.einsum("ij,ij->i", s, p) * inv
    q = np.cross(s, e1)
    v = np.einsum("j,ij->i", d, q) * inv
    t = np.einsum("ij,ij->i", e2, q) * inv
    mask = ok & (u >= -1e-6) & (v >= -1e-6) & (u + v <= 1 + 1e-6) & (t > 1e-6)
    ts = np.sort(t[mask])
    # dedup within eps like the BVH
    dedup = []
    for tv in ts:
        if dedup and abs(dedup[-1] - tv) < 1e-7:
            continue
        dedup.append(tv)
    return np.array(dedup[:max_hits])


def test_bvh_multi_hit_matches_bruteforce():
    verts, faces = make_sphere_mesh(radius=0.8, n=12)
    bvh = BVH(verts, faces, n_threads=1)
    rng = np.random.default_rng(0)
    for _ in range(20):
        o = np.array([rng.uniform(-3, -2), rng.uniform(-0.5, 0.5),
                      rng.uniform(-0.5, 0.5)], np.float32)
        d = np.array([1.0, rng.uniform(-0.2, 0.2),
                      rng.uniform(-0.2, 0.2)], np.float32)
        d /= np.linalg.norm(d)
        tri_ids, ts, counts = bvh.intersect(o[None], d[None], max_hits=8)
        expected = brute_force_hits(verts, faces, o, d, 8)
        got = ts[0, : counts[0]]
        assert counts[0] == len(expected), (counts[0], len(expected))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_bvh_hits_sorted_and_padded():
    verts, faces = make_sphere_mesh(radius=0.5, n=10)
    bvh = BVH(verts, faces)
    o = np.array([[0.0, 0.0, -3.0]], np.float32)
    d = np.array([[0.0, 0.0, 1.0]], np.float32)
    tri_ids, ts, counts = bvh.intersect(o, d, max_hits=25)
    n = counts[0]
    assert n == 2  # enters and exits the sphere
    assert (np.diff(ts[0, :n]) > 0).all()
    assert (tri_ids[0, n:] == -1).all()


def test_bvh_refit_after_deform():
    verts, faces = make_sphere_mesh(radius=0.5, n=10)
    bvh = BVH(verts, faces)
    o = np.array([[0.0, 0.0, -3.0]], np.float32)
    d = np.array([[0.0, 0.0, 1.0]], np.float32)
    _, ts0, _ = bvh.intersect(o, d, max_hits=4)
    bvh.update_vertices(verts * 2.0)  # sphere radius 1.0
    _, ts1, c1 = bvh.intersect(o, d, max_hits=4)
    assert c1[0] == 2
    np.testing.assert_allclose(ts1[0, 0], 2.0, atol=0.02)
    assert abs(ts1[0, 0] - ts0[0, 0]) > 0.3


def test_marching_tets_sphere_radius():
    """Isosurface of an SDF sphere: vertices must lie on the sphere."""
    n = 48
    lin = np.linspace(-1, 1, n, dtype=np.float32)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
    sdf = 0.6 - np.linalg.norm(g, axis=-1)  # >0 inside radius 0.6
    spacing = np.full(3, 2.0 / (n - 1), np.float32)
    verts, faces = marching_tetrahedra(
        sdf, level=0.0, origin=[-1, -1, -1], spacing=spacing
    )
    assert verts.shape[0] > 100 and faces.shape[0] > 100
    r = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(r, 0.6, atol=0.05)
    # faces index valid vertices
    assert faces.max() < verts.shape[0] and faces.min() >= 0


def test_marching_tets_watertight_sphere():
    """Every edge of the extracted surface is shared by exactly 2
    faces (closed surface)."""
    n = 32
    lin = np.linspace(-1, 1, n, dtype=np.float32)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
    sdf = 0.55 - np.linalg.norm(g, axis=-1)
    verts, faces = marching_tetrahedra(sdf, level=0.0)
    edges = {}
    for f in faces:
        for e in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            key = (min(e), max(e))
            edges[key] = edges.get(key, 0) + 1
    counts = np.array(list(edges.values()))
    assert (counts == 2).mean() > 0.99


def test_decimate_reduces_vertices():
    verts, faces = make_sphere_mesh(radius=1.0, n=24)
    dv, df = decimate_vertex_clustering(verts, faces, voxel_size=0.3)
    assert dv.shape[0] < verts.shape[0] / 4
    assert df.shape[0] > 10
    # decimated verts stay near the sphere
    r = np.linalg.norm(dv, axis=1)
    assert (np.abs(r - 1.0) < 0.3).mean() > 0.95


def test_segment_two_spheres():
    """Two disjoint spheres must land in different segments."""
    v1, f1 = make_sphere_mesh(radius=0.5, n=10)
    v2 = v1 + np.array([3.0, 0, 0], np.float32)
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f1 + v1.shape[0]])
    seg = segment_mesh(verts, faces, kthr=0.5, min_size=5)
    s1 = set(seg[: f1.shape[0]].tolist())
    s2 = set(seg[f1.shape[0]:].tolist())
    assert s1.isdisjoint(s2)


def test_ply_roundtrip(tmp_path):
    verts, faces = make_sphere_mesh(radius=0.7, n=8)
    mesh = Mesh(verts, faces)
    p = str(tmp_path / "m.ply")
    save_ply(p, mesh)
    loaded = load_ply(p)
    np.testing.assert_allclose(loaded.vertices, mesh.vertices, rtol=1e-6)
    np.testing.assert_array_equal(loaded.faces, mesh.faces)


def test_marching_tets_consistent_winding():
    """Every emitted triangle's normal points away from the inside
    (field > level) region — i.e. outward for an SDF sphere. The 6-tet
    cube decomposition alternates handedness, so case-table orderings
    alone emit ~random orientations (measured 56/44 before the
    geometric orientation step), which scrambles every normal-based
    consumer (UV fold-splitting, prune visibility)."""
    n = 48
    lin = np.linspace(-1, 1, n, dtype=np.float32)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
    sdf = 0.6 - np.linalg.norm(g, axis=-1)
    spacing = np.full(3, 2.0 / (n - 1), np.float32)
    verts, faces = marching_tetrahedra(
        sdf, level=0.0, origin=[-1, -1, -1], spacing=spacing
    )
    fn = np.cross(
        verts[faces[:, 1]] - verts[faces[:, 0]],
        verts[faces[:, 2]] - verts[faces[:, 0]],
    )
    cen = verts[faces].mean(1)
    outward = (fn * cen).sum(1)
    area2 = np.linalg.norm(fn, axis=1)
    keep = area2 > 1e-12  # slivers have no meaningful orientation
    assert (outward[keep] > 0).mean() > 0.99

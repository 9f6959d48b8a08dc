"""Dense-row quadrature compositor vs the flat packed compositor, plus
deformation accumulation semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from quadraturefields_tpu.ops import scan
from quadraturefields_tpu.render.quadrature import (
    HitRows,
    apply_row_permutation,
    mesh_accumulate_deformation,
    mesh_update_vertices,
    resort_rows,
    row_composite,
)


def test_row_composite_matches_flat_derive_properties():
    rng = np.random.default_rng(0)
    R, H = 6, 5
    sigmas = rng.uniform(0, 50, (R, H)).astype(np.float32)
    rgbs = rng.random((R, H, 3)).astype(np.float32)
    ts = np.sort(rng.uniform(1, 3, (R, H)), axis=1).astype(np.float32)
    deltas = np.full((R, H), 0.005, np.float32)
    valid = rng.random((R, H)) > 0.3
    valid[:, 0] = True

    rgb_r, alpha_r, depth_r, w_r = row_composite(
        jnp.asarray(rgbs), jnp.asarray(sigmas), jnp.asarray(ts),
        jnp.asarray(deltas), jnp.asarray(valid), bg_color="white",
    )

    # flat packed equivalent per ray
    for r in range(R):
        sel = valid[r]
        n = sel.sum()
        if n == 0:
            continue
        idx = jnp.zeros((n,), jnp.int32)
        rgb_f, alpha_f, depth_f, _ = scan.derive_properties(
            jnp.asarray(rgbs[r][sel]),
            jnp.asarray(sigmas[r][sel]),
            jnp.asarray(ts[r][sel]),
            jnp.asarray(deltas[r][sel]),
            idx,
            1,
            bg_color="white",
        )
        np.testing.assert_allclose(
            np.asarray(rgb_r[r]), np.asarray(rgb_f[0]), rtol=1e-4,
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(alpha_r[r]), np.asarray(alpha_f[0]), rtol=1e-4,
            atol=1e-6,
        )


def test_resort_rows_pushes_invalid_to_tail():
    ts = jnp.asarray([[3.0, 1.0, 2.0], [5.0, 4.0, 6.0]])
    valid = jnp.asarray([[True, False, True], [True, True, False]])
    order = resort_rows(ts, valid)
    (ts_s,) = apply_row_permutation(order, ts)
    valid_s = jnp.take_along_axis(valid, order, axis=1)
    np.testing.assert_array_equal(np.asarray(valid_s),
                                  [[True, True, False],
                                   [True, True, False]])
    np.testing.assert_allclose(np.asarray(ts_s[0, :2]), [2.0, 3.0])
    np.testing.assert_allclose(np.asarray(ts_s[1, :2]), [4.0, 5.0])


def test_mesh_accumulate_and_update():
    n_faces = 4
    cache_d = jnp.zeros((n_faces, 3))
    cache_w = jnp.full((n_faces,), 1e-8)
    dh = jnp.asarray([[[1.0, 0, 0], [0, 2.0, 0]]])     # [1, 2, 3]
    weights = jnp.asarray([[0.5, 0.25]])
    tri_ids = jnp.asarray([[2, 2]])
    valid = jnp.asarray([[True, True]])
    cache_d, cache_w = mesh_accumulate_deformation(
        cache_d, cache_w, dh, weights, tri_ids, valid, n_faces
    )
    np.testing.assert_allclose(
        np.asarray(cache_d[2]), [0.5, 0.5, 0.0], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(cache_w[2]), 0.75, atol=1e-6)
    assert float(cache_w[0]) < 1e-6

    # vertex update: face 2's deformation (clipped) spreads to its verts
    vertices = np.zeros((5, 3), np.float32)
    faces = np.array([[0, 1, 2], [1, 2, 3], [2, 3, 4], [0, 2, 4]], np.int32)
    new_v = mesh_update_vertices(vertices, faces, cache_d, cache_w,
                                 scaling=0.1)
    # face 2 = verts {2,3,4}; mean deformation clipped to 0.1
    assert abs(new_v[3, 0] - 0.1 / 2) < 1e-5  # vert 3 in faces 1,2
    assert new_v[1, 0] == 0.0 or abs(new_v[1, 0]) < 0.06


def test_padding_rows_are_noops():
    R, H = 2, 4
    rgbs = jnp.ones((R, H, 3)) * 0.5
    sigmas = jnp.full((R, H), 100.0)
    ts = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32), (R, H))
    deltas = jnp.full((R, H), 0.01)
    valid_all = jnp.ones((R, H), bool)
    valid_none = jnp.zeros((R, H), bool)
    rgb1, alpha1, _, _ = row_composite(
        rgbs, sigmas, ts, deltas, valid_none, bg_color="white"
    )
    np.testing.assert_allclose(np.asarray(rgb1), 1.0)
    np.testing.assert_allclose(np.asarray(alpha1), 0.0)
    rgb2, alpha2, _, _ = row_composite(
        rgbs, sigmas, ts, deltas, valid_all, bg_color="white"
    )
    assert np.asarray(alpha2).min() > 0.5


def _dummy_field_apply(params, x, cfg):
    # smooth deterministic scalar "field": sin of a projection
    return jnp.sin(x @ params["w"])[:, None] * 0.5


def _dummy_ngp_forward(params, x, d, aabb, cfg):
    rgb = jax.nn.sigmoid(x @ params["c"])
    sigma = jax.nn.softplus((x * d).sum(-1) * 3.0 + params["b"])
    return rgb, sigma


def _finetune_inputs(R=7, H=5, seed=0, hit_p=0.6):
    rng = np.random.default_rng(seed)
    origins = rng.normal(0, 0.1, (R, 3)).astype(np.float32)
    viewdirs = rng.normal(size=(R, 3)).astype(np.float32)
    viewdirs /= np.linalg.norm(viewdirs, axis=1, keepdims=True)
    ts = np.sort(rng.uniform(0.5, 2.5, (R, H)), axis=1).astype(np.float32)
    valid = rng.random((R, H)) < hit_p
    valid = np.logical_and(
        valid, np.cumsum(~valid, axis=1) == 0
    )  # BVH contract: valid hits are a row prefix
    tri_ids = np.where(valid, rng.integers(0, 11, (R, H)), -1).astype(
        np.int32
    )
    fv = rng.normal(0, 0.3, (R, H, 3, 3)).astype(np.float32)
    bary = rng.random((R, H, 3)).astype(np.float32)
    return origins, viewdirs, ts, valid, tri_ids, fv, bary


def test_render_finetune_packed_matches_dense():
    """With a cap that truncates nothing, the packed path must match
    the dense row path (rgb/alpha/depth/reg and the per-face
    deformation accumulation) to fp32 scan tolerance."""
    from quadraturefields_tpu.render.quadrature import (
        render_finetune_packed,
        render_finetune_rows,
    )

    origins, viewdirs, ts, valid, tri_ids, fv, bary = _finetune_inputs()
    R, H = ts.shape
    field_params = {"w": jnp.asarray([1.3, -0.7, 2.1])}
    ngp_params = {
        "c": jnp.asarray(np.random.default_rng(1).normal(size=(3, 3)),
                         jnp.float32),
        "b": jnp.float32(0.2),
    }
    hits = HitRows(
        tri_ids=jnp.asarray(tri_ids), ts=jnp.asarray(ts),
        valid=jnp.asarray(valid),
    )
    kwargs = dict(
        ngp_forward_fn=_dummy_ngp_forward,
        field_apply_fn=_dummy_field_apply,
        scaling=0.0434,
        render_step_size=0.005,
        bg_color="white",
        bary_uniforms=jnp.asarray(bary),
    )
    dense = render_finetune_rows(
        ngp_params, field_params, hits, jnp.asarray(origins),
        jnp.asarray(viewdirs), jnp.asarray(fv), None, None, None,
        **kwargs,
    )
    packed = render_finetune_packed(
        ngp_params, field_params, hits, jnp.asarray(origins),
        jnp.asarray(viewdirs), jnp.asarray(fv), None, None, None,
        pack_cap=R * H, **kwargs,
    )
    for k in ("rgb", "alpha", "depth"):
        np.testing.assert_allclose(
            np.asarray(packed[k]), np.asarray(dense[k]),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )
    np.testing.assert_allclose(
        float(packed["reg"]), float(dense["reg"]), rtol=1e-5
    )
    assert int(packed["n_hits"]) == int(dense["n_hits"])

    # per-face deformation accumulation identical through either layout
    n_faces = 11
    zero_d = jnp.zeros((n_faces, 3))
    zero_w = jnp.zeros((n_faces,))
    d_dense, w_dense = mesh_accumulate_deformation(
        zero_d, zero_w, dense["dh"], dense["weights"], dense["tri_ids"],
        dense["valid"], n_faces,
    )
    d_packed, w_packed = mesh_accumulate_deformation(
        zero_d, zero_w, packed["dh"], packed["weights"],
        packed["tri_ids"], packed["valid"], n_faces,
    )
    np.testing.assert_allclose(
        np.asarray(d_packed), np.asarray(d_dense), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(w_packed), np.asarray(w_dense), rtol=1e-4, atol=1e-6
    )


def test_render_finetune_packed_gradients_match_dense():
    from quadraturefields_tpu.render.quadrature import (
        render_finetune_packed,
        render_finetune_rows,
    )

    origins, viewdirs, ts, valid, tri_ids, fv, bary = _finetune_inputs(
        seed=3
    )
    R, H = ts.shape
    hits = HitRows(
        tri_ids=jnp.asarray(tri_ids), ts=jnp.asarray(ts),
        valid=jnp.asarray(valid),
    )
    kwargs = dict(
        ngp_forward_fn=_dummy_ngp_forward,
        field_apply_fn=_dummy_field_apply,
        scaling=0.0434,
        render_step_size=0.005,
        bg_color="white",
        bary_uniforms=jnp.asarray(bary),
    )
    pixels = jnp.asarray(
        np.random.default_rng(4).random((R, 3)), jnp.float32
    )

    def loss(params, fn, extra):
        out = fn(
            params["ngp"], params["field"], hits, jnp.asarray(origins),
            jnp.asarray(viewdirs), jnp.asarray(fv), None, None, None,
            **extra, **kwargs,
        )
        return jnp.mean((out["rgb"] - pixels) ** 2) + out["reg"]

    params = {
        "ngp": {
            "c": jnp.asarray(
                np.random.default_rng(1).normal(size=(3, 3)), jnp.float32
            ),
            "b": jnp.float32(0.2),
        },
        "field": {"w": jnp.asarray([1.3, -0.7, 2.1])},
    }
    g_dense = jax.grad(loss)(params, render_finetune_rows, {})
    g_packed = jax.grad(loss)(
        params, render_finetune_packed, {"pack_cap": R * H}
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        g_packed, g_dense,
    )


def test_render_fit_sg_packed_matches_dense():
    from quadraturefields_tpu.render.quadrature import (
        render_fit_sg_packed,
        render_fit_sg_rows,
    )

    origins, viewdirs, ts, valid, tri_ids, _, _ = _finetune_inputs(seed=5)
    R, H = ts.shape
    hits = HitRows(
        tri_ids=jnp.asarray(tri_ids), ts=jnp.asarray(ts),
        valid=jnp.asarray(valid),
    )
    sg_params = {
        "c": jnp.asarray(np.random.default_rng(6).normal(size=(3, 3)),
                         jnp.float32),
        "b": jnp.float32(-0.1),
    }
    teacher = {
        "c": jnp.asarray(np.random.default_rng(7).normal(size=(3, 3)),
                         jnp.float32),
        "b": jnp.float32(0.4),
    }
    kwargs = dict(
        ngp_forward_fn=_dummy_ngp_forward,
        render_step_size=0.005,
        bg_color="random",
        render_bkgd=jnp.asarray([0.2, 0.5, 0.8]),
    )
    rgb_d, alpha_d, depth_d, _ = render_fit_sg_rows(
        sg_params, teacher, hits, jnp.asarray(origins),
        jnp.asarray(viewdirs), None, None, None, **kwargs,
    )
    rgb_p, alpha_p, depth_p, _, ph, ray_mask = render_fit_sg_packed(
        sg_params, teacher, hits, jnp.asarray(origins),
        jnp.asarray(viewdirs), None, None, None, pack_cap=R * H,
        **kwargs,
    )
    np.testing.assert_allclose(
        np.asarray(rgb_p), np.asarray(rgb_d), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(alpha_p), np.asarray(alpha_d), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(depth_p), np.asarray(depth_d), rtol=1e-4, atol=1e-5
    )
    assert int(ph.num_valid) == int(valid.sum())
    assert bool(ray_mask.all())  # nothing truncated -> no masked rays


def test_packed_ray_mask_on_truncation():
    """When the cap truncates, rays at/after the boundary must be
    excluded from the loss mask (they rendered without hits)."""
    from quadraturefields_tpu.render.quadrature import (
        pack_hit_rows,
        packed_ray_mask,
    )

    R, H = 4, 3
    valid = np.ones((R, H), bool)
    hits = HitRows(
        tri_ids=jnp.zeros((R, H), jnp.int32),
        ts=jnp.asarray(
            np.tile(np.arange(1, H + 1, dtype=np.float32), (R, 1))
        ),
        valid=jnp.asarray(valid),
    )
    cap = 7  # cap-th hit (index 6) lands in ray 2 -> rays 2,3 masked
    ph = pack_hit_rows(hits, cap)
    mask = np.asarray(packed_ray_mask(ph, R, cap))
    np.testing.assert_array_equal(mask, [True, True, False, False])

    ph_full = pack_hit_rows(hits, R * H)
    mask_full = np.asarray(packed_ray_mask(ph_full, R, R * H))
    assert mask_full.all()


def test_pack_hit_rows_truncation():
    """Overflowing cap keeps the first hits (ray-major order) and still
    reports the true demand in num_valid."""
    from quadraturefields_tpu.render.quadrature import pack_hit_rows

    R, H = 4, 3
    valid = np.ones((R, H), bool)
    ts = np.tile(np.arange(1, H + 1, dtype=np.float32), (R, 1))
    tri = np.arange(R * H, dtype=np.int32).reshape(R, H)
    hits = HitRows(
        tri_ids=jnp.asarray(tri), ts=jnp.asarray(ts),
        valid=jnp.asarray(valid),
    )
    ph = pack_hit_rows(hits, cap=7)
    assert int(ph.num_valid) == R * H
    assert int(ph.valid.sum()) == 7
    np.testing.assert_array_equal(
        np.asarray(ph.tri_ids), np.arange(7, dtype=np.int32)
    )
    np.testing.assert_array_equal(
        np.asarray(ph.ray_indices), np.asarray([0, 0, 0, 1, 1, 1, 2])
    )


def _host_pack(tri_ids, ts, cap):
    """Numpy model of qf_bvh_intersect_packed's compaction: valid hits
    ray-major, depth-sorted, slots = ray*H + k, truncated at cap."""
    R, H = tri_ids.shape
    valid = tri_ids >= 0
    flat = np.nonzero(valid.reshape(-1))[0]
    total = flat.shape[0]
    keep = flat[:cap]
    slots = np.full((cap,), R * H, np.int32)
    tri = np.full((cap,), -1, np.int32)
    t = np.zeros((cap,), np.float32)
    slots[: keep.shape[0]] = keep
    tri[: keep.shape[0]] = tri_ids.reshape(-1)[keep]
    t[: keep.shape[0]] = ts.reshape(-1)[keep]
    return slots, tri, t, total


def test_intersect_packed_matches_dense_rows():
    """The C++ packed cast must equal the numpy compaction of its own
    dense rows (incl. cap truncation)."""
    from quadraturefields_tpu.geometry.native import BVH

    rng = np.random.default_rng(0)
    # stack of 4 parallel quads so rays collect multiple hits
    verts, faces = [], []
    for k in range(4):
        z = 0.3 * k
        base = len(verts)
        verts += [[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]]
        faces += [[base, base + 1, base + 2], [base, base + 2, base + 3]]
    bvh = BVH(np.asarray(verts, np.float32), np.asarray(faces, np.int32))
    n = 64
    origins = np.concatenate(
        [rng.uniform(-0.9, 0.9, (n, 2)), np.full((n, 1), -1.0)], axis=1
    ).astype(np.float32)
    dirs = np.tile(np.asarray([[0, 0, 1.0]], np.float32), (n, 1))
    tri_d, ts_d, counts = bvh.intersect(origins, dirs, max_hits=6)
    for cap in (n * 6, 17):
        slots, tri, t, total = bvh.intersect_packed(
            origins, dirs, max_hits=6, cap=cap
        )
        es, et, ett, etotal = _host_pack(tri_d, ts_d, cap)
        assert total == etotal
        np.testing.assert_array_equal(slots, es)
        np.testing.assert_array_equal(tri, et)
        np.testing.assert_allclose(t, ett)


def test_render_finetune_stream_matches_packed():
    """The host-packed stream path (packed_hits_from_host +
    render_finetune_packed_stream w/ device face table) must match the
    dense-transport packed path bit-for-bit given the same hits and
    bary uniforms."""
    from quadraturefields_tpu.render.quadrature import (
        packed_hits_from_host,
        render_finetune_packed,
        render_finetune_packed_stream,
    )

    origins, viewdirs, ts, valid, tri_ids, _, bary = _finetune_inputs(
        seed=11
    )
    R, H = ts.shape
    n_faces = 11
    table = np.random.default_rng(12).normal(
        0, 0.3, (n_faces, 3, 3)
    ).astype(np.float32)
    fv = table[np.maximum(tri_ids, 0)]
    field_params = {"w": jnp.asarray([1.3, -0.7, 2.1])}
    ngp_params = {
        "c": jnp.asarray(np.random.default_rng(1).normal(size=(3, 3)),
                         jnp.float32),
        "b": jnp.float32(0.2),
    }
    hits = HitRows(
        tri_ids=jnp.asarray(tri_ids), ts=jnp.asarray(ts),
        valid=jnp.asarray(valid),
    )
    kwargs = dict(
        ngp_forward_fn=_dummy_ngp_forward,
        field_apply_fn=_dummy_field_apply,
        scaling=0.0434,
        render_step_size=0.005,
        bg_color="white",
        bary_uniforms=jnp.asarray(bary),
    )
    for cap in (R * H, 9):  # no-truncation AND truncating caps
        packed = render_finetune_packed(
            ngp_params, field_params, hits, jnp.asarray(origins),
            jnp.asarray(viewdirs), jnp.asarray(fv), None, None, None,
            pack_cap=cap, **kwargs,
        )
        slots, tri, t, total = _host_pack(tri_ids, ts, cap)
        ph = packed_hits_from_host(
            jnp.asarray(slots), jnp.asarray(tri), jnp.asarray(t),
            total, R, H,
        )
        stream = render_finetune_packed_stream(
            ngp_params, field_params, ph, R, H, jnp.asarray(origins),
            jnp.asarray(viewdirs), jnp.asarray(table), None, None, None,
            **kwargs,
        )
        for k in ("rgb", "alpha", "depth", "weights", "dh", "tri_ids",
                  "valid", "ray_mask"):
            np.testing.assert_allclose(
                np.asarray(stream[k]), np.asarray(packed[k]),
                rtol=1e-6, atol=1e-7, err_msg=f"{k} cap={cap}",
            )
        np.testing.assert_allclose(
            float(stream["reg"]), float(packed["reg"]), rtol=1e-6
        )
        assert int(stream["n_hits"]) == int(packed["n_hits"])


def test_render_fit_sg_stream_matches_packed():
    from quadraturefields_tpu.render.quadrature import (
        packed_hits_from_host,
        render_fit_sg_packed,
        render_fit_sg_packed_stream,
    )

    origins, viewdirs, ts, valid, tri_ids, _, _ = _finetune_inputs(
        seed=13
    )
    R, H = ts.shape
    sg_params = {
        "c": jnp.asarray(np.random.default_rng(6).normal(size=(3, 3)),
                         jnp.float32),
        "b": jnp.float32(-0.1),
    }
    teacher = {
        "c": jnp.asarray(np.random.default_rng(7).normal(size=(3, 3)),
                         jnp.float32),
        "b": jnp.float32(0.4),
    }
    hits = HitRows(
        tri_ids=jnp.asarray(tri_ids), ts=jnp.asarray(ts),
        valid=jnp.asarray(valid),
    )
    kwargs = dict(
        ngp_forward_fn=_dummy_ngp_forward,
        render_step_size=0.005,
        bg_color="random",
        render_bkgd=jnp.asarray([0.2, 0.5, 0.8]),
    )
    for cap in (R * H, 9):
        out_p = render_fit_sg_packed(
            sg_params, teacher, hits, jnp.asarray(origins),
            jnp.asarray(viewdirs), None, None, None, pack_cap=cap,
            **kwargs,
        )
        slots, tri, t, total = _host_pack(tri_ids, ts, cap)
        ph = packed_hits_from_host(
            jnp.asarray(slots), jnp.asarray(tri), jnp.asarray(t),
            total, R, H,
        )
        out_s = render_fit_sg_packed_stream(
            sg_params, teacher, ph, R, jnp.asarray(origins),
            jnp.asarray(viewdirs), None, None, None, **kwargs,
        )
        for i, name in enumerate(("rgb", "alpha", "depth", "weights")):
            np.testing.assert_allclose(
                np.asarray(out_s[i]), np.asarray(out_p[i]),
                rtol=1e-6, atol=1e-7, err_msg=f"{name} cap={cap}",
            )
        np.testing.assert_array_equal(
            np.asarray(out_s[5]), np.asarray(out_p[5])
        )


def test_snap_pack_cap_grid():
    """snap_pack_cap rounds demand UP on the √2 bucket grid (a cap
    below demand would truncate hits) and clamps to [min_cap, cap]."""
    from quadraturefields_tpu.utils.batching import (
        bucket_num_rays,
        snap_pack_cap,
    )

    assert snap_pack_cap(10, 1 << 20) == 4096          # min clamp
    assert snap_pack_cap(1 << 22, 1 << 19) == 1 << 19  # cap clamp
    for total in (5000, 262147, 300000, 1 << 18):
        b = snap_pack_cap(total, 1 << 20)
        assert b >= min(total, 1 << 20)                # never truncates
        assert b <= int(total * 1.5) or b == 4096      # bounded waste
        assert snap_pack_cap(b, 1 << 20) == b          # idempotent
        # ceiling counterpart of the ray grid's floor
        assert bucket_num_rays(b) == b
    # past the grid ceiling (1<<22) the ceiling contract still holds:
    # demand is never silently truncated to the top bucket (ADVICE r4)
    big = (1 << 22) + 12345
    b = snap_pack_cap(big, 1 << 23)
    assert b >= big and b % 256 == 0
    # the pack_cap clamp still binds
    assert snap_pack_cap(big, big) == big


def test_render_finetune_stream_sliced_to_bucket_matches():
    """Slicing the host-packed stream to a bucket >= total (the
    adaptive pack cap, Stage4Trainer.train_one_step) must not change
    the render: the dropped tail is pure padding."""
    from quadraturefields_tpu.render.quadrature import (
        packed_hits_from_host,
        render_finetune_packed_stream,
    )

    origins, viewdirs, ts, valid, tri_ids, _, bary = _finetune_inputs(
        seed=21
    )
    R, H = ts.shape
    n_faces = 11
    table = np.random.default_rng(22).normal(
        0, 0.3, (n_faces, 3, 3)
    ).astype(np.float32)
    field_params = {"w": jnp.asarray([1.3, -0.7, 2.1])}
    ngp_params = {
        "c": jnp.asarray(np.random.default_rng(1).normal(size=(3, 3)),
                         jnp.float32),
        "b": jnp.float32(0.2),
    }
    kwargs = dict(
        ngp_forward_fn=_dummy_ngp_forward,
        field_apply_fn=_dummy_field_apply,
        scaling=0.0434,
        render_step_size=0.005,
        bg_color="white",
        bary_uniforms=jnp.asarray(bary),
    )
    cap = R * H
    slots, tri, t, total = _host_pack(tri_ids, ts, cap)
    assert total < cap
    outs = []
    for B in (cap, max(total + 3, 8)):   # full cap vs tight bucket
        ph = packed_hits_from_host(
            jnp.asarray(slots[:B]), jnp.asarray(tri[:B]),
            jnp.asarray(t[:B]), total, R, H,
        )
        outs.append(render_finetune_packed_stream(
            ngp_params, field_params, ph, R, H, jnp.asarray(origins),
            jnp.asarray(viewdirs), jnp.asarray(table), None, None, None,
            **kwargs,
        ))
    full, tight = outs
    for k in ("rgb", "alpha", "depth", "ray_mask"):
        np.testing.assert_allclose(
            np.asarray(tight[k]), np.asarray(full[k]),
            rtol=1e-6, atol=1e-7, err_msg=k,
        )
    assert int(tight["n_hits"]) == int(full["n_hits"])

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

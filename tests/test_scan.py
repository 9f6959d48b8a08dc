"""Packed volume-rendering math vs. the reference's documented goldens.

Golden values come from the nerfacc docstring examples vendored in the
reference at examples/field_rendering.py:188-195, 244-253, 296-303,
343-356, 399-409, 457-471 — ready-made unit fixtures the reference never
executed.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from quadraturefields_tpu.ops import scan


RAY_IDX = jnp.array([0, 0, 0, 1, 1, 2, 2])
T_STARTS = jnp.array([0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
T_ENDS = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
SIGMAS = jnp.array([0.4, 0.8, 0.1, 0.8, 0.1, 0.0, 0.9])
ALPHAS = jnp.array([0.4, 0.8, 0.1, 0.8, 0.1, 0.0, 0.9])


def boundaries():
    return scan.mark_pack_boundaries(RAY_IDX)


def test_mark_pack_boundaries():
    np.testing.assert_array_equal(
        np.asarray(boundaries()),
        [True, False, False, True, False, True, False],
    )


def test_transmittance_from_alpha_golden():
    trans = scan.render_transmittance_from_alpha(ALPHAS, boundaries())
    np.testing.assert_allclose(
        np.asarray(trans), [1.0, 0.6, 0.12, 1.0, 0.2, 1.0, 1.0], atol=1e-6
    )


def test_weight_from_alpha_golden():
    w, trans = scan.render_weight_from_alpha(ALPHAS, boundaries())
    np.testing.assert_allclose(
        np.asarray(w), [0.4, 0.48, 0.012, 0.8, 0.02, 0.0, 0.9], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(trans), [1.0, 0.6, 0.12, 1.0, 0.2, 1.0, 1.0], atol=1e-6
    )


def test_transmittance_from_density_golden():
    trans, alphas = scan.render_transmittance_from_density(
        T_STARTS, T_ENDS, SIGMAS, boundaries()
    )
    np.testing.assert_allclose(
        np.asarray(trans), [1.00, 0.67, 0.30, 1.00, 0.45, 1.00, 1.00],
        atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(alphas), [0.33, 0.55, 0.095, 0.55, 0.095, 0.00, 0.59],
        atol=5e-3,
    )


def test_weight_from_density_golden():
    w, trans, alphas = scan.render_weight_from_density(
        T_STARTS, T_ENDS, SIGMAS, boundaries()
    )
    np.testing.assert_allclose(
        np.asarray(w), [0.33, 0.37, 0.03, 0.55, 0.04, 0.00, 0.59], atol=5e-3
    )


def test_visibility_from_density_golden():
    vis = scan.render_visibility_from_density(
        T_STARTS, T_ENDS, SIGMAS, boundaries(),
        early_stop_eps=0.3, alpha_thre=0.2,
    )
    np.testing.assert_array_equal(
        np.asarray(vis), [True, True, False, True, False, False, True]
    )


def test_exclusive_scans_vs_naive():
    rng = np.random.default_rng(0)
    x = rng.uniform(0.1, 2.0, size=64).astype(np.float32)
    seg = np.sort(rng.integers(0, 7, size=64)).astype(np.int32)
    b = np.concatenate([[True], seg[1:] != seg[:-1]])
    # naive exclusive sum / prod per segment
    exc_sum = np.zeros_like(x)
    exc_prod = np.ones_like(x)
    for i in range(1, 64):
        if not b[i]:
            exc_sum[i] = exc_sum[i - 1] + x[i - 1]
            exc_prod[i] = exc_prod[i - 1] * x[i - 1]
    np.testing.assert_allclose(
        np.asarray(scan.exclusive_sum(jnp.asarray(x), jnp.asarray(b))),
        exc_sum, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(scan.exclusive_prod(jnp.asarray(x), jnp.asarray(b))),
        exc_prod, rtol=1e-5,
    )


def test_accumulate_along_rays_with_padding():
    n_rays = 3
    w = jnp.array([0.5, 0.25, 1.0, 0.0, 0.7])
    vals = jnp.ones((5, 3))
    # last two samples are padding for sentinel ray 3
    idx = jnp.array([0, 0, 2, 3, 3])
    out = scan.accumulate_along_rays(w, idx, vals, n_rays)
    np.testing.assert_allclose(
        np.asarray(out), [[0.75] * 3, [0.0] * 3, [1.0] * 3], atol=1e-6
    )


def test_reverse_weights_matches_forward_on_reversed_rays():
    """Reversing each ray's samples and computing forward weights must
    equal reverse_weights on the original order."""
    valid = jnp.ones_like(SIGMAS, dtype=bool)
    w_rev = scan.reverse_weights(
        T_STARTS, T_ENDS, SIGMAS, RAY_IDX, 3, valid
    )
    # manual: per ray, reversed-order forward weights
    w_manual = np.zeros(7)
    idx = np.asarray(RAY_IDX)
    for r in range(3):
        sel = np.where(idx == r)[0][::-1]
        ts = np.asarray(T_ENDS)[sel]
        te = np.asarray(T_STARTS)[sel]
        sg = np.asarray(SIGMAS)[sel]
        dt = te - ts  # reversed span has t_end_orig as start
        dt = np.abs(np.asarray(T_ENDS) - np.asarray(T_STARTS))[sel]
        tau = sg * dt
        trans = np.exp(-np.concatenate([[0.0], np.cumsum(tau)[:-1]]))
        w_manual[sel] = trans * (1 - np.exp(-tau))
    np.testing.assert_allclose(np.asarray(w_rev), w_manual, rtol=1e-5)


@pytest.mark.parametrize("bg", ["white", "black", "random"])
def test_derive_properties_single_opaque_sample(bg):
    """One fully opaque sample per ray must return that sample's color."""
    n_rays = 2
    rgbs = jnp.array([[0.2, 0.4, 0.6], [0.9, 0.1, 0.3]])
    sigmas = jnp.array([1e6, 1e6])
    depths = jnp.array([2.0, 3.0])
    deltas = jnp.array([1.0, 1.0])
    idx = jnp.array([0, 1])
    bkgd = jnp.array([0.5, 0.5, 0.5])
    rgb, alpha, depth, w = scan.derive_properties(
        rgbs, sigmas, depths, deltas, idx, n_rays, bg_color=bg,
        render_bkgd=bkgd,
    )
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgbs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), 1.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(depth)[:, 0], [2.0, 3.0], atol=1e-5
    )


def test_derive_properties_empty_ray_background():
    n_rays = 2
    rgbs = jnp.array([[0.2, 0.4, 0.6]])
    sigmas = jnp.array([0.0])
    depths = jnp.array([2.0])
    deltas = jnp.array([1.0])
    idx = jnp.array([0])
    rgb, alpha, _, _ = scan.derive_properties(
        rgbs, sigmas, depths, deltas, idx, n_rays, bg_color="white"
    )
    np.testing.assert_allclose(np.asarray(rgb[1]), [1.0, 1.0, 1.0])
    np.testing.assert_allclose(np.asarray(alpha[0]), 0.0, atol=1e-6)

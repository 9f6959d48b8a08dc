import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadraturefields_tpu.ops.grid import (
    OccGridConfig,
    occ_grid_init,
    occ_grid_sampling,
    occ_grid_update,
    occupancy_lookup,
    ray_aabb_intersect,
    max_march_steps,
)


AABB = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])


def test_ray_aabb_intersect_through_center():
    o = jnp.array([[-2.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    t_min, t_max, hit = ray_aabb_intersect(o, d, AABB)
    assert bool(hit[0])
    np.testing.assert_allclose(np.asarray(t_min), [1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_max), [3.0], atol=1e-6)


def test_ray_aabb_intersect_miss():
    o = jnp.array([[-2.0, 5.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    _, _, hit = ray_aabb_intersect(o, d, AABB)
    assert not bool(hit[0])


def test_ray_aabb_origin_inside():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t_min, t_max, hit = ray_aabb_intersect(o, d, AABB)
    assert bool(hit[0])
    np.testing.assert_allclose(np.asarray(t_min), [0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_max), [1.0], atol=1e-6)


def test_occupancy_lookup_bounds():
    cfg = OccGridConfig(resolution=8)
    state = occ_grid_init(AABB, cfg)
    x = jnp.array([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    occ = occupancy_lookup(state.binaries, state.aabb, x)
    np.testing.assert_array_equal(np.asarray(occ), [True, False])


def test_update_prunes_empty_space():
    """Density concentrated in one octant -> binaries empty elsewhere
    after warmup-style updates."""
    cfg = OccGridConfig(resolution=16, warmup_steps=10**9)
    state = occ_grid_init(AABB, cfg)

    def occ_eval_fn(x):
        inside = jnp.all((x > 0.0) & (x < 1.0), axis=-1)
        return jnp.where(inside, 1.0, 0.0)

    key = jax.random.PRNGKey(0)
    for step in range(3):
        key, sub = jax.random.split(key)
        state = occ_grid_update(state, step * 16, sub, occ_eval_fn, cfg)

    b = np.asarray(state.binaries)
    # positive octant occupied
    assert b[12, 12, 12]
    # negative octant empty
    assert not b[2, 2, 2]


def test_update_partition_rotation_covers_grid():
    cfg = OccGridConfig(resolution=8, warmup_steps=0)
    state = occ_grid_init(AABB, cfg)
    state = state._replace(binaries=jnp.zeros_like(state.binaries))

    def occ_eval_fn(x):
        return jnp.ones(x.shape[0])

    key = jax.random.PRNGKey(0)
    for u in range(4):
        state = occ_grid_update(
            state, 256 + u * 16, key, occ_eval_fn, cfg
        )
    assert np.asarray(state.binaries).all()


def test_sampling_packed_contract():
    cfg = OccGridConfig(resolution=16)
    state = occ_grid_init(AABB, cfg)
    n_rays = 4
    o = jnp.tile(jnp.array([[-2.0, 0.05, 0.05]]), (n_rays, 1))
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (n_rays, 1))
    step = 0.1
    max_steps = max_march_steps(np.asarray(AABB), step)
    S = 256
    ps = occ_grid_sampling(
        state, o, d, render_step_size=step, max_steps=max_steps,
        max_samples_total=S,
    )
    idx = np.asarray(ps.ray_indices)
    valid = np.asarray(ps.valid)
    ts = np.asarray(ps.t_starts)
    te = np.asarray(ps.t_ends)
    # sorted ray ids, padding at the end with sentinel
    assert (np.diff(idx) >= 0).all()
    assert (idx[~valid] == n_rays).all()
    nv = int(ps.num_valid)
    assert valid.sum() == nv
    # each ray crosses ~2 units -> ~20 samples
    per_ray = np.bincount(idx[valid], minlength=n_rays)
    assert ((per_ray >= 18) & (per_ray <= 22)).all()
    # interval widths equal the step, t within the aabb span
    np.testing.assert_allclose(te[valid] - ts[valid], step, atol=1e-5)
    assert (ts[valid] >= 1.0 - 1e-5).all() and (te[valid] <= 3.0 + step).all()


def test_sampling_respects_occupancy():
    cfg = OccGridConfig(resolution=2)
    state = occ_grid_init(AABB, cfg)
    # only the x>0 half occupied
    b = np.zeros((2, 2, 2), bool)
    b[1, :, :] = True
    state = state._replace(binaries=jnp.asarray(b))
    o = jnp.array([[-2.0, 0.1, 0.1]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    ps = occ_grid_sampling(
        state, o, d, render_step_size=0.05,
        max_steps=max_march_steps(np.asarray(AABB), 0.05),
        max_samples_total=128,
    )
    valid = np.asarray(ps.valid)
    mids = (np.asarray(ps.t_starts) + np.asarray(ps.t_ends))[valid] / 2
    # hit points x = -2 + t must all be > 0
    assert ((mids - 2.0) > -1e-6).all()


def test_sampling_truncation_counts():
    cfg = OccGridConfig(resolution=4)
    state = occ_grid_init(AABB, cfg)
    o = jnp.array([[-2.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    ps = occ_grid_sampling(
        state, o, d, render_step_size=0.01,
        max_steps=max_march_steps(np.asarray(AABB), 0.01),
        max_samples_total=16,
    )
    assert int(ps.num_valid) > 16  # true demand
    assert np.asarray(ps.valid).sum() == 16  # truncated to budget


@pytest.mark.parametrize("stride", [0, 8, 16])
def test_two_level_march_matches_single_level(stride):
    """The coarse/fine march must produce the identical packed sample
    set as the single-level march (the dilated coarse mask is a strict
    superset), at the default probe stride (= coarse_factor) and at
    decoupled strides several probe steps wide. Resolution 128 so the
    rc >= 32 gate actually engages the two-level path."""
    cfg = OccGridConfig(resolution=128)
    state = occ_grid_init(AABB, cfg)
    rng = np.random.default_rng(0)
    b = rng.random((128, 128, 128)) < 0.01
    state = state._replace(binaries=jnp.asarray(b))

    n_rays = 16
    o = np.tile([[0.0, 0.0, -2.5]], (n_rays, 1)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)) * 0.25 + [0, 0, 1]
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    kwargs = dict(
        render_step_size=0.02,
        max_steps=max_march_steps(np.asarray(AABB), 0.02),
        max_samples_total=4096,
    )
    a = occ_grid_sampling(state, jnp.asarray(o), jnp.asarray(d), **kwargs)
    c = occ_grid_sampling(
        state, jnp.asarray(o), jnp.asarray(d), coarse_factor=4,
        max_coarse_hits=4096, coarse_stride=stride, **kwargs,
    )
    assert int(a.num_valid) == int(c.num_valid)
    va, vc = np.asarray(a.valid), np.asarray(c.valid)
    assert va.sum() == vc.sum() > 0
    np.testing.assert_array_equal(
        np.asarray(a.ray_indices)[va], np.asarray(c.ray_indices)[vc]
    )
    np.testing.assert_allclose(
        np.asarray(a.t_starts)[va], np.asarray(c.t_starts)[vc], atol=1e-6
    )


def test_sampling_stratified_jitter():
    cfg = OccGridConfig(resolution=4)
    state = occ_grid_init(AABB, cfg)
    o = jnp.array([[-2.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    kwargs = dict(
        render_step_size=0.1,
        max_steps=max_march_steps(np.asarray(AABB), 0.1),
        max_samples_total=64,
    )
    a = occ_grid_sampling(
        state, o, d, stratified=True, key=jax.random.PRNGKey(0), **kwargs
    )
    b = occ_grid_sampling(
        state, o, d, stratified=True, key=jax.random.PRNGKey(1), **kwargs
    )
    assert not np.allclose(
        np.asarray(a.t_starts[a.valid])[:5], np.asarray(b.t_starts[b.valid])[:5]
    )

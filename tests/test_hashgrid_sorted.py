"""Sorted windowed-accumulate table gradient (ops/hashgrid_sorted.py).

Runs the Pallas kernel in interpret mode on CPU; parity is against a
plain numpy segment-sum and against the exact-scatter grad mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadraturefields_tpu.ops.hashgrid import (
    HashGridConfig,
    hashgrid_encode,
    hashgrid_init,
)
from quadraturefields_tpu.ops.hashgrid_sorted import (
    TILE,
    W,
    sorted_table_grad,
)


def _numpy_ref(idx, v0, v1, total_entries):
    out = np.zeros((total_entries, 2), np.float32)
    np.add.at(out[:, 0], idx, v0)
    np.add.at(out[:, 1], idx, v1)
    return out


@pytest.mark.parametrize(
    "m,total_entries",
    [
        (TILE, 64 * W * 2),          # exactly one tile, 2 windows
        (TILE * 3 + 517, 64 * W * 5),  # padding path, 5 windows
        (1000, 64 * 8),              # tiny table, tiny stream
    ],
)
def test_matches_numpy_segment_sum(m, total_entries):
    rng = np.random.default_rng(m)
    idx = rng.integers(0, total_entries, m).astype(np.int32)
    v0 = rng.normal(size=m).astype(np.float32)
    v1 = rng.normal(size=m).astype(np.float32)
    out = np.asarray(
        sorted_table_grad(
            jnp.asarray(idx), jnp.asarray(v0), jnp.asarray(v1),
            total_entries,
        )
    )
    ref = _numpy_ref(idx, v0, v1, total_entries)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_window_spanning_and_empty_blocks():
    """A stream concentrated in two far-apart windows: the windows
    between them are never touched and must come out zero."""
    total_entries = 64 * W * 8  # 8 windows
    rng = np.random.default_rng(0)
    lo = rng.integers(0, 64 * W // 2, TILE).astype(np.int32)
    hi = rng.integers(64 * W * 7, 64 * W * 8, TILE).astype(np.int32)
    idx = np.concatenate([lo, hi])
    v0 = rng.normal(size=idx.shape[0]).astype(np.float32)
    v1 = rng.normal(size=idx.shape[0]).astype(np.float32)
    out = np.asarray(
        sorted_table_grad(
            jnp.asarray(idx), jnp.asarray(v0), jnp.asarray(v1),
            total_entries,
        )
    )
    ref = _numpy_ref(idx, v0, v1, total_entries)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    mid = out[64 * W : 64 * W * 7]
    assert np.all(mid == 0.0)


def test_duplicate_heavy_stream():
    """Many contributions to few entries (the dense-level regime)."""
    total_entries = 64 * W
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 37, TILE * 2).astype(np.int32)
    v0 = rng.normal(size=idx.shape[0]).astype(np.float32)
    v1 = rng.normal(size=idx.shape[0]).astype(np.float32)
    out = np.asarray(
        sorted_table_grad(
            jnp.asarray(idx), jnp.asarray(v0), jnp.asarray(v1),
            total_entries,
        )
    )
    ref = _numpy_ref(idx, v0, v1, total_entries)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("interp", ["cube", "tet"])
def test_encode_grad_mode_sorted_matches_exact(interp):
    cfg_s = HashGridConfig(
        n_levels=4,
        log2_hashmap_size=12,
        base_resolution=4,
        per_level_scale=2.0,
        interp=interp,
        grad_mode="sorted",
    )
    cfg_e = HashGridConfig(
        n_levels=4,
        log2_hashmap_size=12,
        base_resolution=4,
        per_level_scale=2.0,
        interp=interp,
        grad_mode="exact",
    )
    key = jax.random.PRNGKey(0)
    table = hashgrid_init(key, cfg_s)
    x = jax.random.uniform(jax.random.PRNGKey(1), (513, 3))

    def loss(t, cfg):
        out = hashgrid_encode(t, x, cfg)
        return jnp.sum(out * jnp.cos(out))

    g_sorted = jax.grad(lambda t: loss(t, cfg_s))(table)
    g_exact = jax.grad(lambda t: loss(t, cfg_e))(table)
    np.testing.assert_allclose(
        np.asarray(g_sorted), np.asarray(g_exact), rtol=2e-5, atol=2e-6
    )


def test_encode_grad_mode_auto_resolves_to_sorted():
    cfg = HashGridConfig(
        n_levels=2, log2_hashmap_size=10, base_resolution=4,
        grad_mode="auto",
    )
    key = jax.random.PRNGKey(0)
    table = hashgrid_init(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))

    # auto must produce the same values as explicit sorted (F == 2)
    def g(mode):
        import dataclasses

        c = dataclasses.replace(cfg, grad_mode=mode)
        return jax.grad(
            lambda t: jnp.sum(hashgrid_encode(t, x, c) ** 2)
        )(table)

    np.testing.assert_allclose(
        np.asarray(g("auto")), np.asarray(g("sorted")), rtol=1e-6
    )

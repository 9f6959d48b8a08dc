"""Pallas bit-table occupancy lookup (ops/occ_bits.py).

Covers the packed-bitfield encoding, the XLA fallback, the Pallas
kernel in interpret mode (both the unrolled rows<=8 branch and the
fori-loop branch), and the two-level march at a coarse resolution
where the bit path is actually engaged (128^3 fine / cf=4 -> 32^3
coarse, the production shape).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quadraturefields_tpu.ops.grid import (
    OccGridConfig,
    max_march_steps,
    occ_grid_init,
    occ_grid_sampling,
    occupancy_lookup,
)
from quadraturefields_tpu.ops.occ_bits import (
    _bit_lookup,
    bits_lookup_applicable,
    occupancy_lookup_bits,
    pack_occupancy_bits,
)

AABB = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])


def test_pack_bits_roundtrip():
    rng = np.random.default_rng(0)
    b = rng.random((16, 16, 16)) < 0.3
    table = np.asarray(pack_occupancy_bits(jnp.asarray(b)))
    flat = b.reshape(-1)
    words = table.reshape(-1).astype(np.uint32)
    got = (words[np.arange(flat.size) >> 5]
           >> (np.arange(flat.size) & 31)) & 1
    np.testing.assert_array_equal(got.astype(bool), flat)


@pytest.mark.parametrize("res", [16, 32])
def test_lookup_bits_matches_dense(res):
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.random((res, res, res)) < 0.2)
    # include out-of-box points: the inside mask must zero them
    x = jnp.asarray(rng.uniform(-1.4, 1.4, size=(5000, 3)).astype(np.float32))
    ref = occupancy_lookup(b, AABB, x)
    got = occupancy_lookup_bits(b, AABB, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("rows", [8, 16])
def test_pallas_kernel_interpret_matches_fallback(rows):
    """The kernel itself (interpret mode on CPU) vs the word-gather
    fallback, exercising both the unrolled and the fori-loop branch."""
    rng = np.random.default_rng(2)
    n_bits = rows * 128 * 32
    bits = rng.random(n_bits) < 0.5
    words = bits.reshape(-1, 32).astype(np.uint32)
    packed = (words * (np.uint32(1) << np.arange(32, dtype=np.uint32))
              ).sum(axis=1, dtype=np.uint32)
    table = jnp.asarray(packed.astype(np.int32).reshape(rows, 128))
    idx = jnp.asarray(
        rng.integers(0, n_bits, size=3333).astype(np.int32)
    )
    got = _bit_lookup(table, idx, 64, True)  # interpret=True
    ref = bits[np.asarray(idx)]
    np.testing.assert_array_equal(np.asarray(got) > 0, ref)


def test_applicability_gate(monkeypatch):
    assert bits_lookup_applicable(32)
    assert bits_lookup_applicable(64)
    assert not bits_lookup_applicable(8)      # 8^3 < 4096
    assert not bits_lookup_applicable(20)     # res % 16 != 0
    assert not bits_lookup_applicable(256)    # rows above the gate
    monkeypatch.setenv("QF_OCC_BITS", "0")
    assert not bits_lookup_applicable(32)


def test_two_level_march_with_bits_matches_single_level():
    """At the production shape (128^3 fine, cf=4 -> 32^3 coarse) the
    coarse lookup goes through the bit path; the packed sample set
    must stay identical to the single-level march."""
    cfg = OccGridConfig(resolution=128)
    state = occ_grid_init(AABB, cfg)
    rng = np.random.default_rng(3)
    b = rng.random((128, 128, 128)) < 0.02
    state = state._replace(binaries=jnp.asarray(b))

    n_rays = 8
    o = np.tile([[0.0, 0.0, -2.5]], (n_rays, 1)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)) * 0.25 + [0, 0, 1]
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    kwargs = dict(
        render_step_size=0.02,
        max_steps=max_march_steps(np.asarray(AABB), 0.02),
        max_samples_total=2048,
    )
    a = occ_grid_sampling(state, jnp.asarray(o), jnp.asarray(d), **kwargs)
    c = occ_grid_sampling(
        state, jnp.asarray(o), jnp.asarray(d), coarse_factor=4,
        max_coarse_hits=4096, **kwargs,
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

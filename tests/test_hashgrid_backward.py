"""Sorted tile-accumulate table-gradient kernel vs a numpy scatter
reference (Pallas interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from quadraturefields_tpu.ops.hashgrid_backward import (
    LANES,
    sorted_table_grad,
)


def reference_grad(rows, lane0, v0, v1, total_values):
    out = np.zeros(
        (-(-total_values // LANES) * LANES,), np.float32
    )
    flat0 = rows * LANES + lane0
    np.add.at(out, flat0, v0)
    np.add.at(out, flat0 + 1, v1)
    return out[:total_values]


def run_case(m, total_values, seed, clustered=False):
    rng = np.random.default_rng(seed)
    n_rows = total_values // LANES
    if clustered:
        rows = rng.integers(0, max(n_rows // 64, 1), m)
    else:
        rows = rng.integers(0, n_rows, m)
    rows = rows.astype(np.int32)
    lane0 = (rng.integers(0, 64, m) * 2).astype(np.int32)
    v0 = rng.normal(size=m).astype(np.float32)
    v1 = rng.normal(size=m).astype(np.float32)

    got = np.asarray(
        sorted_table_grad(
            jnp.asarray(rows), jnp.asarray(lane0),
            jnp.asarray(v0), jnp.asarray(v1),
            total_values, interpret=True,
        )
    )
    want = reference_grad(rows, lane0, v0, v1, total_values)
    # bf16 one-hot matmul accumulation: tolerance scales with the
    # number of collisions per bucket
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_uniform_small():
    run_case(m=4096, total_values=LANES * 2048, seed=0)


def test_clustered_rows():
    """Heavy collisions (coarse dense levels)."""
    run_case(m=4096, total_values=LANES * 2048, seed=1, clustered=True)


def test_sparse_rows_with_jumps():
    """Rows spread over a huge space -> big window jumps."""
    run_case(m=1024, total_values=LANES * 65536, seed=2)


def test_unpadded_tail():
    run_case(m=1000, total_values=LANES * 512 + 64, seed=3)

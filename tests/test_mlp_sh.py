import jax
import jax.numpy as jnp
import numpy as np

from quadraturefields_tpu.ops.mlp import mlp_init, mlp_apply
from quadraturefields_tpu.ops.sh import spherical_harmonics_deg4


def test_mlp_shapes():
    key = jax.random.PRNGKey(0)
    params = mlp_init(key, 32, 16, hidden_dim=64, num_hidden_layers=1,
                      bias=False)
    x = jax.random.normal(key, (128, 32))
    out = mlp_apply(params, x, compute_dtype=jnp.float32)
    assert out.shape == (128, 16)


def test_mlp_skip_connection():
    key = jax.random.PRNGKey(1)
    params = mlp_init(key, 8, 4, hidden_dim=16, num_hidden_layers=3,
                      bias=True, skip=(2,))
    x = jax.random.normal(key, (5, 8))
    out = mlp_apply(params, x, skip=(2,), compute_dtype=jnp.float32)
    assert out.shape == (5, 4)


def test_mlp_bias_free_zero_input():
    key = jax.random.PRNGKey(2)
    params = mlp_init(key, 8, 4, bias=False)
    out = mlp_apply(params, jnp.zeros((3, 8)), compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def test_sh_dc_and_norm():
    # z-axis direction mapped to [0,1]
    d = jnp.array([[0.0, 0.0, 1.0]])
    enc = spherical_harmonics_deg4((d + 1.0) / 2.0)
    assert enc.shape == (1, 16)
    assert np.isclose(np.asarray(enc)[0, 0], 0.28209479, rtol=1e-5)
    # band-1 z coefficient = 0.4886 * z
    assert np.isclose(np.asarray(enc)[0, 2], 0.48860252, rtol=1e-5)


def test_sh_orthogonality_montecarlo():
    """SH basis functions are orthonormal under the uniform sphere
    measure: (4pi/N) * B^T B ~= I."""
    rng = np.random.default_rng(0)
    v = rng.normal(size=(200000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    enc = np.asarray(spherical_harmonics_deg4(jnp.asarray((v + 1) / 2)))
    gram = enc.T @ enc * (4 * np.pi / len(v))
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)

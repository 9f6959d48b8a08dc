import jax
import jax.numpy as jnp
import numpy as np

from quadraturefields_tpu.ops import activations as act


def test_trunc_exp_forward():
    x = jnp.array([-1.0, 0.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(act.trunc_exp(x)), np.exp([-1.0, 0.0, 2.0]), rtol=1e-5
    )


def test_trunc_exp_grad_clamped():
    g = jax.grad(lambda x: act.trunc_exp(x))(20.0)
    assert np.isclose(g, np.exp(15.0), rtol=1e-5)
    g2 = jax.grad(lambda x: act.trunc_exp(x))(2.0)
    assert np.isclose(g2, np.exp(2.0), rtol=1e-5)


def test_contract_identity_inside_unit_ball():
    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    x = jnp.array([[0.1, -0.2, 0.3]])
    y = act.contract_to_unisphere(x, aabb)
    # inside: y = x/4 + 0.5
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x) / 4 + 0.5, atol=1e-6
    )


def test_contract_inverse_roundtrip():
    aabb = jnp.array([-2.0, -2.0, -2.0, 2.0, 2.0, 2.0])
    x = jnp.array([[0.5, -1.0, 1.5], [3.0, 0.0, -4.0], [0.0, 0.1, 0.0]])
    y = act.contract_to_unisphere(x, aabb)
    x_rec, invalid = act.inverse_contraction(y, aabb)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
    assert not np.any(np.asarray(invalid))


def test_contract_bounded_output():
    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    x = jnp.array([[100.0, -100.0, 50.0]])
    y = act.contract_to_unisphere(x, aabb)
    assert np.all(np.asarray(y) >= 0.0) and np.all(np.asarray(y) <= 1.0)


def test_normalize_aabb_selector():
    aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    x = jnp.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    sel, y = act.normalize_aabb(x, aabb)
    np.testing.assert_array_equal(np.asarray(sel), [True, False])
    np.testing.assert_allclose(np.asarray(y[0]), [0.5, 0.5, 0.5])

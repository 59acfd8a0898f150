import jax.numpy as jnp
import numpy as np

from openvslam_tpu.ops import sim3
import pytest

pytestmark = pytest.mark.smoke


def test_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.standard_normal((64, 7)), jnp.float32)
    g = sim3.exp(xi)
    xi2 = sim3.log(g)
    g2 = sim3.exp(xi2)
    for a, b in zip(g, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_exp_small_values():
    xi = jnp.zeros((3, 7), jnp.float32)
    xi = xi.at[1].set(jnp.asarray([1e-6, 0, 0, 1.0, 2.0, 3.0, 1e-7]))
    xi = xi.at[2].set(jnp.asarray([0, 0, 0, 1.0, 0, 0, 0.5]))
    R, t, s = sim3.exp(xi)
    assert np.all(np.isfinite(np.asarray(R)))
    np.testing.assert_allclose(np.asarray(s), [1.0, 1.0, np.exp(0.5)], rtol=1e-5)
    # sigma=0.5, omega=0: t = (e^0.5 - 1)/0.5 * u
    np.testing.assert_allclose(np.asarray(t[2, 0]), (np.exp(0.5) - 1) / 0.5, rtol=1e-5)


def test_compose_inverse(rng):
    xi = jnp.asarray(rng.standard_normal((8, 7)), jnp.float32)
    g = sim3.exp(xi)
    R, t, s = sim3.compose(g, sim3.inverse(g))
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), R.shape), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s), 1, atol=1e-5)


def test_transform_matches_compose(rng):
    xia = jnp.asarray(rng.standard_normal(7), jnp.float32)
    xib = jnp.asarray(rng.standard_normal(7), jnp.float32)
    ga, gb = sim3.exp(xia), sim3.exp(xib)
    pts = jnp.asarray(rng.standard_normal((16, 3)), jnp.float32)
    via_compose = sim3.transform(sim3.compose(ga, gb), pts)
    sequential = sim3.transform(ga, sim3.transform(gb, pts))
    np.testing.assert_allclose(np.asarray(via_compose), np.asarray(sequential), atol=1e-4)

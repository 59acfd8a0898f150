import jax
import jax.numpy as jnp
import numpy as np

from openvslam_tpu.ops import se3
import pytest

pytestmark = pytest.mark.smoke


def test_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.standard_normal((64, 6)) * 1.5, jnp.float32)
    T = se3.se3_exp(xi)
    xi2 = se3.se3_log(T)
    T2 = se3.se3_exp(xi2)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T2), atol=2e-5)


def test_so3_log_near_pi(rng):
    axis = rng.standard_normal((16, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    w = jnp.asarray(axis * (np.pi - 1e-4), jnp.float32)
    R = se3.so3_exp(w)
    w2 = se3.so3_log(R)
    R2 = se3.so3_exp(w2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)


def test_compose_inverse(rng):
    xi = jnp.asarray(rng.standard_normal((8, 6)), jnp.float32)
    T = se3.se3_exp(xi)
    I = se3.compose(T, se3.inverse(T))
    np.testing.assert_allclose(np.asarray(I), np.broadcast_to(np.eye(4), I.shape), atol=1e-5)


def test_transform_points(rng):
    xi = jnp.asarray(rng.standard_normal(6), jnp.float32)
    T = se3.se3_exp(xi)
    pts = jnp.asarray(rng.standard_normal((32, 3)), jnp.float32)
    out = se3.transform(T, pts)
    ref = (np.asarray(T[:3, :3]) @ np.asarray(pts).T).T + np.asarray(T[:3, 3])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_quat_roundtrip(rng):
    xi = jnp.asarray(rng.standard_normal((32, 3)) * 2.0, jnp.float32)
    R = se3.so3_exp(xi)
    q = se3.to_quat(R)
    R2 = se3.from_quat(q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_jit_and_grad():
    f = jax.jit(lambda x: jnp.sum(se3.se3_exp(x)))
    g = jax.grad(f)(jnp.ones(6))
    assert np.all(np.isfinite(np.asarray(g)))

import jax.numpy as jnp
import numpy as np
import pytest

from openvslam_tpu.camera import Perspective, Fisheye, Equirectangular

pytestmark = pytest.mark.smoke


@pytest.fixture
def persp():
    return Perspective.create(
        fx=520.9, fy=521.0, cx=325.1, cy=249.7,
        k1=0.2312, k2=-0.7849, p1=-0.0033, p2=-0.0001, k3=0.9172,
        cols=640, rows=480,
    )


@pytest.fixture
def fisheye():
    return Fisheye.create(
        fx=350.0, fy=350.0, cx=320.0, cy=240.0,
        k1=-0.04, k2=0.01, k3=-0.005, k4=0.001, cols=640, rows=480,
    )


def test_perspective_project_unproject(persp, rng):
    pts = np.stack(
        [
            (rng.random(256) - 0.5) * 4,
            (rng.random(256) - 0.5) * 3,
            rng.random(256) * 5 + 2,
        ],
        -1,
    )
    uv, depth, valid = persp.project(jnp.asarray(pts, jnp.float32))
    brg = persp.undistorted_to_bearings(uv)
    ref = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    v = np.asarray(valid)
    assert v.sum() > 50
    np.testing.assert_allclose(np.asarray(brg)[v], ref[v], atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth), pts[:, 2], rtol=1e-5)


def test_perspective_undistort_roundtrip(persp, rng):
    # distort normalized points, undistort back
    xy = jnp.asarray((rng.random((128, 2)) - 0.5) * 0.8, jnp.float32)
    xyd = persp._distort_normalized(xy)
    xy2 = persp._undistort_normalized(xyd)
    np.testing.assert_allclose(np.asarray(xy2), np.asarray(xy), atol=1e-4)


def test_perspective_bearings_from_raw(persp, rng):
    pts = np.stack(
        [(rng.random(64) - 0.5) * 2, (rng.random(64) - 0.5) * 1.5, rng.random(64) * 4 + 2], -1
    ).astype(np.float32)
    # raw (distorted) projection: distort normalized then apply K
    xy = pts[:, :2] / pts[:, 2:]
    xyd = np.asarray(persp._distort_normalized(jnp.asarray(xy)))
    u = xyd[:, 0] * float(persp.fx) + float(persp.cx)
    v = xyd[:, 1] * float(persp.fy) + float(persp.cy)
    raw = jnp.asarray(np.stack([u, v], -1), jnp.float32)
    brg = persp.keypoints_to_bearings(raw)
    ref = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(brg), ref, atol=1e-4)


def test_fisheye_roundtrip(fisheye, rng):
    pts = np.stack(
        [(rng.random(256) - 0.5) * 4, (rng.random(256) - 0.5) * 3, rng.random(256) * 5 + 1.5], -1
    ).astype(np.float32)
    uv, depth, valid = fisheye.project_fisheye(jnp.asarray(pts))
    brg = fisheye.keypoints_to_bearings(uv)
    ref = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    v = np.asarray(valid)
    assert v.sum() > 50
    np.testing.assert_allclose(np.asarray(brg)[v], ref[v], atol=1e-3)


def test_equirectangular_roundtrip(rng):
    cam = Equirectangular.create(cols=1920, rows=960)
    brg = rng.standard_normal((512, 3))
    brg /= np.linalg.norm(brg, axis=-1, keepdims=True)
    uv = cam.bearings_to_keypoints(jnp.asarray(brg, jnp.float32))
    brg2 = cam.keypoints_to_bearings(uv)
    np.testing.assert_allclose(np.asarray(brg2), brg, atol=1e-4)
    # full sphere: every direction projects validly
    uvp, depth, valid = cam.project(jnp.asarray(brg * 3.0, jnp.float32))
    assert np.asarray(valid).sum() > 500
    np.testing.assert_allclose(np.asarray(depth), 3.0, rtol=1e-5)

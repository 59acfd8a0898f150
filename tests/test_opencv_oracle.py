"""OpenCV-oracle golden tests (SURVEY.md §4 'add what the reference lacks'):
our FAST/ORB frontend vs cv2.ORB on the same synthetic images.

The rBRIEF pattern is learned (ours != OpenCV's bit_pattern_31) so raw
descriptors are not comparable bit-for-bit; what must agree:
  * keypoint geometry: most cv2 corners have one of ours nearby
  * IC orientation: co-located keypoints report similar angles
  * matching power: two-view descriptor matching finds a comparable number
    of geometrically-consistent correspondences
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from openvslam_tpu.camera import Perspective
from openvslam_tpu.models.frontend import OrbFrontend
from openvslam_tpu.utils import synthetic


@pytest.fixture(scope="module")
def scene_pair():
    rows, cols = 320, 416
    cam = Perspective.create(fx=350.0, fy=350.0, cx=cols / 2, cy=rows / 2,
                             cols=cols, rows=rows)
    rng = np.random.default_rng(9)
    scene = synthetic.PatchSceneRenderer(
        rng, n_points=700, center=(0, 0, 6), extent=(6, 4.5, 2.5),
        rows=rows, cols=cols,
    )
    T0 = synthetic.lookat_pose_cw((0, 0, 0), (0, 0, 6))
    T1 = synthetic.lookat_pose_cw((0.25, 0.1, 0), (0, 0, 6))
    img0 = scene.render(cam, T0)
    img1 = scene.render(cam, T1)
    fe = OrbFrontend(rows, cols, max_keypts=600, num_levels=4)
    return img0, img1, fe


def _ours(fe, img):
    kp = fe.extract(jnp.asarray(img))
    v = np.asarray(kp.valid)
    return (np.asarray(kp.xy)[v], np.asarray(kp.angle)[v],
            np.asarray(kp.desc_u32)[v])


def test_keypoint_recall_vs_opencv(scene_pair):
    img0, _, fe = scene_pair
    xy, _, _ = _ours(fe, img0)
    orb = cv2.ORB_create(nfeatures=600, nlevels=4, scaleFactor=1.2,
                         fastThreshold=20)
    cv_kps = orb.detect(img0, None)
    assert len(cv_kps) > 100
    cv_xy = np.array([k.pt for k in cv_kps], np.float32)
    d = np.linalg.norm(cv_xy[:, None, :] - xy[None, :, :], axis=-1).min(1)
    recall = (d < 3.0).mean()
    assert recall > 0.6, f"only {recall:.0%} of cv2 corners have a near twin"


def test_orientation_agreement(scene_pair):
    img0, _, fe = scene_pair
    xy, ang, _ = _ours(fe, img0)
    orb = cv2.ORB_create(nfeatures=600, nlevels=4, scaleFactor=1.2,
                         fastThreshold=20)
    cv_kps = orb.detect(img0, None)
    cv_kps = orb.compute(img0, cv_kps)[0]
    cv_xy = np.array([k.pt for k in cv_kps], np.float32)
    cv_ang = np.deg2rad(np.array([k.angle for k in cv_kps], np.float32))
    # co-located level-0 pairs only
    dmat = np.linalg.norm(cv_xy[:, None, :] - xy[None, :, :], axis=-1)
    j = dmat.argmin(1)
    close = dmat.min(1) < 1.5
    if close.sum() < 30:
        pytest.skip("too few co-located pairs")
    da = np.abs(np.angle(np.exp(1j * (cv_ang[close] - ang[j[close]]))))
    assert np.median(da) < np.deg2rad(25), np.rad2deg(np.median(da))


def test_matching_power_vs_opencv(scene_pair):
    img0, img1, fe = scene_pair
    from openvslam_tpu.ops import match as M

    kp0 = fe.extract(jnp.asarray(img0))
    kp1 = fe.extract(jnp.asarray(img1))
    idx, dist = M.match_descriptors(
        kp0.desc_i8, kp1.desc_i8, kp0.valid, kp1.valid,
        max_dist=M.HAMMING_DIST_THR_LOW, ratio=0.9, cross_check=True,
    )
    ours_n = int((np.asarray(idx) >= 0).sum())

    orb = cv2.ORB_create(nfeatures=600, nlevels=4, scaleFactor=1.2,
                         fastThreshold=20)
    k0, d0 = orb.detectAndCompute(img0, None)
    k1, d1 = orb.detectAndCompute(img1, None)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    cv_matches = [m for m in bf.match(d0, d1) if m.distance <= 50]
    cv_n = len(cv_matches)
    assert cv_n > 50
    assert ours_n > 0.6 * cv_n, f"ours {ours_n} vs cv2 {cv_n}"

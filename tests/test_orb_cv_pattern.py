"""The "cv" rBRIEF pattern: descriptor-level interop with the reference.

The reference describes keypoints with ORB's learned ``bit_pattern_31``
pairs; ``assets/orb_pattern_cv.npy`` is that table recovered empirically
from the opencv-python oracle (tools/recover_orb_pattern.py).  These tests
pin: the asset's identity (first pairs match OpenCV's published table),
bit-level agreement of our describe path with cv2.ORB given the same
keypoints/angles, and practical cross-matching between our extraction and
cv2's on the same image (the "load a map the reference built and relocalize
against it" capability behind io/msgpack_compat).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from openvslam_tpu.ops import orb, pyramid, match as M

cv2 = pytest.importorskip("cv2")

PAT = orb.get_pattern_np("cv")


def _smooth_noise(rng, rows=480, cols=640):
    img = rng.integers(0, 256, (rows, cols), np.uint8)
    return cv2.GaussianBlur(img, (0, 0), 1.2)


def test_cv_pattern_asset():
    assert PAT.shape == (256, 2, 2)
    pairs = {(tuple(p[0]), tuple(p[1])) for p in PAT.astype(int)}
    assert len(pairs) == 256
    assert np.abs(PAT).max() <= 15
    # identity anchor: OpenCV's bit_pattern_31_ starts 8,-3, 9,5 / 4,2, 7,-12
    assert PAT[0].astype(int).tolist() == [[8, -3], [9, 5]]
    assert PAT[1].astype(int).tolist() == [[4, 2], [7, -12]]


def _cv2_descriptors(img, kps):
    det = cv2.ORB_create(nfeatures=100000, nlevels=1, firstLevel=0,
                         WTA_K=2, patchSize=31, fastThreshold=0)
    out_kps, desc = det.compute(img, list(kps))
    assert len(out_kps) == len(kps)
    return desc


def _desc_to_u32(desc):
    return np.frombuffer(desc.tobytes(), dtype="<u4").reshape(len(desc), 8)


def test_describe_bit_agreement_vs_cv2():
    """Same keypoints + same angles -> our cv-pattern describe reproduces
    cv2.ORB's descriptors to within the oracle's own +-1 blur-rounding noise
    (measured ~0.3 mean differing bits of 256)."""
    rng = np.random.default_rng(11)
    img = _smooth_noise(rng)
    kps = []
    for y in range(48, img.shape[0] - 48, 32):
        for x in range(48, img.shape[1] - 48, 32):
            kps.append(cv2.KeyPoint(float(x), float(y), 31.0,
                                    float(rng.uniform(0, 360)), 0.0, 0))
    desc_cv = _desc_to_u32(_cv2_descriptors(img, kps))

    xy = jnp.asarray(np.array([k.pt for k in kps], np.float32))
    ang = jnp.asarray(np.radians([k.angle for k in kps]).astype(np.float32))
    # round the blur output: cv2's working image is uint8
    blurred = jnp.round(pyramid.gaussian_blur(jnp.asarray(img, jnp.float32)))
    ours = np.asarray(orb.brief_descriptors_gather(blurred, xy, ang, "cv"))

    diff = np.bitwise_count(ours ^ desc_cv).sum(-1)
    mean_flips = float(diff.mean())
    exact = float((diff == 0).mean())
    assert mean_flips < 2.0, f"mean differing bits {mean_flips}"
    assert exact > 0.5, f"only {exact:.0%} descriptors bit-exact"
    # and the learned pattern must NOT match (sanity that the test bites)
    ours_learned = np.asarray(
        orb.brief_descriptors_gather(blurred, xy, ang, "learned"))
    diff_l = np.bitwise_count(ours_learned ^ desc_cv).sum(-1)
    assert diff_l.mean() > 80  # ~random 128 for unrelated patterns


def test_mxu_path_matches_gather_cv_pattern():
    """Integer keypoint positions (what FAST produces at level coords): the
    widened-patch MXU path must agree with direct image gathers — including
    rotated samples beyond the 31x31 window (bit_pattern_31 reaches |q|~17,
    so the cv pattern needs the radius-19 patch).  The one-hot contractions
    run in bfloat16 (pixel values round by up to ~0.5 of 255), so near-tie
    comparisons flip ~1% of bits — well inside Hamming matching tolerance;
    gross disagreement would mean the widened patch indexing is wrong."""
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.integers(0, 255, (240, 320)).astype(np.float32))
    xy = jnp.asarray(np.round(rng.uniform(40, 200, (64, 2))).astype(np.float32))
    blurred = pyramid.gaussian_blur(img)
    d_mxu, ang = orb.describe_mxu(blurred, xy, "cv")
    d_gather = orb.brief_descriptors_gather(blurred, xy, ang, "cv")
    diff = np.bitwise_count(np.asarray(d_mxu) ^ np.asarray(d_gather)).sum(-1)
    assert diff.mean() < 6 and diff.max() < 25, (diff.mean(), diff.max())


def test_frontend_cross_matching_vs_cv2():
    """Extract with our frontend in cv-pattern mode and with cv2.ORB on the
    same image; cross-match descriptors (our MXU Hamming matcher) and check
    that matched pairs land on the same image location — the semantic
    interop a reference-built map requires."""
    from openvslam_tpu.models.frontend import OrbFrontend

    rng = np.random.default_rng(42)
    img = _smooth_noise(rng, 320, 416)
    fe = OrbFrontend(320, 416, max_keypts=500, num_levels=1, pattern="cv")
    kp = fe.extract(jnp.asarray(img))
    ours_xy = np.asarray(kp.xy)
    ours_valid = np.asarray(kp.valid)

    det = cv2.ORB_create(nfeatures=500, nlevels=1, firstLevel=0,
                         WTA_K=2, patchSize=31, fastThreshold=7)
    cv_kps, cv_desc = det.detectAndCompute(img, None)
    assert len(cv_kps) > 100
    cv_xy = np.array([k.pt for k in cv_kps], np.float32)
    cv_u32 = _desc_to_u32(cv_desc)
    cv_i8 = np.asarray(orb.unpack_bits_i8(jnp.asarray(cv_u32)))

    idx, dist = M.match_descriptors(
        jnp.asarray(np.asarray(kp.desc_i8)), jnp.asarray(cv_i8),
        jnp.asarray(ours_valid), jnp.ones(len(cv_kps), bool),
        max_dist=50, ratio=0.9, cross_check=True,
    )
    idx = np.asarray(idx)
    matched = np.flatnonzero((idx >= 0) & ours_valid)
    assert len(matched) > 40, f"only {len(matched)} cross-matches"
    d = np.linalg.norm(ours_xy[matched] - cv_xy[idx[matched]], axis=-1)
    frac_consistent = float((d < 2.0).mean())
    assert frac_consistent > 0.9, f"{frac_consistent:.0%} spatially consistent"


def test_tracking_quality_with_cv_pattern():
    """End-to-end sanity: the cv pattern tracks the synthetic sequence with
    the same quality class as the learned pattern."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_tracking_e2e import _make_config
    from openvslam_tpu.system import System
    from openvslam_tpu.utils import synthetic, evaluate

    cfg = _make_config(descriptor_pattern="cv")
    cam = cfg.camera
    rng = np.random.default_rng(8)
    scene = synthetic.PlaneSceneRenderer(
        rng, x_range=(-5, 8), y_range=(-5, 5), plane_z=7.0,
        rows=cam.rows, cols=cam.cols,
    )
    xs = np.linspace(0.0, 3.0, 20)
    poses = np.stack([synthetic.lookat_pose_cw((x, 0, 0), (x, 0, 7)) for x in xs])
    s = System(cfg, vocab_path="default")
    s.startup()
    est, gt = [], []
    for i in range(len(poses)):
        p = s.feed_monocular_frame(scene.render(cam, poses[i]), i / 20.0)
        if p is not None:
            est.append(-p[:3, :3].T @ p[:3, 3])
            gt.append(-poses[i][:3, :3].T @ poses[i][:3, 3])
    s.shutdown()
    assert len(est) >= 15
    ate = evaluate.ate_rmse(np.stack(est), np.stack(gt), align="sim3")
    assert ate < 0.05, ate

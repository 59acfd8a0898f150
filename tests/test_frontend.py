"""ORB front-end unit tests: detection on known structure, descriptor
stability under shift and in-plane rotation (validates IC-angle steering)."""
import numpy as np
import jax.numpy as jnp

from openvslam_tpu.models.frontend import OrbFrontend
from openvslam_tpu.ops import match as M
from openvslam_tpu.utils import synthetic


def _rotate_image(img, angle_deg):
    """Pure-numpy nearest rotation around the image center."""
    h, w = img.shape
    a = np.deg2rad(angle_deg)
    c, s = np.cos(a), np.sin(a)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    x0, y0 = w / 2, h / 2
    xs = c * (xx - x0) + s * (yy - y0) + x0
    ys = -s * (xx - x0) + c * (yy - y0) + y0
    xi = np.clip(np.round(xs).astype(int), 0, w - 1)
    yi = np.clip(np.round(ys).astype(int), 0, h - 1)
    out = img[yi, xi]
    inside = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    return np.where(inside, out, 0).astype(np.uint8)


def _textured_image(rng, rows=320, cols=416):
    cam_like = type("C", (), {})
    scene = synthetic.PlaneSceneRenderer(
        rng, x_range=(-5, 5), y_range=(-4, 4), plane_z=7.0, rows=rows, cols=cols
    )
    from openvslam_tpu.camera import Perspective
    cam = Perspective.create(fx=350, fy=350, cx=cols / 2, cy=rows / 2,
                             cols=cols, rows=rows)
    return scene.render(cam, synthetic.lookat_pose_cw((0, 0, 0), (0, 0, 7)))


def test_detection_counts_and_bounds(rng):
    img = _textured_image(rng)
    fe = OrbFrontend(320, 416, max_keypts=600, num_levels=4)
    kp = fe.extract(jnp.asarray(img))
    xy = np.asarray(kp.xy)[np.asarray(kp.valid)]
    assert len(xy) > 300
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 416).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 320).all()
    # determinism
    kp2 = fe.extract(jnp.asarray(img))
    np.testing.assert_array_equal(np.asarray(kp.desc_u32), np.asarray(kp2.desc_u32))


def test_rotation_invariance(rng):
    """In-plane rotation: steered BRIEF must keep matching (ref rBRIEF)."""
    img = _textured_image(rng)
    fe = OrbFrontend(320, 416, max_keypts=600, num_levels=4)
    kp1 = fe.extract(jnp.asarray(img))
    for angle in (15, 45, 90):
        rot = _rotate_image(img, angle)
        kp2 = fe.extract(jnp.asarray(rot))
        idx, dist = M.match_descriptors(
            kp1.desc_i8, kp2.desc_i8, kp1.valid, kp2.valid,
            max_dist=M.HAMMING_DIST_THR_LOW, ratio=0.85, cross_check=True,
        )
        idx = np.asarray(idx)
        m1 = np.where(idx >= 0)[0]
        assert len(m1) > 60, f"angle {angle}: only {len(m1)} matches"
        # verify geometric consistency under the known rotation
        a = np.deg2rad(angle)
        c, s = np.cos(a), np.sin(a)
        x0, y0 = 416 / 2, 320 / 2
        xy1 = np.asarray(kp1.xy)[m1]
        xy2 = np.asarray(kp2.xy)[idx[m1]]
        # forward map of xy1 into the rotated image
        xr = c * (xy1[:, 0] - x0) - s * (xy1[:, 1] - y0) + x0
        yr = s * (xy1[:, 0] - x0) + c * (xy1[:, 1] - y0) + y0
        err = np.hypot(xr - xy2[:, 0], yr - xy2[:, 1])
        frac_good = (err < 3.0).mean()
        assert frac_good > 0.7, f"angle {angle}: {frac_good:.2f} consistent"


def test_describe_variants_agree(rng):
    """gather / patch / mxu descriptor paths must agree for interior
    keypoints (identical rounding semantics)."""
    import jax.numpy as jnp
    from openvslam_tpu.ops import orb, pyramid

    img = _textured_image(rng).astype(np.float32)
    blurred = pyramid.gaussian_blur(jnp.asarray(img))
    xy = jnp.asarray(
        np.stack([rng.uniform(30, 380, 64), rng.uniform(30, 280, 64)], -1),
        jnp.float32,
    )
    ang = orb.ic_angles(jnp.asarray(img), xy)
    d_gather = np.asarray(orb.brief_descriptors_gather(blurred, xy, ang))
    d_patch = np.asarray(orb.brief_descriptors_patch(blurred, xy, ang))
    d_mxu, ang_mxu = orb.describe_mxu(blurred, xy)
    d_mxu = np.asarray(d_mxu)
    # gather vs patch: identical bit-for-bit in the interior
    ham_gp = np.bitwise_count(d_gather ^ d_patch).sum(-1)
    assert np.median(ham_gp) <= 2, ham_gp
    # mxu computes its own (blurred-patch) angle: bits should still be close
    ham_gm = np.bitwise_count(d_gather ^ d_mxu).sum(-1)
    assert np.median(ham_gm) <= 24, np.quantile(ham_gm, [0.5, 0.9])
    # mxu2 (batched describe over pre-extracted patches) must be
    # bit-identical to mxu (same one-hot patches, same sampling math)
    p, fx, fy = orb.extract_patches_onehot(blurred, xy)
    d_mxu2, _ = orb.describe_patches(p, fx, fy)
    d_mxu2 = np.asarray(d_mxu2)
    np.testing.assert_array_equal(d_mxu2, d_mxu)
    ham_gm2 = np.bitwise_count(d_gather ^ d_mxu2).sum(-1)
    assert np.median(ham_gm2) <= 24, np.quantile(ham_gm2, [0.5, 0.9])


def test_describe_binned_agrees_and_matches(rng):
    """Binned steering (constant per-bin selection tables, 64 bins = 5.6 deg)
    vs continuous steering: descriptors stay close, and matching power under
    a known image shift is preserved."""
    import jax.numpy as jnp
    from openvslam_tpu.ops import match as M
    from openvslam_tpu.ops import orb, pyramid

    img = _textured_image(rng).astype(np.float32)
    blurred = pyramid.gaussian_blur(jnp.asarray(img))
    xy_np = np.stack([rng.uniform(30, 370, 96), rng.uniform(30, 270, 96)], -1)
    xy_np = np.round(xy_np)              # frontend keypoints are integer
    xy = jnp.asarray(xy_np, jnp.float32)

    d_cont, ang_c = orb.describe_mxu(blurred, xy)
    d_bin, ang_b = orb.describe_mxu_binned(blurred, xy)
    np.testing.assert_allclose(np.asarray(ang_b), np.asarray(ang_c))
    ham = np.bitwise_count(np.asarray(d_bin) ^ np.asarray(d_cont)).sum(-1)
    assert np.median(ham) <= 24, np.quantile(ham, [0.5, 0.9])

    # matching power: shifted image, binned descriptors on both sides
    shift = 40
    img2 = np.roll(img, shift, axis=1)
    blurred2 = pyramid.gaussian_blur(jnp.asarray(img2))
    xy2 = jnp.asarray(
        np.stack([np.clip(xy_np[:, 0] + shift, 16, 399), xy_np[:, 1]], -1),
        jnp.float32)
    d2, _ = orb.describe_mxu_binned(blurred2, xy2)
    ok1 = jnp.ones(xy.shape[0], bool)
    idx, dist = M.match_descriptors(
        orb.unpack_bits_i8(d_bin), orb.unpack_bits_i8(d2), ok1, ok1,
        max_dist=M.HAMMING_DIST_THR_HIGH, ratio=None, cross_check=True)
    idx = np.asarray(idx)
    interior = (xy_np[:, 0] + shift < 395)
    matched = idx >= 0
    good = matched & (idx == np.arange(len(idx)))
    assert good[interior].mean() > 0.8, good[interior].mean()


def test_frontend_mxu2_end_to_end(rng):
    """The batched-levels frontend path (impl mxu2) produces the same
    keypoints as the default path and closely-agreeing descriptors."""
    import jax.numpy as jnp
    from openvslam_tpu.models.frontend import OrbFrontend
    from openvslam_tpu.ops import orb

    img = jnp.asarray(_textured_image(rng).astype(np.uint8))
    saved = orb._brief_name
    try:
        orb._brief_name = "gather"
        kp_ref = OrbFrontend(rows=img.shape[0], cols=img.shape[1],
                             max_keypts=256, num_levels=4).extract(img)
        orb._brief_name = "mxu2"
        kp_b = OrbFrontend(rows=img.shape[0], cols=img.shape[1],
                           max_keypts=256, num_levels=4).extract(img)
    finally:
        orb._brief_name = saved
    np.testing.assert_array_equal(np.asarray(kp_b.xy), np.asarray(kp_ref.xy))
    np.testing.assert_array_equal(np.asarray(kp_b.valid),
                                  np.asarray(kp_ref.valid))
    both = np.asarray(kp_ref.valid)
    ham = np.bitwise_count(
        np.asarray(kp_b.desc_u32)[both] ^ np.asarray(kp_ref.desc_u32)[both]
    ).sum(-1)
    assert np.median(ham) <= 24, np.quantile(ham, [0.5, 0.9])


def test_fuse_candidates_multi_matches_single(rng):
    """The batched multi-neighbor fuse must reproduce per-neighbor
    fuse_candidates exactly (padding neighbors yield all -1)."""
    import jax.numpy as jnp
    from openvslam_tpu.camera import Perspective
    from openvslam_tpu.models import tracking_ops as TO

    cam = Perspective.create(fx=300.0, fy=300.0, cx=160.0, cy=120.0,
                             cols=320, rows=240)
    L, K, B = 256, 128, 3
    lm_pos = jnp.asarray(rng.standard_normal((L, 3)) * 2 + [0, 0, 5],
                         jnp.float32)
    lm_desc = jnp.asarray(rng.integers(0, 2, (L, 256)), jnp.int8)
    lm_valid = jnp.asarray(rng.random(L) > 0.1)
    pred = jnp.asarray(rng.integers(-1, 4, L), jnp.int32)
    sf = jnp.asarray([1.2**l for l in range(4)], jnp.float32)
    poses, descs, unds, kvals, klvls = [], [], [], [], []
    for b in range(B):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = rng.standard_normal(3) * 0.2
        poses.append(T)
        descs.append(rng.integers(0, 2, (K, 256)).astype(np.int8))
        unds.append(rng.uniform(0, [320, 240], (K, 2)).astype(np.float32))
        kvals.append(rng.random(K) > 0.1)
        klvls.append(rng.integers(0, 4, K).astype(np.int32))
    kvals[-1][:] = False                        # a fully-invalid "padding" row
    idx_m, dist_m = TO.fuse_candidates_multi(
        cam, jnp.asarray(np.stack(poses)), lm_pos, lm_desc, lm_valid,
        jnp.asarray(np.stack(descs)), jnp.asarray(np.stack(unds)),
        jnp.asarray(np.stack(kvals)), jnp.asarray(np.stack(klvls)),
        jnp.float32(3.0), sf, pred)
    for b in range(B):
        idx_s, dist_s = TO.fuse_candidates(
            cam, jnp.asarray(poses[b]), lm_pos, lm_desc, lm_valid,
            jnp.asarray(descs[b]), jnp.asarray(unds[b]),
            jnp.asarray(kvals[b]), jnp.asarray(klvls[b]),
            jnp.float32(3.0), sf, pred)
        np.testing.assert_array_equal(np.asarray(idx_m[b]), np.asarray(idx_s))
    assert (np.asarray(idx_m[B - 1]) == -1).all()

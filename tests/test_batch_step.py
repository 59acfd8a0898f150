"""Batched multi-stream step (models/batch_step.py): per-stream equivalence
with the single-frame FrameStep, and batched extraction vs extract()."""
import numpy as np
import pytest

import jax.numpy as jnp

from openvslam_tpu.camera import Perspective
from openvslam_tpu.models.batch_step import BatchFrameStep
from openvslam_tpu.models.frame_step import FrameStep
from openvslam_tpu.models.frontend import OrbFrontend
from openvslam_tpu.ops import fast
from openvslam_tpu.utils import synthetic


@pytest.fixture(scope="module")
def scene_and_frames():
    cam = Perspective.create(fx=350.0, fy=350.0, cx=160.0, cy=120.0,
                             cols=320, rows=240, fps=30.0)
    rng = np.random.default_rng(9)
    scene = synthetic.PatchSceneRenderer(
        rng, n_points=300, center=(0, 0, 6), extent=(4, 3, 2), rows=240, cols=320)
    poses = synthetic.orbit_trajectory(3, radius=2.0, target=(0, 0, 6),
                                       arc=np.pi / 8)
    imgs = np.stack([scene.render(cam, poses[i]) for i in range(3)])
    return cam, scene, poses, imgs


def test_detect_level_batch_matches_per_frame():
    rng = np.random.default_rng(0)
    # height NOT a multiple of 8: exercises the row-stacking pad path
    imgs = jnp.asarray(rng.integers(0, 255, (3, 93, 128)).astype(np.float32))
    bx, br, bv = fast.detect_level_batch(imgs, 20.0, 7.0, 64)
    for i in range(3):
        x, r, v = fast.detect_level(imgs[i], 20.0, 7.0, 64)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(bx[i]))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(bv[i]))
        np.testing.assert_array_equal(np.asarray(r), np.asarray(br[i]))


def test_extract_batch_matches_extract(scene_and_frames):
    cam, scene, poses, imgs = scene_and_frames
    fe = OrbFrontend(240, 320, max_keypts=300, num_levels=3)
    kb = fe.extract_batch(jnp.asarray(imgs))
    for i in range(len(imgs)):
        k1 = fe.extract(jnp.asarray(imgs[i]))
        np.testing.assert_array_equal(np.asarray(k1.xy), np.asarray(kb.xy[i]))
        np.testing.assert_array_equal(np.asarray(k1.valid), np.asarray(kb.valid[i]))
        np.testing.assert_array_equal(
            np.asarray(k1.desc_u32), np.asarray(kb.desc_u32[i]))
        np.testing.assert_array_equal(
            np.asarray(k1.level), np.asarray(kb.level[i]))


def test_batch_step_matches_frame_step(scene_and_frames, monkeypatch):
    # force the XLA kernel formulations in the single-frame step so the
    # comparison is apples-to-apples (the batch path always uses them;
    # the Pallas kernels are bit-validated against these elsewhere)
    monkeypatch.setenv("OPENVSLAM_TPU_PALLAS_MATCH", "0")
    monkeypatch.setenv("OPENVSLAM_TPU_PALLAS_POSELM", "0")
    cam, scene, poses, imgs = scene_and_frames
    bs = BatchFrameStep(cam, max_keypts=300, num_levels=3, lm_capacity=256)
    fs = FrameStep(cam, max_keypts=300, num_levels=3, lm_capacity=256)

    kp0 = fs.frontend.extract(jnp.asarray(imgs[0]))
    L = 256
    lm_pos = np.zeros((L, 3), np.float32)
    lm_desc = np.zeros((L, 256), np.int8)
    lm_valid = np.zeros(L, bool)
    kxy = np.asarray(kp0.xy)
    kval = np.asarray(kp0.valid)
    kdesc = np.asarray(kp0.desc_i8)
    pc0 = (poses[0][:3, :3] @ scene.points.T).T + poses[0][:3, 3]
    uv0, _, vis0 = cam.project(jnp.asarray(pc0, jnp.float32))
    uv0, vis0 = np.asarray(uv0), np.asarray(vis0)
    n = 0
    for i in np.where(vis0)[0]:
        d = np.linalg.norm(kxy - uv0[i], axis=-1)
        d[~kval] = 1e9
        j = int(np.argmin(d))
        if d[j] < 3.0 and n < L:
            lm_pos[n] = scene.points[i]
            lm_desc[n] = kdesc[j]
            lm_valid[n] = True
            n += 1
    assert n > 15
    lm_lvl = np.full(L, -1, np.int32)

    B = len(imgs)
    out_b = bs.step(
        jnp.asarray(imgs),
        jnp.asarray(np.stack([p.astype(np.float32) for p in poses])),
        jnp.broadcast_to(jnp.asarray(lm_pos), (B, L, 3)),
        jnp.broadcast_to(jnp.asarray(lm_desc), (B, L, 256)),
        jnp.broadcast_to(jnp.asarray(lm_valid), (B, L)),
        jnp.broadcast_to(jnp.asarray(lm_lvl), (B, L)),
    )
    for i in range(B):
        out1 = fs.step(
            jnp.asarray(imgs[i]), jnp.asarray(poses[i].astype(np.float32)),
            jnp.asarray(lm_pos), jnp.asarray(lm_desc),
            jnp.asarray(lm_valid), jnp.asarray(lm_lvl))
        assert int(out_b.num_inliers[i]) == int(out1.num_inliers)
        np.testing.assert_array_equal(
            np.asarray(out1.lm_kpt_idx), np.asarray(out_b.lm_kpt_idx[i]))
        np.testing.assert_allclose(
            np.asarray(out1.T_cw), np.asarray(out_b.T_cw[i]), atol=1e-5)
    assert int(out_b.num_inliers[0]) > 10

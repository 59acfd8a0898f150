"""Stream-parallel tracking (parallel/stream_parallel.py): one session's
fused step per mesh device, exactly equal to the single-device FrameStep."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from openvslam_tpu.camera import Perspective
from openvslam_tpu.models.frame_step import FrameStep
from openvslam_tpu.parallel.stream_parallel import StreamParallelStep
from openvslam_tpu.utils import synthetic


def test_stream_parallel_matches_frame_step():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >=4 (virtual) devices")
    cam = Perspective.create(fx=350.0, fy=350.0, cx=160.0, cy=120.0,
                             cols=320, rows=240, fps=30.0)
    fs = FrameStep(cam, max_keypts=400, num_levels=4, lm_capacity=512)
    mesh = Mesh(np.array(devs[:4]), ("d",))
    sp = StreamParallelStep(fs, mesh)
    assert sp.n_streams == 4

    rng = np.random.default_rng(9)
    scene = synthetic.PatchSceneRenderer(
        rng, n_points=400, center=(0, 0, 6), extent=(4, 3, 2),
        rows=240, cols=320)
    poses = synthetic.orbit_trajectory(4, radius=2.0, target=(0, 0, 6),
                                       arc=np.pi / 8)
    imgs = np.stack([scene.render(cam, poses[i]) for i in range(4)])

    kp0 = fs.frontend.extract(jnp.asarray(imgs[0]))
    L = 512
    lm_pos = np.zeros((L, 3), np.float32)
    lm_desc = np.zeros((L, 256), np.int8)
    lm_valid = np.zeros(L, bool)
    pc0 = (poses[0][:3, :3] @ scene.points.T).T + poses[0][:3, 3]
    uv0, _, vis0 = cam.project(jnp.asarray(pc0, jnp.float32))
    uv0, vis0 = np.asarray(uv0), np.asarray(vis0)
    kxy = np.asarray(kp0.xy)
    kval = np.asarray(kp0.valid)
    kdesc = np.asarray(kp0.desc_i8)
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

    B = 4
    args = sp.shard(
        imgs, np.stack([p.astype(np.float32) for p in poses]),
        np.broadcast_to(lm_pos, (B, L, 3)).copy(),
        np.broadcast_to(lm_desc, (B, L, 256)).copy(),
        np.broadcast_to(lm_valid, (B, L)).copy(),
        np.broadcast_to(lm_lvl, (B, L)).copy(),
    )
    out = sp.step(*args)
    for i in range(B):
        o1 = fs.step(
            jnp.asarray(imgs[i]), jnp.asarray(poses[i].astype(np.float32)),
            jnp.asarray(lm_pos), jnp.asarray(lm_desc),
            jnp.asarray(lm_valid), jnp.asarray(lm_lvl))
        assert int(out.num_inliers[i]) == int(o1.num_inliers), i
        np.testing.assert_array_equal(
            np.asarray(o1.lm_kpt_idx), np.asarray(out.lm_kpt_idx[i]))
        np.testing.assert_allclose(
            np.asarray(o1.T_cw), np.asarray(out.T_cw[i]), atol=1e-6)
    assert int(out.num_inliers[0]) > 10

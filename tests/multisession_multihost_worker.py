"""Worker for tests/test_multi_session_multihost.py: each of 2 processes
runs its OWN stereo SLAM session on a synthetic scene (different
trajectories), then all hosts rendezvous for the cross-host pooled
distributed BA (parallel.multi_session_multihost.MultihostSessionPool).

Run: python multisession_multihost_worker.py <pid> <nproc> <port> <out.json>
"""
import json
import os
import sys
import time

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
out_path = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4")
os.environ["OPENVSLAM_TPU_PREWARM"] = "0"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
# distributed init MUST precede importing openvslam_tpu (shared caches
# touch the backend)
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np

from openvslam_tpu.config import Config
from openvslam_tpu.system import System
from openvslam_tpu.parallel.multi_session_multihost import MultihostSessionPool
from openvslam_tpu.utils import synthetic

assert jax.device_count() == 4 * nproc

rows, cols = 240, 320
BASELINE = 0.12
cfg = Config.from_dict({
    "Camera": {
        "name": "synthetic", "setup": "stereo", "model": "perspective",
        "fx": 260.0, "fy": 260.0, "cx": cols / 2, "cy": rows / 2,
        "cols": cols, "rows": rows, "fps": 10,
        "focal_x_baseline": 260.0 * BASELINE, "depth_threshold": 40.0,
    },
    "Feature": {"max_num_keypts": 400, "num_levels": 3, "scale_factor": 1.2},
    "LoopDetector": {"enabled": False},
})
cam = cfg.camera
rng = np.random.default_rng(100 + pid)          # per-host scene
scene = synthetic.PlaneSceneRenderer(
    rng, x_range=(-4, 12), y_range=(-5, 5), plane_z=7.0,
    rows=rows, cols=cols)
n_frames = 16
xs = np.linspace(0.0, 3.0, n_frames) + 4.0 * pid   # disjoint host tracks
poses = np.stack([synthetic.lookat_pose_cw((x, 0, 0), (x, 0, 7))
                  for x in xs])
shift = np.eye(4)
shift[0, 3] = -BASELINE


def frames():
    for i in range(n_frames):
        l_img = scene.render(cam, poses[i])
        r_img = scene.render(cam, shift @ poses[i])
        yield l_img, r_img, i / 10.0


t0 = time.perf_counter()
s = System(cfg)
pool = MultihostSessionPool([s])
tracked = pool.run_local([frames()])
feed_s = time.perf_counter() - t0

pre_geom = s.map_db.geom_version
t0 = time.perf_counter()
cost = pool.joint_bundle_adjust(iters=8)
ba_s = time.perf_counter() - t0
s.shutdown()

result = {
    "pid": pid,
    "tracked": sum(tracked[0]),
    "frames": n_frames,
    "keyframes": int(len(s.map_db.valid_kf_ids())),
    "landmarks": int(len(s.map_db.valid_lm_ids())),
    "cost": cost,
    "writeback_applied": bool(s.map_db.geom_version > pre_geom),
    "feed_s": round(feed_s, 2),
    "ba_s": round(ba_s, 2),
}
# p0 gathers everyone's summary through the control plane for the test
from openvslam_tpu.parallel import multihost
summary = multihost.process_allgather(np.asarray(
    [result["tracked"], result["keyframes"], result["landmarks"],
     1 if result["writeback_applied"] else 0], np.int64)).reshape(-1, 4)
if pid == 0:
    result["all_hosts"] = summary.tolist()
    with open(out_path, "w") as f:
        json.dump(result, f)
print(f"[p{pid}] tracked {result['tracked']}/{n_frames}, "
      f"kfs {result['keyframes']}, pooled cost {cost}", flush=True)

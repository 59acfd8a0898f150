"""Worker process for tests/test_multihost_ba.py: joins a 2-process
jax.distributed runtime (4 virtual CPU devices each -> 8-device global
mesh), solves the shared synthetic BA problem through
parallel.multihost.make_multihost_ba, and writes its result as JSON.

Run: python multihost_worker.py <process_id> <num_processes> <port> <out.json>
"""
import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
out_path = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

# distributed init MUST precede anything that touches the XLA backend —
# including importing openvslam_tpu (whose module-level shared caches can
# trigger backend initialization)
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np

from openvslam_tpu.parallel import multihost
assert jax.device_count() == 4 * nproc, jax.device_count()
assert jax.local_device_count() == 4

# every host derives the SAME pooled problem (deterministic seed), as a
# pooled snapshot agreed through the control plane would be
from test_ba import _build_problem, _pose_errors

rng = np.random.default_rng(7)
cam, prob, T_true, X_true, n_cams, n_lms = _build_problem(rng, L=512, O=4096)

# control plane: keyframe-range assignment across hosts
offs = multihost.assign_keyframe_ranges(counts_local=n_cams)
assert offs[-1] == nproc * n_cams

mesh, solve = multihost.make_multihost_ba(cam, iters=10)
assert mesh.devices.size == 4 * nproc
T, X, cost = solve(prob)
errs = _pose_errors(T, T_true, n_cams)

# steady-state timing (used by bench_scaling.py --multihost): the second
# call reuses the compiled program; report BA iterations/s across hosts
import time
t0 = time.perf_counter()
reps = 3
for _ in range(reps):
    T, X, cost = solve(prob)
dt = (time.perf_counter() - t0) / reps
iters_per_s = 10 / dt

if pid == 0:
    with open(out_path, "w") as f:
        json.dump({
            "cost": cost,
            "max_pose_err": float(errs.max()),
            "global_devices": jax.device_count(),
            "offsets": [int(x) for x in offs],
            "iters_per_s": iters_per_s,
            "T0": np.asarray(T)[:n_cams].reshape(-1).tolist(),
        }, f)
print(f"[p{pid}] done cost={cost:.4f} max_err={errs.max():.5f} "
      f"({iters_per_s:.2f} BA iters/s)", flush=True)

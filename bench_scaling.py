"""Distributed-BA scaling benchmark (BASELINE.md config 5 analog).

Builds one BA problem from three concurrent synthetic sessions merged into a
single map, then times the landmark-sharded distributed BA at 1, 2, 4, 8
shards and reports BA iterations/s + scaling efficiency.

On this box only a virtual CPU mesh is available (single TPU chip); the
numbers validate the sharded path end-to-end and the efficiency metric
plumbing — real ICI efficiency needs a multi-chip slice.  Run:

    PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python bench_scaling.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_problem(n_cams=24, n_lms=3000, C=32, L=4096, O=32768, seed=0):
    import jax.numpy as jnp
    from openvslam_tpu.camera import Perspective
    from openvslam_tpu.optimize.ba import BAProblem
    from openvslam_tpu.ops import se3
    from openvslam_tpu.utils import synthetic

    cam = Perspective.create(fx=500, fy=500, cx=320, cy=240, cols=640, rows=480)
    rng = np.random.default_rng(seed)
    # three "sessions": three wall segments (KITTI 00+02+05 analog)
    pts_all, poses_all = [], []
    for s in range(3):
        x0 = s * 30.0
        pts = synthetic.landmark_cloud(
            rng, n_lms // 3, center=(x0, 0, 7), extent=(8, 4, 2)
        )
        xs = np.linspace(x0 - 5, x0 + 5, n_cams // 3)
        poses = np.stack([
            synthetic.lookat_pose_cw((x, 0, 0), (x, 0, 7)) for x in xs
        ])
        pts_all.append(pts)
        poses_all.append(poses)
    pts = np.concatenate(pts_all)
    poses = np.concatenate(poses_all)

    obs = []
    for c in range(n_cams):
        pc = (poses[c, :3, :3] @ pts.T).T + poses[c, :3, 3]
        uv, _, valid = cam.project(jnp.asarray(pc, jnp.float32))
        uv = np.asarray(uv)
        for l in np.where(np.asarray(valid))[0]:
            obs.append((c, l, uv[l] + rng.standard_normal(2) * 0.5))
    T = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    T[:n_cams] = poses
    for c in range(1, n_cams):
        xi = rng.standard_normal(6) * 0.01
        T[c] = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32))) @ T[c]
    X = np.zeros((L, 3), np.float32)
    X[:len(pts)] = pts + rng.standard_normal(pts.shape) * 0.02
    oc = np.zeros(O, np.int32)
    ol = np.zeros(O, np.int32)
    ouv = np.zeros((O, 2), np.float32)
    om = np.zeros(O, bool)
    n_obs = min(len(obs), O)
    for k in range(n_obs):
        oc[k], ol[k], ouv[k] = obs[k]
        om[k] = True
    cam_opt = np.zeros(C, bool)
    cam_opt[1:n_cams] = True
    cam_valid = np.zeros(C, bool)
    cam_valid[:n_cams] = True
    lm_valid = np.zeros(L, bool)
    lm_valid[:len(pts)] = True
    prob = BAProblem(
        jnp.asarray(T), jnp.asarray(cam_opt), jnp.asarray(cam_valid),
        jnp.asarray(X), jnp.asarray(lm_valid),
        jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(ouv),
        jnp.ones(O, jnp.float32), jnp.asarray(om),
    )
    return cam, prob, n_obs


def main():
    import jax
    from openvslam_tpu.parallel import make_mesh, make_distributed_ba
    from openvslam_tpu.parallel.distributed_ba import partition_problem

    cam, prob, n_obs = build_problem()
    n_dev = len(jax.devices())
    iters = 8
    results = {}
    for shards in [1, 2, 4, 8]:
        if shards > n_dev:
            break
        mesh = make_mesh(shards)
        ba = make_distributed_ba(cam, mesh, iters=iters)
        sp = partition_problem(prob, shards)
        out = ba(sp)
        jax.block_until_ready(out)          # compile + warm
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = ba(sp)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        results[shards] = iters / dt
        print(f"[scaling] {shards} shard(s): {iters/dt:.2f} BA iters/s "
              f"({dt*1000:.0f} ms / {iters} iters), cost={float(out[2]):.1f}",
              file=sys.stderr)
    base = results.get(1)
    top = max(results)
    import jax as _jax
    virtual = _jax.devices()[0].platform == "cpu"
    if virtual:
        # N virtual devices share the same physical cores, so throughput
        # CANNOT grow with shard count here — the honest figure on this
        # topology is sharding OVERHEAD: wall(1 shard)/wall(N shards).
        # 1.0 means the per-shard Schur elimination + psum assembly adds
        # nothing over the unsharded solve, which is the property that
        # transfers to real chips (where per-shard work then scales down
        # ~linearly).  Real >=70% ICI efficiency needs a multi-chip slice.
        eff = results[top] / base if base else 0.0
        metric = "distributed_ba_sharding_overhead_free_fraction"
        unit = f"wall(1)/wall({top} shards), fixed total cores"
    else:
        eff = results[top] / (base * top) if base else 0.0
        metric = "distributed_ba_scaling_efficiency"
        unit = f"efficiency@{top}shards"
    payload = {
        "metric": metric,
        "value": round(eff, 3),
        "unit": unit,
        "vs_baseline": round(eff / 0.7, 3),
        "ba_iters_per_s": {str(k): round(v, 2) for k, v in results.items()},
        "note": ("virtual CPU mesh: fixed total compute, so the metric is "
                 "sharding overhead, not speedup" if virtual
                 else "real multi-chip mesh"),
    }
    if "--multihost" in sys.argv:
        payload["multihost_2proc_ba_iters_per_s"] = _multihost_iters_per_s()
    print(json.dumps(payload))


def _multihost_iters_per_s():
    """Launch the 2-process x 4-device multihost BA workers (gloo = the DCN
    stand-in) and report their cross-host BA iterations/s — the N>=2 hosts
    measurement recipe of the north star, runnable on this one-chip box."""
    import socket
    import subprocess
    import tempfile
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "tests", "multihost_worker.py")
    out_js = os.path.join(tempfile.mkdtemp(), "mh.json")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port), out_js], env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for i in range(2)]
    for p in procs:
        p.communicate(timeout=600)
    if all(p.returncode == 0 for p in procs) and os.path.exists(out_js):
        return round(json.load(open(out_js))["iters_per_s"], 2)
    return None


if __name__ == "__main__":
    main()

"""Latency attribution for the pipelined feed on the REAL TPU tunnel, plus
multi-session aggregate throughput — everything in ONE process (the tunnel
is single-tenant; see NOTES.md).

Measures:
  1. raw primitive costs: device_put of one frame, trivial jit round trip,
     device_get of an already-computed (and host-copied) array;
  2. per-phase wall time of the pipelined feed (prep / dispatch / finish);
  3. aggregate frames/s of 3 concurrent sessions, sequential vs pipelined.

Run:  python tools/tpu_pipeline_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _med_ms(xs):
    return float(np.median(np.array(xs)) * 1000)


def main():
    import jax
    import jax.numpy as jnp
    from openvslam_tpu.config import Config
    from openvslam_tpu.system import System
    from openvslam_tpu.utils import synthetic

    print("backend:", jax.devices(), flush=True)

    # --- 1. raw primitive costs --------------------------------------
    img_np = np.random.default_rng(0).integers(
        0, 255, (320, 416), np.uint8)
    f = jax.jit(lambda x: x.astype(jnp.float32).sum())
    _ = f(jnp.asarray(img_np)).block_until_ready()   # compile
    puts, calls, gets, gets_cold = [], [], [], []
    for _i in range(12):
        t0 = time.perf_counter()
        d = jax.device_put(img_np)
        puts.append(time.perf_counter() - t0)
        d.block_until_ready()
        t0 = time.perf_counter()
        r = f(d)
        calls.append(time.perf_counter() - t0)
        r.block_until_ready()
        t0 = time.perf_counter()
        _ = np.asarray(r)
        gets_cold.append(time.perf_counter() - t0)
        r2 = f(d)
        r2.copy_to_host_async()
        r2.block_until_ready()
        time.sleep(0.01)
        t0 = time.perf_counter()
        _ = np.asarray(r2)
        gets.append(time.perf_counter() - t0)
    print(f"device_put(133KB) {_med_ms(puts):.2f} ms (async-return); "
          f"jit dispatch {_med_ms(calls):.2f} ms; "
          f"device_get cold {_med_ms(gets_cold):.2f} ms, "
          f"after copy_to_host_async {_med_ms(gets):.2f} ms", flush=True)

    # --- 2. per-phase pipelined feed ----------------------------------
    cfg = Config.from_dict({
        "Camera": {"name": "probe", "setup": "monocular",
                   "model": "perspective",
                   "fx": 350.0, "fy": 350.0, "cx": 208.0, "cy": 160.0,
                   "cols": 416, "rows": 320, "fps": 20},
        "Feature": {"max_num_keypts": 600, "num_levels": 4,
                    "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })
    cam = cfg.camera
    rng = np.random.default_rng(11)
    scene = synthetic.PatchSceneRenderer(rng, n_points=700, center=(0, 0, 6),
                                         extent=(6, 4.5, 2.5),
                                         rows=cam.rows, cols=cam.cols)
    n = 40
    gt = synthetic.orbit_trajectory(n, radius=2.5, target=(0, 0, 6),
                                    arc=np.pi / 4)
    imgs = [scene.render(cam, gt[i]) for i in range(n)]

    for depth in (1, 2, 3):
        s = System(cfg)
        s.startup()
        ytimes, out = [], []
        t_last = time.perf_counter()
        t0 = t_last
        for ts_pose in s.feed_sequence(
                ((imgs[i], i / 20.0) for i in range(n)), depth=depth):
            now = time.perf_counter()
            ytimes.append(now - t_last)
            t_last = now
            out.append(ts_pose)
        wall = time.perf_counter() - t0
        s.shutdown()
        ps = s.pipe_stats
        tracked = sum(p is not None for _, p in out)
        print(f"pipelined depth={depth}: {n} frames in {wall:.2f} s, "
              f"steady median {_med_ms(ytimes[8:]):.1f} ms/frame "
              f"({1000/max(_med_ms(ytimes[8:]),1e-9):.1f} fps), "
              f"tracked {tracked}, fused {s._fused_frames}; "
              f"phases ms: prep {_med_ms(ps['prep_s']):.1f}, "
              f"dispatch {_med_ms(ps['dispatch_s']):.1f}, "
              f"finish {_med_ms(ps['finish_s'][3:]):.1f}", flush=True)

    # --- 3. multi-session aggregate throughput ------------------------
    from openvslam_tpu.parallel import MultiSessionRunner, make_mesh

    def sessions():
        out = []
        for i in range(3):
            # async mapping: keyframe-insertion device calls must not block
            # the session's feed generator (the reference's own contract)
            si = System(cfg, async_mapping=True)
            rngi = np.random.default_rng(30 + i)
            scn = synthetic.PatchSceneRenderer(
                rngi, n_points=600, center=(0, 0, 6), extent=(6, 4.5, 2.5),
                rows=cam.rows, cols=cam.cols)
            gti = synthetic.orbit_trajectory(24, radius=2.5, target=(0, 0, 6),
                                             arc=np.pi / 5)
            fr = [(scn.render(cam, gti[j]), j / 20.0) for j in range(24)]
            out.append((si, fr))
        return out

    for pipe in (False, True):
        ss = sessions()
        runner = MultiSessionRunner([s for s, _ in ss], mesh=make_mesh(1))
        t0 = time.perf_counter()
        tracked = runner.run([fr for _, fr in ss], pipeline=pipe,
                             pipeline_depth=2)
        wall = time.perf_counter() - t0
        runner.shutdown()
        tot = sum(len(t) for t in tracked)
        ok = sum(int(np.sum(t)) for t in tracked)
        print(f"multi-session pipeline={pipe}: {tot} frames in {wall:.2f} s "
              f"({tot/wall:.1f} agg fps, {ok} tracked)", flush=True)


if __name__ == "__main__":
    main()

"""Capture a jax.profiler trace of the fused FrameStep and print the top ops
by self time (parsed from the xplane protobuf via tensorboard_plugin_profile).

Run:  python tools/tpu_profile_framestep.py [outdir]
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from openvslam_tpu.camera import Perspective
    from openvslam_tpu.models.frame_step import FrameStep

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    print("backend:", jax.devices(), flush=True)
    cam = Perspective.create(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                             cols=640, rows=480, fps=30.0)
    fs = FrameStep(cam, max_keypts=1024, num_levels=8, lm_capacity=4096)
    args = fs.example_args()
    print("compiling...", flush=True)
    for _ in range(3):
        out = fs.step(*args)
    jax.block_until_ready(out)

    with jax.profiler.trace(outdir):
        for _ in range(10):
            out = fs.step(*args)
        jax.block_until_ready(out)
    print("trace written", flush=True)

    # parse: find the xplane file and dump top ops by self time
    pbs = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", pbs, flush=True)
    if not pbs:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
        data, _ = rtd.xspace_to_tool_data(pbs, "framework_op_stats", {})
        open("/tmp/op_stats.csv", "w").write(
            data if isinstance(data, str) else data.decode())
        print("wrote /tmp/op_stats.csv", flush=True)
    except Exception as e:
        print("convert failed:", e, flush=True)
        # fallback: raw xplane parse
        try:
            from tensorboard_plugin_profile.protobuf import xplane_pb2
        except Exception:
            from tsl.profiler.protobuf import xplane_pb2  # type: ignore
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(pbs[0], "rb").read())
        rows = []
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    m = ev_meta[ev.metadata_id]
                    rows.append((ev.duration_ps / 1e6, m.name))
        agg = {}
        for dur, name in rows:
            agg[name] = agg.get(name, 0.0) + dur
        for dur, name in sorted(((v, k) for k, v in agg.items()),
                                reverse=True)[:40]:
            print(f"{dur:10.3f} us  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()

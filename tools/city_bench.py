"""KITTI-00-class synthetic long-sequence benchmark (VERDICT r2 next-#1).

Drives the FULL System (synchronous mapping ON, loop closure ON) over a
multi-hundred-metre rendered street circuit that revisits its start, and
reports the numbers that matter at map scale: tracked fraction, keyframe /
landmark counts, loops closed, metric SE3 ATE, steady-state frames/s, and
(optionally) a cProfile of where host time goes.

Frames are rendered once and cached under .cache/ as memmaps keyed by the
scene parameters, so repeat runs skip the renderer.

Usage:
  PYTHONPATH= JAX_PLATFORMS=cpu python tools/city_bench.py --frames 600
  python tools/city_bench.py --frames 4000 --straight 220   # TPU
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_M = 0.5          # stereo baseline (KITTI-class)


def build_scene(args):
    from openvslam_tpu.utils import synthetic
    rng = np.random.default_rng(args.seed)
    course = synthetic.RoundedRectCourse(
        straight_x=args.straight, straight_z=args.straight,
        corner_r=args.corner_r)
    scene = synthetic.CityCourseRenderer(
        rng, course, street_half_w=args.street_half_w, seg_len=8.0)
    poses = synthetic.course_trajectory(course, args.frames, laps=args.laps)
    return course, scene, poses


def cache_key(args) -> str:
    spec = (args.frames, args.straight, args.corner_r, args.street_half_w,
            args.laps, args.seed, args.rows, args.cols, args.fx, args.ss,
            "v2") + (("jax",) if args.render == "jax" else ())
    return hashlib.sha1(repr(spec).encode()).hexdigest()[:16]


def render_sequence(args, cam, scene, poses, cache_dir):
    """-> (left, right) uint8 memmaps of shape (N, rows, cols)."""
    os.makedirs(cache_dir, exist_ok=True)
    key = cache_key(args)
    paths = [os.path.join(cache_dir, f"city_{key}_{s}.npy")
             for s in ("L", "R")]
    if all(os.path.exists(p) for p in paths):
        return [np.load(p, mmap_mode="r") for p in paths]
    shift = np.eye(4)
    shift[0, 3] = -BASELINE_M
    n = len(poses)
    arrs = [np.lib.format.open_memmap(
        p + ".tmp", mode="w+", dtype=np.uint8,
        shape=(n, args.rows, args.cols)) for p in paths]
    t0 = time.time()
    if args.render == "jax":
        # jitted renderer (openvslam_tpu/utils/synthetic.py
        # render_sequence_jax): ~ms/frame on TPU, ~150 ms/frame on CPU,
        # vs ~2.6 s/frame for the numpy path at ss=2
        def _prog(done, total, view):
            el = time.time() - t0
            print(f"  render[{view}] {done}/{total} ({el:.0f}s)", flush=True)
        for vi, (arr, vposes) in enumerate(
                zip(arrs, (poses, [shift @ p for p in poses]))):
            arr[:] = scene.render_sequence_jax(
                cam, np.stack(vposes), ss=args.ss, batch=16,
                progress=lambda d, tot, v=("L", "R")[vi]:
                    (d % 800 == 0) and _prog(d, tot, v))
    else:
        for i in range(n):
            arrs[0][i] = scene.render(cam, poses[i], ss=args.ss)
            arrs[1][i] = scene.render(cam, shift @ poses[i], ss=args.ss)
            if i % 200 == 0:
                el = time.time() - t0
                eta = el / max(i, 1) * (n - i)
                print(f"  render {i}/{n} ({el:.0f}s, eta {eta:.0f}s)",
                      flush=True)
    for a, p in zip(arrs, paths):
        a.flush()
        del a
        os.replace(p + ".tmp", p)
    print(f"  rendered {n} stereo pairs in {time.time() - t0:.0f}s")
    return [np.load(p, mmap_mode="r") for p in paths]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--straight", type=float, default=220.0)
    ap.add_argument("--corner-r", type=float, default=20.0)
    ap.add_argument("--street-half-w", type=float, default=4.0)
    ap.add_argument("--laps", type=float, default=1.06)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--rows", type=int, default=240)
    ap.add_argument("--cols", type=int, default=320)
    ap.add_argument("--fx", type=float, default=260.0)
    ap.add_argument("--max-keypts", type=int, default=500)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--ss", type=int, default=2,
                    help="render supersampling factor (antialiasing)")
    ap.add_argument("--render", choices=("numpy", "jax"), default="numpy",
                    help="renderer backend for uncached sequences; 'jax' "
                         "runs the jitted renderer on the default backend "
                         "(distinct cache key)")
    ap.add_argument("--render-only", action="store_true",
                    help="populate the render cache and exit (no System)")
    ap.add_argument("--vocab", default=None,
                    help="vocabulary path; defaults to the large tree "
                         "asset when trained, else the built-in default")
    ap.add_argument("--profile", action="store_true",
                    help="cProfile the feed loop, print top host costs")
    ap.add_argument("--pipeline-depth", type=int, default=1,
                    help=">1 uses feed_sequence with this pipeline depth")
    ap.add_argument("--async-mapping", action="store_true")
    ap.add_argument("--seed-budget", type=int, default=0,
                    help="per-cell depth-seed coverage budget "
                         "(Mapping.seed_cell_budget; 0 = uncapped). "
                         "r5 A/B (1200-frame city probes): budget 8 alone "
                         "LOSES tracking at frame ~910 (leading edge "
                         "starved); with the seed_close_floor bypass it "
                         "tracks but cuts churn only 0.897->0.887 while "
                         "costing ATE 1.20->1.48 m and wall 248->337 s. "
                         "Capping remains a measured negative; uncapped "
                         "is the default.")
    ap.add_argument("--cache-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache"))
    ap.add_argument("--photometrics", action="store_true",
                    help="degraded-sensor stress: exposure random walk "
                         "(0.05/frame) + sigma-4 shot noise applied to "
                         "the cached render at feed time")
    ap.add_argument("--out", default=None, help="write the JSON report here")
    ap.add_argument("--limit", type=int, default=0,
                    help="feed only the first N frames of the cached render "
                         "(probe mode; cache key still uses --frames)")
    ap.add_argument("--stats-csv", default=None,
                    help="append per-frame `frame,state,num_tracked,kfs,lms`"
                         " rows here (loss diagnosis; classic path only)")
    args = ap.parse_args()

    from openvslam_tpu.config import Config
    from openvslam_tpu.system import System
    from openvslam_tpu.utils import evaluate
    from openvslam_tpu.utils.log import enable_console
    enable_console(debug=False)      # INFO: loss/reloc/loop events visible

    cfg = Config.from_dict({
        "Camera": {"name": "city-stereo", "setup": "stereo",
                   "model": "perspective",
                   "fx": args.fx, "fy": args.fx,
                   "cx": args.cols / 2, "cy": args.rows / 2,
                   "cols": args.cols, "rows": args.rows, "fps": 10,
                   "focal_x_baseline": args.fx * BASELINE_M,
                   "depth_threshold": 40.0},
        "Feature": {"max_num_keypts": args.max_keypts,
                    "num_levels": args.levels, "scale_factor": 1.2},
        "Mapping": {"seed_cell_budget": args.seed_budget},
        "LoopDetector": {"enabled": True, "min_continuity": 2},
    })
    cam = cfg.camera
    course, scene, poses_gt = build_scene(args)
    print(f"course: {course.length:.0f} m, {args.frames} frames x "
          f"{args.laps:.2f} laps = "
          f"{course.length * args.laps:.0f} m driven, "
          f"{course.length * args.laps / args.frames:.2f} m/frame")
    left, right = render_sequence(args, cam, scene, poses_gt, args.cache_dir)
    if args.render_only:
        print("render cache populated; exiting (--render-only)")
        return
    n_feed = min(args.limit, args.frames) if args.limit else args.frames
    if args.photometrics:
        # degraded-sensor variant (VERDICT r4 #6): exposure random walk +
        # shot noise + horizontal motion blur over the cached clean render.
        # Left/right get independent noise draws but correlated exposure
        # (one Photometrics instance per eye, same drift magnitude).
        # bounded exposure hunting + shot noise.  Calibration (measured on
        # this course): drift 0.05/frame random-walks to its dark clamp by
        # ~frame 220 and FAST starves (lost, 18 inliers); histogram
        # equalization makes it WORSE (noise amplification in flat
        # regions: lost at frame 41).  Drift 0.01/frame stays in the
        # realistic auto-exposure band over 4,000 frames; 3 px motion
        # blur additionally collapses this 0.27 m/frame course at
        # 320x240-class resolution — blur stress is covered separately by
        # tests/test_photometrics.py at the e2e harness scale.
        from openvslam_tpu.utils.synthetic import Photometrics
        prng = np.random.default_rng(args.seed + 101)
        pl = Photometrics(prng, exposure_drift=0.01, noise_sigma=4.0)
        pr = Photometrics(prng, exposure_drift=0.01, noise_sigma=4.0)
        left = np.stack([pl(f) for f in left[:n_feed]])
        right = np.stack([pr(f) for f in right[:n_feed]])

    vocab = args.vocab
    if vocab is None:
        tree = os.path.join(os.path.dirname(args.cache_dir), "assets",
                            "vocab_tree_k8L5.npz")
        vocab = tree if os.path.exists(tree) else "default"
    print(f"vocabulary: {vocab}")
    s = System(cfg, vocab_path=vocab, async_mapping=args.async_mapping)
    s.startup()
    prof = None
    if args.profile:
        import cProfile
        prof = cProfile.Profile()
        prof.enable()
    t0 = time.time()
    if args.pipeline_depth > 1:
        items = ((left[i], right[i], i / 10.0) for i in range(n_feed))
        for fi, _ in enumerate(s.feed_sequence(items, kind="stereo",
                                               depth=args.pipeline_depth)):
            if fi % 200 == 0:
                st = s.stats()
                print(f"  frame {fi}: state={st['state']} "
                      f"kfs={st['num_keyframes']} lms={st['num_landmarks']} "
                      f"loops={st['loops_closed']} "
                      f"({(time.time() - t0) / max(fi, 1) * 1000:.0f} ms/f)",
                      flush=True)
    else:
        stats_f = open(args.stats_csv, "w") if args.stats_csv else None
        for i in range(n_feed):
            s.feed_stereo_frame(left[i], right[i], i / 10.0)
            if stats_f is not None:
                print(f"{i},{s.tracker.state.name},{s.tracker.num_tracked},"
                      f"{s.map_db.n_kfs},{len(s.map_db.valid_lm_ids())}",
                      file=stats_f)
            if i % 200 == 0:
                st = s.stats()
                print(f"  frame {i}: state={st['state']} "
                      f"kfs={st['num_keyframes']} lms={st['num_landmarks']} "
                      f"loops={st['loops_closed']} "
                      f"({(time.time() - t0) / max(i, 1) * 1000:.0f} ms/f)",
                      flush=True)
    wall = time.time() - t0
    if prof is not None:
        prof.disable()
    s.shutdown()

    st = s.stats()
    ts, poses_est, mask = s.tracked_poses()
    ate_frames = float("nan")
    if mask.sum() > 10:
        e = np.stack([-p[:3, :3].T @ p[:3, 3]
                      for p in poses_est[mask]])
        g = np.stack([-poses_gt[i][:3, :3].T @ poses_gt[i][:3, 3]
                      for i in np.where(mask)[0]])
        ate_frames = float(evaluate.ate_rmse(e, g, align="se3"))
    # reference-parity composed trajectory: frame poses re-anchored to
    # their reference keyframe's FINAL pose (loop/BA corrections reach
    # frames fed before the closure) — the number the reference's
    # save_frame_trajectory would produce
    ate_composed = float("nan")
    _, poses_comp, maskc = s.composed_poses()
    if maskc.sum() > 10:
        e = np.stack([-p[:3, :3].T @ p[:3, 3] for p in poses_comp[maskc]])
        g = np.stack([-poses_gt[i][:3, :3].T @ poses_gt[i][:3, 3]
                      for i in np.where(maskc)[0]])
        ate_composed = float(evaluate.ate_rmse(e, g, align="se3"))
    db = s.map_db
    ids = db.valid_kf_ids()
    ek = np.stack([-db.kf_pose_cw[k][:3, :3].T @ db.kf_pose_cw[k][:3, 3]
                   for k in ids])
    gk = np.stack([-poses_gt[f][:3, :3].T @ poses_gt[f][:3, 3]
                   for f in db.kf_src_frame[ids]])
    ate_kf = float(evaluate.ate_rmse(ek, gk, align="se3"))

    # odometric drift breakdown, corner vs straight (VERDICT r4 #3c: where
    # does the sag build?).  Alignment-free relative-pose error over a
    # 10-frame window; frames classified by the GT yaw rate.
    def _drift_breakdown(window=10, corner_deg_per_frame=0.5):
        rows = {"straight": [], "corner": []}
        gt = np.stack(poses_gt[:n_feed])
        for i in range(n_feed - window):
            if not (mask[i] and mask[i + window]):
                continue
            D_e = poses_est[i + window] @ np.linalg.inv(poses_est[i])
            D_g = gt[i + window] @ np.linalg.inv(gt[i])
            E = D_e @ np.linalg.inv(D_g)
            ang = np.degrees(np.arccos(
                np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1)))
            terr = float(np.linalg.norm(E[:3, 3]))
            gang = np.degrees(np.arccos(
                np.clip((np.trace(D_g[:3, :3]) - 1) / 2, -1, 1)))
            kind = ("corner" if gang / window > corner_deg_per_frame
                    else "straight")
            rows[kind].append((ang / window, terr / window))
        out = {}
        for kind, v in rows.items():
            if v:
                a = np.array(v)
                out[kind] = {
                    "frames": len(v),
                    "mean_rot_deg_per_frame": round(float(a[:, 0].mean()), 4),
                    "mean_trans_m_per_frame": round(float(a[:, 1].mean()), 4),
                }
        return out

    tt = np.array(s.track_times)
    report = {
        "frames": n_feed,
        "photometrics": bool(args.photometrics),
        "course_m": round(course.length * args.laps * n_feed / args.frames, 1),
        "tracked_frac": round(float(mask.mean()), 4),
        "keyframes": st["num_keyframes"],
        "landmarks": st["num_landmarks"],
        "loops_closed": st["loops_closed"],
        "ate_se3_frames_m": round(ate_frames, 3),
        "ate_se3_frames_composed_m": round(ate_composed, 3),
        "ate_se3_keyframes_m": round(ate_kf, 3),
        "drift": _drift_breakdown(),
        "wall_s": round(wall, 1),
        "system_fps": round(n_feed / wall, 1),
        "median_track_ms": round(float(np.median(tt) * 1000), 2),
        "p90_track_ms": round(float(np.percentile(tt, 90) * 1000), 2),
        "p99_track_ms": round(float(np.percentile(tt, 99) * 1000), 2),
        "max_track_ms": round(float(tt.max() * 1000), 1),
        "overflow": st["overflow"],
        "lms_created": s.mapper.lms_created,
        "lms_culled": s.mapper.lms_culled,
        "cull_frac": round(s.mapper.lms_culled
                           / max(s.mapper.lms_created, 1), 3),
        "churn": {
            "created_seed": s.mapper.lms_created_seed,
            "created_tri": s.mapper.lms_created_tri,
            "seeds_skipped": s.mapper.seeds_skipped,
            "culled_ratio": s.mapper.culled_ratio,
            "culled_obs": s.mapper.culled_obs,
        },
        "mapper_phase_s": {k: round(v, 1)
                           for k, v in s.mapper.phase_s.items()},
        "stale_discards": st.get("stale_discards", 0),
        # feed-path backpressure + loop-worker observability (r5)
        "pace_waits": st.get("pace_waits", 0),
        "pace_wait_s": st.get("pace_wait_s", 0.0),
        "pace_wait_max_s": st.get("pace_wait_max_s", 0.0),
        "pace_timeouts": st.get("pace_timeouts", 0),
        "loop_stale_discards": st.get("loop_stale_discards", 0),
        "loop_checks_run": st.get("loop_checks_run", 0),
        "loop_cands_seen": st.get("loop_cands_seen", 0),
        "loop_validations": st.get("loop_validations", 0),
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    if prof is not None:
        import pstats
        ps = pstats.Stats(prof)
        ps.sort_stats("cumulative")
        print("\n--- host profile (top cumulative) ---")
        ps.print_stats(30)


if __name__ == "__main__":
    main()

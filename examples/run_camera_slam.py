"""Live-camera runner (ref example/run_camera_slam.cc): OpenCV capture
device fed in real time; pair with --viewer for the live web view."""
import time

from common import base_parser, build_system, finish, frame_gate, Timer


def main():
    p = base_parser("live camera SLAM")
    p.add_argument("-n", "--cam-num", type=int, default=0)
    p.add_argument("--max-frames", type=int, default=0,
                   help="stop after N frames (0 = until interrupted)")
    args = p.parse_args()
    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise SystemExit("run_camera_slam needs opencv-python") from e

    cfg, system = build_system(args)
    cap = cv2.VideoCapture(args.cam_num)
    if not cap.isOpened():
        raise SystemExit(f"cannot open camera {args.cam_num}")
    cap.set(cv2.CAP_PROP_FRAME_WIDTH, cfg.camera.cols)
    cap.set(cv2.CAP_PROP_FRAME_HEIGHT, cfg.camera.rows)
    times = []
    n = 0
    try:
        while not args.max_frames or n < args.max_frames:
            if not frame_gate(system):
                break
            ok, frame = cap.read()
            if not ok:
                break
            if frame.ndim == 3:
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            with Timer() as t:
                system.feed_monocular_frame(frame, time.time())
            times.append(t.dt)
            n += 1
    except KeyboardInterrupt:
        pass
    cap.release()
    finish(args, system, times)


if __name__ == "__main__":
    main()

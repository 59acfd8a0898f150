"""Live-camera runner (ref example/run_camera_slam.cc): OpenCV capture
device fed in real time; pair with --viewer for the live web view."""
import time

from common import base_parser, build_system, feed_loop, finish


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

    def items():
        n = 0
        while not args.max_frames or n < args.max_frames:
            ok, frame = cap.read()
            if not ok:
                return
            if frame.ndim == 3:
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            yield frame, time.time()
            n += 1
    try:
        times = feed_loop(args, system, items(), "monocular")
    except KeyboardInterrupt:
        times = system.track_times
    cap.release()
    finish(args, system, times)


if __name__ == "__main__":
    main()

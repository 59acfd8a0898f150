"""Video-file runner (ref example/run_video_slam.cc): decodes a video with
OpenCV and feeds frames at their timestamps.  Localization mode via
--map-db-in.  Requires opencv-python (baked in this image)."""
from common import base_parser, build_system, finish, frame_gate, Timer


def main():
    p = base_parser("video SLAM")
    p.add_argument("-m", "--video", required=True, help="video file path")
    p.add_argument("--start-time", type=float, default=0.0)
    args = p.parse_args()
    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise SystemExit("run_video_slam needs opencv-python") from e

    cfg, system = build_system(args)
    cap = cv2.VideoCapture(args.video)
    if not cap.isOpened():
        raise SystemExit(f"cannot open {args.video}")
    fps = cap.get(cv2.CAP_PROP_FPS) or cfg.camera.fps
    times = []
    i = -1
    while True:
        if not frame_gate(system):
            break
        ok, frame = cap.read()
        if not ok:
            break
        i += 1
        if i % args.frame_skip:
            continue
        ts = args.start_time + i / fps
        if frame.ndim == 3:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        with Timer() as t:
            system.feed_monocular_frame(frame, ts)
        times.append(t.dt)
    cap.release()
    finish(args, system, times)


if __name__ == "__main__":
    main()

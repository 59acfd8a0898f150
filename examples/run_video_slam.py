"""Video-file runner (ref example/run_video_slam.cc): decodes a video with
OpenCV and feeds frames at their timestamps.  Localization mode via
--map-db-in.  Requires opencv-python (baked in this image)."""
from common import base_parser, build_system, feed_loop, finish


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

    def items():
        i = -1
        while True:
            ok, frame = cap.read()
            if not ok:
                return
            i += 1
            if i % args.frame_skip:
                continue
            if frame.ndim == 3:
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            yield frame, args.start_time + i / fps
    times = feed_loop(args, system, items(), "monocular")
    cap.release()
    finish(args, system, times)


if __name__ == "__main__":
    main()

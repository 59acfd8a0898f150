"""Image-directory runner (ref example/run_image_slam.cc): globs a directory
of images fed at the config fps.  Localization mode via --map-db-in."""
import glob
import os

from common import base_parser, build_system, feed_loop, finish


def main():
    p = base_parser("image-sequence SLAM")
    p.add_argument("-i", "--image-dir", required=True)
    p.add_argument("--ext", default="png")
    args = p.parse_args()
    cfg, system = build_system(args)

    from openvslam_tpu.utils.datasets import _imread_gray

    files = sorted(glob.glob(os.path.join(args.image_dir, f"*.{args.ext}")))
    fps = cfg.camera.fps
    items = ((_imread_gray(files[i]), i / fps)
             for i in range(0, len(files), args.frame_skip))
    times = feed_loop(args, system, items, "monocular")
    finish(args, system, times)


if __name__ == "__main__":
    main()

"""TUM RGB-D runner (ref example/run_tum_rgbd_slam.cc): monocular or RGBD
depending on the config's Camera.setup."""
from common import base_parser, build_system, feed_loop, finish


def main():
    p = base_parser("TUM RGB-D SLAM")
    p.add_argument("-d", "--data-dir", required=True)
    args = p.parse_args()
    cfg, system = build_system(args)

    from openvslam_tpu.camera.base import SetupType
    from openvslam_tpu.utils.datasets import TumRgbdSequence

    seq = TumRgbdSequence(args.data_dir)
    rgbd = cfg.camera.setup == SetupType.RGBD
    if rgbd and len(seq) and seq[0][2] is None:
        print("WARNING: RGBD config but no depth maps found — "
              "feeding monocular")
        rgbd = False

    def items():
        for i in range(0, len(seq), args.frame_skip):
            ts, img, depth = seq[i]
            if rgbd and depth is None:
                continue        # unpaired frame (rare); skip with depth gone
            yield (img, depth, ts) if rgbd else (img, ts)
    times = feed_loop(args, system, items(),
                      "rgbd" if rgbd else "monocular")
    finish(args, system, times)


if __name__ == "__main__":
    main()

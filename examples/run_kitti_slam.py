"""KITTI odometry runner (ref example/run_kitti_slam.cc): stereo or mono."""
from common import base_parser, build_system, feed_loop, finish


def main():
    p = base_parser("KITTI odometry SLAM")
    p.add_argument("-d", "--data-dir", required=True,
                   help="sequence dir containing image_0[,image_1], times.txt")
    args = p.parse_args()
    cfg, system = build_system(args)

    from openvslam_tpu.camera.base import SetupType
    from openvslam_tpu.utils.datasets import KittiOdometrySequence

    stereo = cfg.camera.setup == SetupType.STEREO
    seq = KittiOdometrySequence(args.data_dir, stereo=stereo)

    def items():
        for i in range(0, len(seq), args.frame_skip):
            ts, left, right = seq[i]
            if stereo and right is not None:
                yield left, right, ts
            elif not stereo:
                yield left, ts
    times = feed_loop(args, system, items(),
                      "stereo" if stereo else "monocular")
    finish(args, system, times)


if __name__ == "__main__":
    main()

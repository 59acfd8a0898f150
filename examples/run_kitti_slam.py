"""KITTI odometry runner (ref example/run_kitti_slam.cc): stereo or mono."""
from common import base_parser, build_system, finish, frame_gate, Timer


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
    times = []
    for i in range(0, len(seq), args.frame_skip):
        if not frame_gate(system):
            break
        ts, left, right = seq[i]
        with Timer() as t:
            if stereo and right is not None:
                system.feed_stereo_frame(left, right, ts)
            else:
                system.feed_monocular_frame(left, ts)
        times.append(t.dt)
    finish(args, system, times)


if __name__ == "__main__":
    main()

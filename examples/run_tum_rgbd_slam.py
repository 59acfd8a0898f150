"""TUM RGB-D runner (ref example/run_tum_rgbd_slam.cc): monocular or RGBD
depending on the config's Camera.setup."""
from common import base_parser, build_system, finish, frame_gate, Timer


def main():
    p = base_parser("TUM RGB-D SLAM")
    p.add_argument("-d", "--data-dir", required=True)
    args = p.parse_args()
    cfg, system = build_system(args)

    from openvslam_tpu.camera.base import SetupType
    from openvslam_tpu.utils.datasets import TumRgbdSequence

    seq = TumRgbdSequence(args.data_dir)
    rgbd = cfg.camera.setup == SetupType.RGBD
    times = []
    for i in range(0, len(seq), args.frame_skip):
        if not frame_gate(system):
            break
        ts, img, depth = seq[i]
        with Timer() as t:
            if rgbd and depth is not None:
                system.feed_RGBD_frame(img, depth, ts)
            else:
                system.feed_monocular_frame(img, ts)
        times.append(t.dt)
    finish(args, system, times)


if __name__ == "__main__":
    main()

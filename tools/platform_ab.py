"""Frontend platform-determinism A/B (r3 verdict missing #2 / next-#1).

Dump mode: run the ORB frontend over cached city-bench frames on WHATEVER
backend this process gets, and save keypoints/descriptors:

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/platform_ab.py \
        --dump /tmp/ab_cpu.npz --frames 2200 2210 2300
    python tools/platform_ab.py --dump /tmp/ab_tpu.npz --frames 2200 2210 2300

Compare mode (CPU env is fine):

    python tools/platform_ab.py --compare /tmp/ab_cpu.npz /tmp/ab_tpu.npz

Reports per frame: keypoint-set agreement, FAST response deltas, descriptor
bit agreement on shared keypoints.  With the integer-valued pyramid/blur
(ops.pyramid), the expectation is bit-identical output across backends.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# default: the 4000-frame city-bench cache (tools/city_bench.py, laps=1.05)
DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache", "city_b6f4922d92894830_L.npy")


def dump(path, frame_ids, cache, max_keypts, levels):
    import jax
    import jax.numpy as jnp
    from openvslam_tpu.models.frontend import OrbFrontend

    frames = np.load(cache, mmap_mode="r")
    rows, cols = frames.shape[1:]
    fe = OrbFrontend(rows, cols, max_keypts=max_keypts, num_levels=levels)
    out = {"backend": np.array(jax.default_backend()),
           "frame_ids": np.asarray(frame_ids)}
    for fi in frame_ids:
        kp = fe.extract(jnp.asarray(frames[fi]))
        out[f"xy_{fi}"] = np.asarray(kp.xy)
        out[f"resp_{fi}"] = np.asarray(kp.response)
        out[f"level_{fi}"] = np.asarray(kp.level)
        out[f"angle_{fi}"] = np.asarray(kp.angle)
        out[f"desc_{fi}"] = np.asarray(kp.desc_u32)
        out[f"valid_{fi}"] = np.asarray(kp.valid)
        print(f"frame {fi}: {int(np.asarray(kp.valid).sum())} keypoints "
              f"on {jax.default_backend()}", flush=True)
    np.savez_compressed(path, **out)
    print(f"dumped -> {path}")


def compare(a_path, b_path):
    a = np.load(a_path)
    b = np.load(b_path)
    print(f"A={a['backend']}  B={b['backend']}")
    ok_all = True
    for fi in a["frame_ids"]:
        va, vb = a[f"valid_{fi}"], b[f"valid_{fi}"]
        n_a, n_b = int(va.sum()), int(vb.sum())
        same_valid = bool((va == vb).all())
        xy_a, xy_b = a[f"xy_{fi}"], b[f"xy_{fi}"]
        both = va & vb
        dxy = np.abs(xy_a[both] - xy_b[both]).max() if both.any() else 0.0
        dresp = np.abs(a[f"resp_{fi}"][both]
                       - b[f"resp_{fi}"][both]).max() if both.any() else 0.0
        dang = np.abs(a[f"angle_{fi}"][both]
                      - b[f"angle_{fi}"][both]).max() if both.any() else 0.0
        da, db_ = a[f"desc_{fi}"][both], b[f"desc_{fi}"][both]
        xor = np.bitwise_xor(da, db_)
        bitdiff = int(np.unpackbits(
            xor.view(np.uint8), axis=-1).sum()) if both.any() else 0
        bits_total = max(int(both.sum()) * 256, 1)
        agree = 1.0 - bitdiff / bits_total
        ident = (same_valid and dxy == 0.0 and dresp == 0.0
                 and bitdiff == 0)
        ok_all &= ident
        print(f"frame {fi}: kpts {n_a}/{n_b} same_valid={same_valid} "
              f"max|dxy|={dxy:.4g} max|dresp|={dresp:.4g} "
              f"max|dangle|={dang:.4g} desc_bit_agree={agree:.6f} "
              f"{'IDENTICAL' if ident else 'DIFFERS'}")
    print("RESULT:", "BIT-IDENTICAL" if ok_all else "PLATFORM DIVERGENCE")
    return 0 if ok_all else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", default=None)
    ap.add_argument("--compare", nargs=2, default=None)
    ap.add_argument("--frames", type=int, nargs="+",
                    default=[0, 1000, 2200, 2210, 2300])
    ap.add_argument("--cache", default=DEFAULT_CACHE)
    ap.add_argument("--max-keypts", type=int, default=800)
    ap.add_argument("--levels", type=int, default=3)
    args = ap.parse_args()
    if args.compare:
        sys.exit(compare(*args.compare))
    if args.dump:
        dump(args.dump, args.frames, args.cache, args.max_keypts,
             args.levels)
        return
    ap.error("need --dump or --compare")


if __name__ == "__main__":
    main()

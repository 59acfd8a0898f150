"""Dataset loaders for the reference's evaluation suites (ref ``example/util/
{tum_rgbd,euroc,kitti}_util``): directory layouts -> (timestamps, image paths).

Images are loaded lazily as grayscale uint8 numpy arrays.  PNG/PGM/JPG decode
uses imageio if present, else a minimal PGM reader (KITTI grayscale is PNG —
decode falls back to opencv ONLY here, in the data-loading harness, never in
the compute pipeline).
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np


def _imread_gray(path: str) -> np.ndarray:
    if path.endswith((".pgm", ".PGM")):
        with open(path, "rb") as f:
            magic = f.readline().strip()
            line = f.readline()
            while line.startswith(b"#"):
                line = f.readline()
            w, h = map(int, line.split())
            maxv = int(f.readline())
            data = np.frombuffer(f.read(), np.uint8 if maxv < 256 else ">u2")
            img = data.reshape(h, w)
            return (img if maxv < 256 else (img / 257).astype(np.uint8))
    try:
        import imageio.v3 as iio
        img = iio.imread(path)
    except Exception:
        import cv2  # test/data harness only — never in the compute pipeline
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is not None and img.ndim == 3:
            img = img[..., ::-1]
    if img.ndim == 3:
        img = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    if img.dtype != np.uint8:
        if img.max() > 255:
            img = img / 256.0
        img = img.astype(np.uint8)
    return img


def load_depth_png(path: str, factor: float = 5000.0) -> np.ndarray:
    """16-bit depth PNG -> float32 metres (TUM convention: /5000)."""
    try:
        import imageio.v3 as iio
        d = iio.imread(path)
    except Exception:
        import cv2
        d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    return d.astype(np.float32) / factor


class TumRgbdSequence:
    """TUM RGB-D: rgb.txt / depth.txt (+ groundtruth.txt), association by
    nearest timestamp (ref example/util/tum_rgbd_util)."""

    def __init__(self, root: str, max_diff: float = 0.02):
        self.root = root
        self.rgb = self._read_list(os.path.join(root, "rgb.txt"))
        depth_file = os.path.join(root, "depth.txt")
        self.depth = self._read_list(depth_file) if os.path.exists(depth_file) else []
        self.pairs: List[Tuple[float, str, Optional[str]]] = []
        if self.depth:
            from .evaluate import associate_timestamps
            ts_r = [t for t, _ in self.rgb]
            ts_d = [t for t, _ in self.depth]
            for ir, idd in associate_timestamps(ts_r, ts_d, max_diff):
                self.pairs.append(
                    (self.rgb[ir][0], self.rgb[ir][1], self.depth[idd][1])
                )
        else:
            self.pairs = [(t, p, None) for t, p in self.rgb]

    def _read_list(self, path: str):
        out = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ts, rel = line.split()[:2]
                out.append((float(ts), os.path.join(self.root, rel)))
        return out

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i):
        ts, rgb, depth = self.pairs[i]
        img = _imread_gray(rgb)
        d = load_depth_png(depth) if depth else None
        return ts, img, d


class EurocSequence:
    """EuRoC MAV: mav0/cam{0,1}/data.csv + data/*.png (ref euroc_util)."""

    def __init__(self, root: str, stereo: bool = True):
        self.root = root
        self.cam0 = self._read_cam(os.path.join(root, "mav0", "cam0"))
        self.cam1 = self._read_cam(os.path.join(root, "mav0", "cam1")) if stereo else []
        if self.cam1:
            n = min(len(self.cam0), len(self.cam1))
            self.cam0, self.cam1 = self.cam0[:n], self.cam1[:n]

    def _read_cam(self, cam_dir: str):
        out = []
        csv = os.path.join(cam_dir, "data.csv")
        if not os.path.exists(csv):
            return out
        with open(csv) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ts_ns, fname = line.split(",")[:2]
                out.append((int(ts_ns) * 1e-9,
                            os.path.join(cam_dir, "data", fname.strip())))
        return out

    def __len__(self):
        return len(self.cam0)

    def __getitem__(self, i):
        ts, p0 = self.cam0[i]
        left = _imread_gray(p0)
        right = _imread_gray(self.cam1[i][1]) if self.cam1 else None
        return ts, left, right


class KittiOdometrySequence:
    """KITTI odometry: image_0/ image_1/ %06d.png + times.txt (ref kitti_util)."""

    def __init__(self, root: str, stereo: bool = True):
        self.root = root
        with open(os.path.join(root, "times.txt")) as f:
            self.times = [float(x) for x in f.read().split()]
        self.left_dir = os.path.join(root, "image_0")
        self.right_dir = os.path.join(root, "image_1") if stereo else None

    def __len__(self):
        return len(self.times)

    def __getitem__(self, i):
        name = f"{i:06d}.png"
        left = _imread_gray(os.path.join(self.left_dir, name))
        right = (
            _imread_gray(os.path.join(self.right_dir, name))
            if self.right_dir and os.path.isdir(self.right_dir) else None
        )
        return self.times[i], left, right

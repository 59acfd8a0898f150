"""Per-frame container (ref ``data/frame``): fixed-capacity keypoint SoA +
bearings + landmark associations + pose.

Numeric columns live as numpy on the host (uploaded per jitted call);
`from_keypoints` derives undistorted coords and bearings once per frame.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class Frame:
    frame_id: int
    timestamp: float
    # keypoint SoA (capacity K)
    xy: np.ndarray           # (K,2) raw pixel coords (level-0 scale)
    xy_undist: np.ndarray    # (K,2) undistorted pixel coords
    bearing: np.ndarray      # (K,3) unit bearings
    level: np.ndarray        # (K,) i32
    angle: np.ndarray        # (K,) f32
    response: np.ndarray     # (K,)
    desc_u32: np.ndarray     # (K,8) packed descriptors
    desc_i8: np.ndarray      # (K,256) unpacked bits
    valid: np.ndarray        # (K,) bool
    # stereo / RGBD (x_right < 0 means monocular observation)
    x_right: np.ndarray      # (K,)
    depth: np.ndarray        # (K,)
    # landmark association (-1 = none) and outlier flags
    lm_idx: np.ndarray       # (K,) i32
    outlier: np.ndarray      # (K,) bool
    # pose cam<-world (None until tracked)
    pose_cw: Optional[np.ndarray] = None

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]

    @property
    def num_valid(self) -> int:
        return int(self.valid.sum())

    @classmethod
    def from_keypoints(cls, frame_id, timestamp, kp, cam,
                       x_right=None, depth=None):
        """kp: models.frontend.Keypoints (device arrays)."""
        xy = np.asarray(kp.xy)
        valid = np.asarray(kp.valid)
        und = np.asarray(cam.undistort_keypoints(kp.xy))
        brg = np.asarray(cam.keypoints_to_bearings(kp.xy))
        K = xy.shape[0]
        return cls(
            frame_id=frame_id,
            timestamp=timestamp,
            xy=xy,
            xy_undist=und,
            bearing=brg,
            level=np.asarray(kp.level),
            angle=np.asarray(kp.angle),
            response=np.asarray(kp.response),
            desc_u32=np.asarray(kp.desc_u32),
            desc_i8=np.asarray(kp.desc_i8),
            valid=valid,
            x_right=np.full(K, -1.0, np.float32) if x_right is None else np.asarray(x_right),
            depth=np.full(K, -1.0, np.float32) if depth is None else np.asarray(depth),
            lm_idx=np.full(K, -1, np.int32),
            outlier=np.zeros(K, bool),
        )

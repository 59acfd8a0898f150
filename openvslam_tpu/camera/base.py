"""Camera base definitions and the factory from a (reference-schema) config dict."""
from __future__ import annotations

import enum
from typing import Any, Mapping


class SetupType(enum.Enum):
    MONOCULAR = "monocular"
    STEREO = "stereo"
    RGBD = "rgbd"


class ModelType(enum.Enum):
    PERSPECTIVE = "perspective"
    FISHEYE = "fisheye"
    EQUIRECTANGULAR = "equirectangular"


class CameraBase:
    """Interface contract (duck-typed; each model is a flax struct).

    Required methods (all pure, batched over leading dims of keypoints):
      undistort_keypoints(kpts (...,2)) -> (...,2)
      keypoints_to_bearings(kpts (...,2)) -> (...,3) unit bearings
      bearings_to_keypoints(brg (...,3)) -> (...,2)
      project(pts_cam (...,3)) -> (uv (...,2), depth (...), valid (...))
          where `valid` = in image bounds and (for non-360 models) z > 0.
    Required attributes: cols, rows, setup (SetupType), fps,
      focal_x_baseline (stereo/RGBD; 0 for mono), depth_threshold.
    """


def make_camera_from_config(cam_cfg: Mapping[str, Any]):
    """Build a camera from the reference's `Camera:` YAML section.

    Schema matches the reference config keys (SURVEY.md §2.1 Config row):
    name, setup, model, fx/fy/cx/cy, k1..k3/p1/p2 (perspective),
    k1..k4 (fisheye), fps, cols, rows, color_order, focal_x_baseline,
    depth_threshold / depthmap_factor.
    """
    from .perspective import Perspective
    from .fisheye import Fisheye
    from .equirectangular import Equirectangular

    model = cam_cfg.get("model", "perspective")
    setup = SetupType(cam_cfg.get("setup", "monocular").lower())
    cols = int(cam_cfg["cols"])
    rows = int(cam_cfg["rows"])
    fps = float(cam_cfg.get("fps", 30.0))
    fxb = float(cam_cfg.get("focal_x_baseline", 0.0))
    depth_thr = float(cam_cfg.get("depth_threshold", 40.0))

    if model == "perspective":
        return Perspective.create(
            fx=float(cam_cfg["fx"]),
            fy=float(cam_cfg["fy"]),
            cx=float(cam_cfg["cx"]),
            cy=float(cam_cfg["cy"]),
            k1=float(cam_cfg.get("k1", 0.0)),
            k2=float(cam_cfg.get("k2", 0.0)),
            p1=float(cam_cfg.get("p1", 0.0)),
            p2=float(cam_cfg.get("p2", 0.0)),
            k3=float(cam_cfg.get("k3", 0.0)),
            cols=cols,
            rows=rows,
            fps=fps,
            setup=setup,
            focal_x_baseline=fxb,
            depth_threshold=depth_thr,
        )
    if model == "fisheye":
        return Fisheye.create(
            fx=float(cam_cfg["fx"]),
            fy=float(cam_cfg["fy"]),
            cx=float(cam_cfg["cx"]),
            cy=float(cam_cfg["cy"]),
            k1=float(cam_cfg.get("k1", 0.0)),
            k2=float(cam_cfg.get("k2", 0.0)),
            k3=float(cam_cfg.get("k3", 0.0)),
            k4=float(cam_cfg.get("k4", 0.0)),
            cols=cols,
            rows=rows,
            fps=fps,
            setup=setup,
            focal_x_baseline=fxb,
            depth_threshold=depth_thr,
        )
    if model == "equirectangular":
        return Equirectangular.create(cols=cols, rows=rows, fps=fps)
    raise ValueError(f"unknown camera model: {model}")


def camera_to_config(cam) -> dict:
    """Inverse of make_camera_from_config: a serializable spec dict (used by
    the camera database, ref ``data/camera_database``)."""
    model = getattr(cam, "model_name", "perspective")
    spec = {
        "model": model,
        "setup": cam.setup.value,
        "cols": int(cam.cols),
        "rows": int(cam.rows),
        "fps": float(cam.fps),
        "focal_x_baseline": float(getattr(cam, "focal_x_baseline", 0.0)),
        "depth_threshold": float(getattr(cam, "depth_threshold", 40.0)),
    }
    for k in ("fx", "fy", "cx", "cy", "k1", "k2", "p1", "p2", "k3", "k4"):
        if hasattr(cam, k):
            spec[k] = float(getattr(cam, k))
    return spec

"""Batched, functional camera models (reference layer L2, ``src/openvslam/camera/``).

The reference exposes a virtual ``camera::base`` with ``undistort_keypoints``,
``convert_keypoints_to_bearings``, ``reproject_to_image``, ``reproject_to_bearing``
(SURVEY.md §2.1).  Here each model is a frozen flax struct with pure batched
functions; model dispatch is static (the model is fixed for a run, so there is
no virtual dispatch inside jit).
"""
from .base import CameraBase, SetupType, ModelType, make_camera_from_config
from .perspective import Perspective
from .fisheye import Fisheye
from .equirectangular import Equirectangular

__all__ = [
    "CameraBase",
    "SetupType",
    "ModelType",
    "Perspective",
    "Fisheye",
    "Equirectangular",
    "make_camera_from_config",
]

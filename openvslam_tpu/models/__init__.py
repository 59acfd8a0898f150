"""Jitted end-to-end frame pipelines — the "model" layer.

`frontend.OrbFrontend` is the flagship per-frame model: image -> pyramid ->
FAST -> grid top-k -> IC-angle -> blur -> rBRIEF -> fixed-capacity keypoint
SoA, all in one jitted program per image geometry.
"""

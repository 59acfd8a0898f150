"""L4 map data layer: host-side SoA bookkeeping with device-mirrorable arrays.

The reference's ``data/`` (frame, keyframe, landmark, map_database,
bow_database, graph_node) is pointer-linked C++ guarded by mutexes.  The
TPU-native design splits it: fixed-capacity numpy SoA + python dict graph
structure on the host (ids instead of pointers), with the numeric columns
(positions, descriptors, poses) shaped so slices upload to the device
without repacking.
"""
from .frame import Frame
from .map_database import MapDatabase

__all__ = ["Frame", "MapDatabase"]

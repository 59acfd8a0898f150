"""Multi-chip scaling: sharded map + distributed bundle adjustment.

The reference is single-process (SURVEY.md §2.3 — no distributed backend);
multi-host capability is specified by BASELINE.json's north star: partition
keyframe/landmark blocks over devices and solve BA via Schur-complement
reduction of the landmark block with XLA collectives over ICI/DCN.
"""
from .mesh import make_mesh
from .distributed_ba import make_distributed_ba, ShardedBAProblem
from .multi_session import MultiSessionRunner

__all__ = [
    "make_mesh", "make_distributed_ba", "ShardedBAProblem",
    "MultiSessionRunner",
]

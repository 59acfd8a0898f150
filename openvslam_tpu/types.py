"""Core typedefs and static capacity constants.

The reference keeps dynamic containers (``std::vector<cv::KeyPoint>``,
``std::map<keyframe*, idx>``; see SURVEY.md §2.1 frame/landmark rows).  A
TPU-native design replaces every dynamic container with a fixed-capacity
structure-of-arrays plus a validity mask so that every jitted program has
static shapes.  The capacities below are the global knobs; all device code
must take sizes from here (or from a Config) rather than inventing its own.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# dtypes
# ---------------------------------------------------------------------------
F = jnp.float32          # geometry runs in f32 (poses, points, residuals)
BF = jnp.bfloat16        # MXU matmuls where precision allows
I = jnp.int32
U8 = jnp.uint8
U32 = jnp.uint32

# ---------------------------------------------------------------------------
# Static capacities (see SURVEY.md §7 "Design stance")
# ---------------------------------------------------------------------------
MAX_KEYPTS = 2048        # per frame across all pyramid levels
NUM_LEVELS = 8           # ORB pyramid levels (reference default)
SCALE_FACTOR = 1.2       # ORB pyramid scale (reference default)
DESC_BITS = 256          # rBRIEF bits
DESC_WORDS = DESC_BITS // 32   # packed u32 words per descriptor

MAX_LOCAL_KFS = 64       # local-map keyframe window cap (ref caps ~60)
MAX_LOCAL_LMS = 16384    # local-map landmark cap

# Bundle-adjustment problem buckets (padded sizes to bound recompiles)
BA_MAX_CAMS = 64         # local BA: opt + fixed cameras
BA_MAX_LMS = 8192
BA_MAX_OBS = 32768

# chi^2 thresholds at 95% (reference values; SURVEY.md §2.1 pose optimizer)
CHI2_2D = 5.991
CHI2_3D = 7.815


@dataclasses.dataclass(frozen=True)
class Limits:
    """Per-run capacity overrides (a Config owns one)."""
    max_keypts: int = MAX_KEYPTS
    num_levels: int = NUM_LEVELS
    scale_factor: float = SCALE_FACTOR
    max_local_kfs: int = MAX_LOCAL_KFS
    max_local_lms: int = MAX_LOCAL_LMS
    ba_max_cams: int = BA_MAX_CAMS
    ba_max_lms: int = BA_MAX_LMS
    ba_max_obs: int = BA_MAX_OBS


def tree_fields(obj: Any):
    return {f.name: getattr(obj, f.name) for f in dataclasses.fields(obj)}

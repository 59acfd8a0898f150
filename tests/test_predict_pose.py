"""Damped lead-N motion prediction (tracking_module._predict_pose).

r3 measured the pipelined feed collapsing on ROTATING trajectories at
depth>=2 (stereo room-lap ATE 0.08 -> 1.67 m): the raw lead-frame
displacement amplifies pose-estimation noise ~2x into the prediction, and
the prediction->match->estimate feedback loop diverges under sustained yaw.
The damped form averages the twist over W = 2*lead frames in SE3 log space
and scales to lead (exact for constant-twist motion; ~half the noise gain).
These tests pin both properties with pure numpy (no System, no jit).
"""
import collections
import types

import numpy as np
import pytest

from openvslam_tpu.module.tracking_module import (
    TrackingModule, _se3_exp, _se3_log)

pytestmark = pytest.mark.smoke


def _turning_poses(n, yaw_per_frame=np.deg2rad(2.0), step=0.3):
    """Constant-twist (steady turn) camera trajectory -> list of T_cw."""
    xi = np.concatenate([[0.0, yaw_per_frame, 0.0], [step, 0.0, 0.02]])
    D = _se3_exp(xi)
    T = np.eye(4)
    out = []
    for _ in range(n):
        out.append(T.copy())
        T = D @ T
    return out


def _tracker_stub(poses, upto):
    """TrackingModule shell holding a pose history ending at frame `upto`."""
    tm = TrackingModule.__new__(TrackingModule)
    tm._pose_hist = collections.deque(
        [(i, poses[i].astype(np.float32)) for i in range(upto + 1)], maxlen=64)
    tm.velocity = (poses[upto] @ np.linalg.inv(poses[upto - 1])).astype(
        np.float32)
    tm.pred_hist_misses = 0
    lf = types.SimpleNamespace(frame_id=upto,
                               pose_cw=poses[upto].astype(np.float32))
    return tm, lf


def _err(Ta, Tb):
    xi = _se3_log(np.linalg.inv(Ta.astype(np.float64)) @ Tb)
    return np.linalg.norm(xi)


def test_constant_twist_exact():
    """On noiseless steady-turn motion the damped prediction is exact for
    every lead (the W=2*lead window averages a constant twist)."""
    poses = _turning_poses(30)
    for lead in (1, 2, 3, 4):
        tm, lf = _tracker_stub(poses, 20)
        T_pred = tm._predict_pose(lf, lead)
        assert _err(T_pred, poses[20 + lead]) < 1e-4, lead


def test_rotation_noise_damping():
    """With noisy pose estimates, the damped prediction beats the raw
    lead-displacement prediction on average (the r3 divergence driver)."""
    rng = np.random.default_rng(3)
    poses = _turning_poses(40)
    lead = 3
    gains = []
    for _ in range(60):
        noisy = []
        for T in poses:
            d = np.concatenate([rng.normal(0, 2e-3, 3),
                                rng.normal(0, 6e-3, 3)])
            noisy.append((_se3_exp(d) @ T))
        up = 24
        tm, lf = _tracker_stub(noisy, up)
        T_damped = tm._predict_pose(lf, lead)
        # raw lead-N displacement (the pre-damping formulation)
        D = noisy[up] @ np.linalg.inv(noisy[up - lead])
        T_raw = D @ noisy[up]
        gains.append(_err(T_raw, poses[up + lead])
                     - _err(T_damped, poses[up + lead]))
    # damped must win on average and not lose catastrophically
    assert np.mean(gains) > 0, np.mean(gains)
    assert np.median(gains) > 0


def test_window_fallback_equals_raw():
    """With history only `lead` deep, the damped path degrades to the raw
    lead-displacement (W == lead) — no behavior change for short histories."""
    poses = _turning_poses(10)
    lead = 3
    tm, lf = _tracker_stub(poses, 5)
    # truncate history to exactly lead frames back
    tm._pose_hist = collections.deque(
        [(i, poses[i].astype(np.float32)) for i in range(2, 6)], maxlen=64)
    T_pred = tm._predict_pose(lf, lead)
    D = poses[5] @ np.linalg.inv(poses[2])
    T_raw = (D @ poses[5]).astype(np.float32)
    assert np.abs(T_pred - T_raw).max() < 1e-5

"""Distributed BA on the 8-virtual-device CPU mesh (SURVEY.md §4 multi-node
testing strategy): same problem, 1-shard vs 8-shard results must agree."""
import jax
import numpy as np
import pytest

from openvslam_tpu.parallel import make_mesh, make_distributed_ba
from openvslam_tpu.parallel.distributed_ba import partition_problem
from test_ba import _build_problem, _pose_errors


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_distributed_matches_single(rng):
    cam, prob, T_true, X_true, n_cams, n_lms = _build_problem(rng, L=512, O=4096)

    mesh1 = make_mesh(1)
    mesh8 = make_mesh(8)
    ba1 = make_distributed_ba(cam, mesh1, iters=10)
    ba8 = make_distributed_ba(cam, mesh8, iters=10)

    p1 = partition_problem(prob, 1)
    p8 = partition_problem(prob, 8)
    T1, X1, c1 = ba1(p1)
    T8, X8, c8 = ba8(p8)

    # both converge to the true poses
    e1 = _pose_errors(np.asarray(T1), T_true, n_cams)
    e8 = _pose_errors(np.asarray(T8), T_true, n_cams)
    assert e1.max() < 0.02, e1
    assert e8.max() < 0.02, e8
    # and to (nearly) the same solution: cost agreement
    assert abs(float(c1) - float(c8)) / max(float(c1), 1e-9) < 0.05


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_distributed_ba_converges_noiseless(rng):
    cam, prob, T_true, X_true, n_cams, n_lms = _build_problem(
        rng, L=512, O=4096, noise_px=0.0
    )
    mesh = make_mesh(8)
    ba = make_distributed_ba(cam, mesh, iters=12)
    p = partition_problem(prob, 8)
    T, X, cost = ba(p)
    errs = _pose_errors(np.asarray(T), T_true, n_cams)
    assert errs.max() < 1e-3, errs

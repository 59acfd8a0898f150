"""Multi-host distributed BA: 2 real OS processes x 4 virtual CPU devices
joined via jax.distributed.initialize into one 8-device mesh, solving the
sharded-Schur BA with psums that CROSS the process boundary (gloo = the DCN
stand-in).  SURVEY.md §4's prescription for testing multi-node without a
cluster; BASELINE north star "N>=2 hosts".

The parent asserts the 2-process solution matches the single-process
8-virtual-device solve of the same problem.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from openvslam_tpu.parallel import make_mesh, make_distributed_ba
from openvslam_tpu.parallel.distributed_ba import partition_problem
from test_ba import _build_problem, _pose_errors

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_ba_matches_single(tmp_path, rng):
    port = _free_port()
    out = tmp_path / "mh.json"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(i), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(o.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    res = json.loads(out.read_text())
    assert res["global_devices"] == 8
    assert res["offsets"] == [0, 8, 16]        # keyframe ranges per host
    assert res["max_pose_err"] < 0.02

    # single-process reference on the in-process 8-virtual-device mesh
    cam, prob, T_true, X_true, n_cams, n_lms = _build_problem(
        np.random.default_rng(7), L=512, O=4096)
    ba = make_distributed_ba(cam, make_mesh(8), iters=10)
    T1, X1, c1 = ba(partition_problem(prob, 8))
    e1 = _pose_errors(np.asarray(T1), T_true, n_cams)
    assert e1.max() < 0.02
    # same problem, same shard count -> same solution (bitwise-identical
    # math modulo reduction order; costs agree tightly)
    assert abs(res["cost"] - float(c1)) / max(float(c1), 1e-9) < 0.02
    T_mh = np.array(res["T0"]).reshape(n_cams, 4, 4)
    assert np.abs(T_mh - np.asarray(T1)[:n_cams]).max() < 1e-3

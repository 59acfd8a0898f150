"""Multi-host execution: process-spanning meshes and distributed BA.

The reference is single-machine (SURVEY.md §2.3: no distributed backend at
all); the driver's north star demands scaling across a multi-host TPU pod
slice with >=70% efficiency at N>=2 hosts.  The TPU-native recipe
(SURVEY.md §5.8):

  1. ``jax.distributed.initialize`` joins every host into one runtime; the
     global mesh spans all processes' devices, and the SAME shard_map BA
     program (parallel/distributed_ba.py) runs unchanged — its psum rides
     ICI within a host and DCN between hosts.
  2. Data placement: each host owns the landmark/observation shards of its
     local devices; ``jax.make_array_from_process_local_data`` assembles the
     global arrays without ever materializing the whole problem on one host.
  3. Host-side control plane: keyframe assignment and pooled-solve metadata
     move via ``multihost_utils.process_allgather`` (small numpy payloads) —
     XLA collectives carry only tensors, so object-level coordination rides
     this side channel.

Tested with N>=2 real OS processes x 4 virtual CPU devices each
(tests/test_multihost_ba.py), the buildable stand-in for a pod slice on a
one-chip box (SURVEY.md §4 multi-node test prescription).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .distributed_ba import ShardedBAProblem, make_distributed_ba, partition_problem


def initialize(coordinator_address: str, num_processes: int, process_id: int,
               local_device_count: Optional[int] = None):
    """Join this process into the multi-host runtime.  On TPU pods the three
    arguments come from the scheduler environment and may be omitted
    (jax.distributed auto-detects); on CPU simulation they are explicit."""
    kwargs = {}
    if local_device_count is not None:
        # CPU simulation: N virtual devices per process
        import os
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={local_device_count}")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id, **kwargs)


def global_mesh(axis: str = "shard") -> Mesh:
    """One mesh axis over EVERY process's devices (jax.devices() is global
    after jax.distributed.initialize)."""
    return Mesh(np.array(jax.devices()), (axis,))


def process_allgather(x: np.ndarray) -> np.ndarray:
    """Gather a small per-host numpy payload from all hosts -> stacked along
    a new leading axis (the control-plane side channel)."""
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def shard_to_global(sp: ShardedBAProblem, mesh: Mesh,
                    axis: str = "shard") -> ShardedBAProblem:
    """Turn a host-local ShardedBAProblem (full numpy arrays, identical on
    every host — e.g. derived from a deterministic pooled snapshot) into
    global jax.Arrays: sharded fields are fed per-process (each host
    converts only the rows its local devices own), replicated fields are
    broadcast.  This is what lets N hosts hold 1/N of the landmark state
    each."""
    n_dev = mesh.devices.size
    repl = NamedSharding(mesh, P())
    shrd = NamedSharding(mesh, P(axis))

    def _replicated(a):
        a = np.asarray(a)
        return jax.make_array_from_process_local_data(repl, a, a.shape)

    def _sharded(a):
        a = np.asarray(a)
        rows = a.shape[0]
        assert rows % n_dev == 0, (rows, n_dev)
        per = rows // n_dev
        # this process's contiguous row block (its devices' shards)
        li = jax.process_index()
        ldev = jax.local_device_count()
        lo = li * ldev * per
        hi = lo + ldev * per
        return jax.make_array_from_process_local_data(
            shrd, a[lo:hi], a.shape)

    return ShardedBAProblem(
        _replicated(sp.T_cw), _replicated(sp.cam_opt),
        _replicated(sp.cam_valid),
        _sharded(sp.X), _sharded(sp.lm_valid),
        _sharded(sp.obs_cam), _sharded(sp.obs_lm), _sharded(sp.obs_uv),
        _sharded(sp.obs_sigma2), _sharded(sp.obs_mask),
    )


def assign_keyframe_ranges(counts_local: int) -> np.ndarray:
    """Control plane for pooled solves: every host reports how many
    keyframes its sessions hold; returns the global cumulative offsets
    (per-host camera-slot ranges in the pooled problem) — the keyframe
    assignment of SURVEY.md §5.8, agreed via allgather."""
    counts = process_allgather(np.asarray([counts_local], np.int64))[:, 0]
    offs = np.zeros(len(counts) + 1, np.int64)
    offs[1:] = np.cumsum(counts)
    return offs


def make_multihost_ba(cam, stereo: bool = False, iters: int = 10,
                      axis: str = "shard", multicam: bool = False):
    """Distributed BA over the global (process-spanning) mesh.  Returns
    (mesh, solve) where solve(prob: optimize.ba.BAProblem) partitions the
    problem over every device of every host and runs the shard_map program;
    its psums cross the host boundary over DCN (gloo on the CPU sim).
    multicam=True switches to the per-observation-intrinsics monocular
    edge (observation columns 2.. carry each edge's camera vector) —
    mixed-camera pools across hosts."""
    mesh = global_mesh(axis)
    from ..optimize import residuals as R
    opt = make_distributed_ba(
        cam, mesh, stereo=stereo, iters=iters, axis=axis,
        res_fn_override=R.make_multicam_mono_residual() if multicam else None)

    def solve(prob):
        sp = partition_problem(prob, int(mesh.devices.size))
        gp = shard_to_global(sp, mesh, axis)
        T, X, cost = opt(gp)
        # results: cameras replicated; X sharded -> gather for host writeback
        from jax.experimental import multihost_utils
        X_full = multihost_utils.process_allgather(X, tiled=True)
        return np.asarray(T), np.asarray(X_full), float(np.asarray(cost))

    return mesh, solve

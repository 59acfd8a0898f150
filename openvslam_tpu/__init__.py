"""openvslam_tpu — a TPU-native visual SLAM framework.

A from-scratch re-design of the capability surface of xdspacelab/openvslam
(indirect, feature-based visual SLAM in the ORB-SLAM lineage) for TPU
hardware: the numeric core is JAX/XLA/Pallas with static shapes, batched
RANSAC, MXU-friendly Hamming matching and Schur-complement bundle
adjustment; host-side Python orchestrates the map database and the
tracking / mapping / global-optimization modules; multi-host scaling uses
``jax.sharding.Mesh`` + ``shard_map`` with XLA collectives.

Layer map (mirrors SURVEY.md §1):
  ops/       — L1/L3 geometry + feature kernels (jnp + pallas)
  camera/    — L2 camera models (batched, functional)
  optimize/  — L5 LM optimizers (pose-only, local/global BA, Sim3 graph)
  data/      — L4 map data layer (host SoA + device mirrors)
  module/    — L6 SLAM modules (tracking / mapping / global opt)
  models/    — jitted end-to-end frame pipelines (the "model" families)
  parallel/  — multi-chip sharded distributed BA
  io/        — map snapshots (msgpack) + trajectory writers (TUM/KITTI)
  publish/   — viewer-facing snapshots
  utils/     — eval (ATE/RPE), synthetic scenes, dataset loaders
"""

__version__ = "0.1.0"

# TPU matmul precision: XLA lowers f32 x f32 dots to ONE bf16 MXU pass by
# default, which destroys the epipolar/RANSAC geometry (observed on-device:
# two-view initialization never succeeds) — but a package-wide "highest" pin
# costs 3x end-to-end frame throughput (measured 43.6 vs 126.6 fps on v5e).
# The pin is therefore SCOPED: geometry-critical subgraphs (solvers,
# triangulation, pose LM, BA, pose graph) carry @geometry_precision
# (ops.precision); the frontend's big contractions keep one-pass bf16.
# OPENVSLAM_TPU_MATMUL_PRECISION, if set, still pins globally (debug tool).
import os as _os

if "OPENVSLAM_TPU_MATMUL_PRECISION" in _os.environ:
    import jax as _jax

    _jax.config.update(
        "jax_default_matmul_precision",
        _os.environ["OPENVSLAM_TPU_MATMUL_PRECISION"],
    )

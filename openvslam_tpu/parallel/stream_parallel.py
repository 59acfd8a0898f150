"""Stream-parallel tracking over a device mesh: one session's fused
per-frame step per device, ONE program launch for all of them.

Why this shape: single-chip multi-stream batching is a measured NEGATIVE
on v5e (bench_batch.py: 3.4 ms/frame flat across batch sizes — the fused
step's stages are already throughput-bound, and the Pallas matcher/pose-LM
kernels cannot be batched by vmap, so a batched program must fall back to
the slower XLA formulations).  The scaling axis that DOES work is devices:
`shard_map` the single-stream FrameStep over a mesh so every chip runs its
own full Pallas program — K sessions track at the full per-chip rate with
one host dispatch per round.

Use with `parallel.multi_session.MultiSessionRunner`-style orchestration:
the host round-robins K sessions' bookkeeping while the device mesh steps
all K frames at once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.frame_step import FrameStep, FrameStepResult


class StreamParallelStep:
    """K = mesh-size tracking streams, one per device.

    step(images (K,H,W) u8, T_pred (K,4,4), lm_pos (K,L,3),
         lm_desc (K,L,256) i8, lm_valid (K,L), lm_pred_level (K,L))
      -> FrameStepResult with a leading K axis, sharded over the mesh.
    Per-stream results are exactly the single-device FrameStep's (the body
    IS FrameStep._step_impl, run unbatched on each device).
    """

    def __init__(self, frame_step: FrameStep, mesh: Mesh):
        self.fs = frame_step
        self.mesh = mesh
        axis = mesh.axis_names[0]
        spec = P(axis)

        def body(img, T, pos, desc, val, lvl):
            r = frame_step._step_impl(img[0], T[0], pos[0], desc[0],
                                      val[0], lvl[0])
            return FrameStepResult(*(x[None] for x in r))

        shmapped = jax.shard_map(
            body, mesh=mesh,
            in_specs=(spec, spec, spec, spec, spec, spec),
            out_specs=FrameStepResult(spec, spec, spec, spec, spec, spec),
            check_vma=False,
        )
        self.step = jax.jit(shmapped)
        self._sharding = NamedSharding(mesh, spec)

    @property
    def n_streams(self) -> int:
        return self.mesh.devices.size

    def shard(self, *arrays):
        """Place per-stream-stacked host arrays on the mesh (leading axis =
        stream; must equal the mesh size — the per-device body tracks
        exactly one stream, so a multiple would silently drop streams)."""
        for a in arrays:
            if a.shape[0] != self.n_streams:
                raise ValueError(
                    f"leading axis {a.shape[0]} != mesh size "
                    f"{self.n_streams}: one stream per device")
        return tuple(jax.device_put(a, self._sharding) for a in arrays)

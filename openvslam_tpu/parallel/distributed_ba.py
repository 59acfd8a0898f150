"""Distributed bundle adjustment: landmarks sharded over the device mesh,
reduced camera system assembled with psum collectives.

Design (SURVEY.md §7 M7, BASELINE.json north star): the landmark block of the
BA Hessian is block-diagonal (3x3 per landmark), so Schur elimination is
embarrassingly parallel over landmarks.  Shard landmarks (and their
observations) across the mesh axis; each device:

  1. computes residuals/Jacobians for ITS observations            (local)
  2. eliminates ITS landmark blocks                               (local)
  3. accumulates its contribution to the reduced camera system    (local)
  4. psum(S), psum(v) over the mesh  ->  replicated (6C,6C) solve (ICI)
  5. back-substitutes ITS landmarks                               (local)

Camera poses are replicated (C is small relative to landmarks — the same
observation that motivates Schur in the first place).  Host-side partitioning
assigns observations to the shard that owns their landmark, with per-shard
padding; camera indices stay global.

The same program runs on a 1-device mesh (degenerates to local BA) and on a
multi-host mesh (psum rides ICI/DCN) — this is the TPU answer to the
reference's single-machine g2o.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..optimize import residuals as R
from ..ops.precision import geometry_precision


class ShardedBAProblem(NamedTuple):
    """Leading axis of X/lm/obs arrays is the GLOBAL (sharded) axis:
    X (L_total,3) with L_total = n_shards * L_shard, etc.  Cameras replicated."""
    T_cw: jnp.ndarray        # (C,4,4)
    cam_opt: jnp.ndarray     # (C,)
    cam_valid: jnp.ndarray   # (C,)
    X: jnp.ndarray           # (L_total,3)
    lm_valid: jnp.ndarray    # (L_total,)
    obs_cam: jnp.ndarray     # (O_total,) global camera index
    obs_lm: jnp.ndarray      # (O_total,) LOCAL landmark index within the shard
    obs_uv: jnp.ndarray      # (O_total,2|3)
    obs_sigma2: jnp.ndarray  # (O_total,)
    obs_mask: jnp.ndarray    # (O_total,)


def make_distributed_ba(cam, mesh: Mesh, stereo: bool = False, iters: int = 10,
                        axis: str = "shard", res_fn_override=None):
    """Build the sharded BA step.  Returns optimize(problem) -> (T, X, cost).

    Shapes: L_total/O_total must divide evenly by the mesh size (host pads).

    res_fn_override: alternative residual(T, X, obs_vec), e.g. the
    multi-camera edge (per-obs intrinsics in obs_uv columns 2..) for pooled
    multi-session maps whose sessions use different cameras.
    """
    if res_fn_override is not None:
        res_fn = res_fn_override
        chi2_thr = R.CHI2_2D
    else:
        res_fn = R.make_stereo_residual(cam) if stereo else R.make_mono_residual(cam)
        chi2_thr = R.CHI2_3D if stereo else R.CHI2_2D

    def shard_body(T0, cam_opt, cam_valid, X0, lm_valid, obs_cam, obs_lm,
                   obs_uv, obs_sigma2, obs_mask):
        # Inside shard_map: X0 (L,3), obs_* (O,...) are this shard's slices.
        C = T0.shape[0]
        L = X0.shape[0]
        inv_s2 = 1.0 / jnp.maximum(obs_sigma2, 1e-12)
        cam_free = cam_opt & cam_valid
        m6 = jnp.repeat(cam_free, 6).astype(T0.dtype)
        obs_ok = obs_mask & cam_valid[obs_cam] & lm_valid[obs_lm]

        def residuals_jacs(T, X):
            z6 = jnp.zeros(6, T.dtype)
            z3 = jnp.zeros(3, T.dtype)

            def per_obs(o_cam, o_lm, o_uv):
                def r_of(xi, dX):
                    r, ok = res_fn(R.perturb_pose(xi, T[o_cam]), X[o_lm] + dX, o_uv)
                    return r, ok
                r, ok = r_of(z6, z3)
                Jc = jax.jacfwd(lambda xi: r_of(xi, z3)[0])(z6)
                Jl = jax.jacfwd(lambda dX: r_of(z6, dX)[0])(z3)
                return r, ok, Jc, Jl

            return jax.vmap(per_obs)(obs_cam, obs_lm, obs_uv)

        def cost_of(T, X):
            def r_only(o_cam, o_lm, o_uv):
                return res_fn(T[o_cam], X[o_lm], o_uv)
            r, ok = jax.vmap(r_only)(obs_cam, obs_lm, obs_uv)
            c2 = jnp.sum(r * r, -1) * inv_s2
            w = (obs_ok & ok).astype(T.dtype)
            rho = jnp.where(c2 <= chi2_thr, c2,
                            2.0 * jnp.sqrt(chi2_thr * jnp.maximum(c2, 0.0)) - chi2_thr)
            return jax.lax.psum(jnp.sum(rho * w), axis)

        def body(carry, _):
            T, X, lam, _ = carry
            r, ok, Jc, Jl = residuals_jacs(T, X)
            c2 = jnp.sum(r * r, -1) * inv_s2
            w = (
                R.huber_weight(c2, chi2_thr) * inv_s2 * (obs_ok & ok).astype(T.dtype)
            )
            Jc = Jc * cam_free[obs_cam][:, None, None]

            Hcc = jnp.zeros((C, 6, 6), T.dtype).at[obs_cam].add(
                jnp.einsum("odi,odj,o->oij", Jc, Jc, w))
            Hll = jnp.zeros((L, 3, 3), T.dtype).at[obs_lm].add(
                jnp.einsum("odi,odj,o->oij", Jl, Jl, w))
            gc = jnp.zeros((C, 6), T.dtype).at[obs_cam].add(
                jnp.einsum("odi,od,o->oi", Jc, r, w))
            gl = jnp.zeros((L, 3), T.dtype).at[obs_lm].add(
                jnp.einsum("odi,od,o->oi", Jl, r, w))
            Wt = jnp.zeros((L, C, 6, 3), T.dtype).at[(obs_lm, obs_cam)].add(
                jnp.einsum("odi,odj,o->oij", Jc, Jl, w))

            eyec = jnp.eye(6, dtype=T.dtype)
            eyel = jnp.eye(3, dtype=T.dtype)
            Hll_d = Hll + lam * Hll * eyel + 1e-8 * eyel
            Hll_d = jnp.where(lm_valid[:, None, None], Hll_d, eyel)
            Hll_inv = jnp.linalg.inv(Hll_d)

            # local Schur contribution, then the ONLY collectives of the step
            Y = jnp.einsum("lcik,lkm->lcim", Wt, Hll_inv)
            Yr = Y.transpose(1, 2, 0, 3).reshape(C * 6, L * 3)
            Wr = Wt.transpose(1, 2, 0, 3).reshape(C * 6, L * 3)
            S_local = -jnp.dot(Yr, Wr.T, preferred_element_type=jnp.float32)
            v_local = (-gc + jnp.einsum("lcim,lm->ci", Y, gl)).reshape(C * 6)
            S = jax.lax.psum(S_local, axis)
            v = jax.lax.psum(v_local, axis)
            Hcc_tot = jax.lax.psum(Hcc, axis)
            gc_tot = jax.lax.psum(gc, axis)
            del gc_tot
            Hcc_d = Hcc_tot + lam * Hcc_tot * eyec + 1e-8 * eyec
            S = S.reshape(C, 6, C, 6)
            diag = jnp.arange(C)
            S = S.at[diag, :, diag, :].add(Hcc_d)
            S = S.reshape(C * 6, C * 6)
            S = S * m6[:, None] * m6[None, :] + jnp.diag(1.0 - m6)
            v = v * m6
            dxc = jnp.linalg.solve(S, v).reshape(C, 6)     # replicated solve

            dxl = -jnp.einsum(
                "lkm,lm->lk", Hll_inv,
                gl + jnp.einsum("lcik,ci->lk", Wt, dxc),
            ) * lm_valid[:, None]

            T_new = jax.vmap(R.perturb_pose)(dxc * cam_free[:, None], T)
            X_new = X + dxl
            c_new = cost_of(T_new, X_new)
            c_old = cost_of(T, X)
            accept = c_new < c_old
            return (
                jnp.where(accept, T_new, T),
                jnp.where(accept, X_new, X),
                jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6),
                jnp.minimum(c_new, c_old),
            ), None

        init = (T0, X0, jnp.float32(1e-4), jnp.float32(0.0))
        (T, X, _, cost), _ = jax.lax.scan(body, init, None, length=iters)
        return T, X, cost

    sharded = shard_map(
        shard_body, mesh=mesh,
        in_specs=(
            P(), P(), P(),                 # cameras replicated
            P(axis), P(axis),              # landmarks sharded
            P(axis), P(axis), P(axis), P(axis), P(axis),   # obs sharded
        ),
        out_specs=(P(), P(axis), P()),
        check_vma=False,
    )

    @jax.jit
    @geometry_precision
    def optimize(p: ShardedBAProblem):
        return sharded(
            p.T_cw, p.cam_opt, p.cam_valid, p.X, p.lm_valid,
            p.obs_cam, p.obs_lm, p.obs_uv, p.obs_sigma2, p.obs_mask,
        )

    return optimize


def partition_problem(prob, n_shards: int):
    """Host helper: repartition a flat BAProblem-style set of arrays into the
    sharded layout (landmarks round-robin by block, observations moved to
    their landmark's shard, per-shard padding, local landmark indices).

    prob: optimize.ba.BAProblem (numpy-compatible arrays).
    Returns ShardedBAProblem with L_total = n_shards * L_shard etc.
    """
    import numpy as np

    L = prob.X.shape[0]
    O = prob.obs_cam.shape[0]
    L_shard = -(-L // n_shards)
    # landmark l -> shard l // L_shard, local idx l % L_shard  (block partition)
    obs_lm = np.asarray(prob.obs_lm)
    obs_shard = obs_lm // L_shard
    obs_local = obs_lm % L_shard
    obs_mask = np.asarray(prob.obs_mask)
    counts = np.bincount(obs_shard[obs_mask], minlength=n_shards)
    O_shard = max(1, int(-(-counts.max() // 8) * 8)) if counts.size else 1

    X_pad = np.zeros((n_shards * L_shard, 3), np.float32)
    X_pad[:L] = np.asarray(prob.X)
    lmv_pad = np.zeros(n_shards * L_shard, bool)
    lmv_pad[:L] = np.asarray(prob.lm_valid)

    oc = np.zeros((n_shards, O_shard), np.int32)
    ol = np.zeros((n_shards, O_shard), np.int32)
    ouv = np.zeros((n_shards, O_shard) + tuple(np.asarray(prob.obs_uv).shape[1:]), np.float32)
    osg = np.ones((n_shards, O_shard), np.float32)
    om = np.zeros((n_shards, O_shard), bool)
    fill = np.zeros(n_shards, np.int64)
    for o in range(O):
        if not obs_mask[o]:
            continue
        s = int(obs_shard[o])
        k = int(fill[s])
        if k >= O_shard:
            continue
        oc[s, k] = prob.obs_cam[o]
        ol[s, k] = obs_local[o]
        ouv[s, k] = prob.obs_uv[o]
        osg[s, k] = prob.obs_sigma2[o]
        om[s, k] = True
        fill[s] = k + 1

    import jax.numpy as jnp
    return ShardedBAProblem(
        jnp.asarray(prob.T_cw), jnp.asarray(prob.cam_opt), jnp.asarray(prob.cam_valid),
        jnp.asarray(X_pad), jnp.asarray(lmv_pad),
        jnp.asarray(oc.reshape(-1)), jnp.asarray(ol.reshape(-1)),
        jnp.asarray(ouv.reshape((-1,) + ouv.shape[2:])),
        jnp.asarray(osg.reshape(-1)), jnp.asarray(om.reshape(-1)),
    )

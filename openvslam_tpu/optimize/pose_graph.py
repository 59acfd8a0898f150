"""Sim(3) pose-graph optimization for loop closure (ref ``optimize/graph_optimizer``).

The reference builds a g2o graph over ALL keyframes with edges = loop edges +
spanning tree + covisibility(weight>=100) + past loop edges, identity
information, LM (SURVEY.md §2.1).  TPU-native version:

* vertices: Sim3 world->camera poses as SoA (R (N,3,3), t (N,3), s (N,))
* edges: fixed-capacity arrays (idx_i, idx_j, measurement S_ji = S_j*S_i^-1
  at graph-build time, mask)
* residual per edge: r = log(S_ji_meas * S_i * S_j^-1)  (7,)
* LM with matrix-free PCG over the 7N system (block-Jacobi preconditioner);
  per-edge 7x14 Jacobians via one vmapped jacfwd.

After convergence the caller rescales landmarks through their reference KF
(host-side, as the reference does in its landmark-correction pass).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import sim3
from ..ops.precision import geometry_precision


class PoseGraphProblem(NamedTuple):
    R: jnp.ndarray        # (N,3,3)
    t: jnp.ndarray        # (N,3)
    s: jnp.ndarray        # (N,)
    node_valid: jnp.ndarray   # (N,) bool
    node_fixed: jnp.ndarray   # (N,) bool (fixed gauge, e.g. loop KF)
    e_i: jnp.ndarray      # (E,) int32
    e_j: jnp.ndarray      # (E,) int32
    e_R: jnp.ndarray      # (E,3,3) measurement S_ji = S_j * S_i^-1
    e_t: jnp.ndarray      # (E,3)
    e_s: jnp.ndarray      # (E,)
    e_mask: jnp.ndarray   # (E,) bool


_SHARED: dict = {}


def make_pose_graph_optimizer(iters: int = 20, cg_iters: int = 50,
                              fix_scale: bool = False):
    """fix_scale: lock the Sim3 scale of EVERY vertex (ref graph_optimizer
    sets fix_scale on stereo/RGBD maps — metric sensors leave no scale
    freedom for the pose graph to redistribute).

    Memoized process-wide on (iters, cg_iters, fix_scale): sessions share
    one compiled program per padded graph size instead of re-jitting."""
    key = (int(iters), int(cg_iters), bool(fix_scale))
    if key in _SHARED:
        return _SHARED[key]
    _SHARED[key] = _make(iters, cg_iters, fix_scale)
    return _SHARED[key]


def _make(iters: int, cg_iters: int, fix_scale: bool):
    @jax.jit
    @geometry_precision
    def optimize(p: PoseGraphProblem):
        N = p.R.shape[0]
        free = p.node_valid & ~p.node_fixed
        # per-coordinate update projection: fixed nodes contribute nothing;
        # with fix_scale the sigma tangent coordinate (index 6) is frozen
        coord = jnp.ones(7, p.R.dtype)
        if fix_scale:
            coord = coord.at[6].set(0.0)

        def edge_residual(xi_i, xi_j, Si, Sj, Sm):
            Si2 = sim3.compose(sim3.exp(xi_i), Si)
            Sj2 = sim3.compose(sim3.exp(xi_j), Sj)
            return sim3.log(sim3.compose(Sm, sim3.compose(Si2, sim3.inverse(Sj2))))

        def residuals_and_jacs(R, t, s):
            Si = (R[p.e_i], t[p.e_i], s[p.e_i])
            Sj = (R[p.e_j], t[p.e_j], s[p.e_j])
            Sm = (p.e_R, p.e_t, p.e_s)
            z7 = jnp.zeros(7, R.dtype)

            def per_edge(Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
                r = edge_residual(z7, z7, (Ri, ti, si), (Rj, tj, sj), (Rm, tm, sm))
                Ji = jax.jacfwd(
                    lambda xi: edge_residual(xi, z7, (Ri, ti, si), (Rj, tj, sj), (Rm, tm, sm))
                )(z7)
                Jj = jax.jacfwd(
                    lambda xj: edge_residual(z7, xj, (Ri, ti, si), (Rj, tj, sj), (Rm, tm, sm))
                )(z7)
                return r, Ji, Jj

            return jax.vmap(per_edge)(
                Si[0], Si[1], Si[2], Sj[0], Sj[1], Sj[2], Sm[0], Sm[1], Sm[2]
            )

        def cost_of(R, t, s):
            r, _, _ = residuals_and_jacs(R, t, s)
            w = p.e_mask.astype(R.dtype)
            return jnp.sum(jnp.sum(r * r, -1) * w)

        def body(carry, _):
            R, t, s, lam, _ = carry
            r, Ji, Jj = residuals_and_jacs(R, t, s)
            w = p.e_mask.astype(R.dtype)
            # gradient
            g = jnp.zeros((N, 7), R.dtype)
            g = g.at[p.e_i].add(jnp.einsum("edk,ed,e->ek", Ji, r, w))
            g = g.at[p.e_j].add(jnp.einsum("edk,ed,e->ek", Jj, r, w))
            # block-diagonal of H for the preconditioner + damping
            Hii = jnp.zeros((N, 7, 7), R.dtype)
            Hii = Hii.at[p.e_i].add(jnp.einsum("edk,edl,e->ekl", Ji, Ji, w))
            Hii = Hii.at[p.e_j].add(jnp.einsum("edk,edl,e->ekl", Jj, Jj, w))
            eye7 = jnp.eye(7, dtype=R.dtype)
            Hii_d = Hii + lam * Hii * eye7 + 1e-8 * eye7
            if fix_scale:
                # freeze the sigma row/col in the preconditioner block
                Pm = coord[:, None] * coord[None, :]
                Hii_d = Hii_d * Pm + jnp.diag(1.0 - coord)
            Minv = jnp.linalg.inv(
                jnp.where(free[:, None, None], Hii_d, eye7)
            )
            proj = free[:, None].astype(R.dtype) * coord[None, :]

            def H_apply(x):                                      # (N,7)
                yi = jnp.einsum("edk,ek->ed", Ji, x[p.e_i])
                yj = jnp.einsum("edk,ek->ed", Jj, x[p.e_j])
                y = (yi + yj) * w[:, None]
                out = jnp.zeros((N, 7), x.dtype)
                out = out.at[p.e_i].add(jnp.einsum("edk,ed->ek", Ji, y))
                out = out.at[p.e_j].add(jnp.einsum("edk,ed->ek", Jj, y))
                # multiplicative damping applied through the block diagonal
                out = out + jnp.einsum(
                    "nkl,nl->nk", lam * Hii * eye7 + 1e-8 * eye7, x
                )
                return out * proj

            rhs = -g * proj

            def cg_body(carry2, _):
                x, rv, pv, rz = carry2
                Ap = H_apply(pv)
                alpha = rz / jnp.maximum(jnp.sum(pv * Ap), 1e-12)
                x = x + alpha * pv
                rv = rv - alpha * Ap
                z = jnp.einsum("nkl,nl->nk", Minv, rv) * proj
                rz_new = jnp.sum(rv * z)
                beta = rz_new / jnp.maximum(rz, 1e-12)
                return (x, rv, z + beta * pv, rz_new), None

            z0 = jnp.einsum("nkl,nl->nk", Minv, rhs) * proj
            (dx, _, _, _), _ = jax.lax.scan(
                cg_body, (jnp.zeros((N, 7), R.dtype), rhs, z0, jnp.sum(rhs * z0)),
                None, length=cg_iters,
            )
            dx = dx * proj
            Rn, tn, sn = jax.vmap(
                lambda xi, Ri, ti, si: sim3.compose(sim3.exp(xi), (Ri, ti, si))
            )(dx, R, t, s)
            c_new = cost_of(Rn, tn, sn)
            c_old = cost_of(R, t, s)
            finite = jnp.isfinite(dx).all()
            accept = (c_new < c_old) & finite
            return (
                jnp.where(accept, Rn, R),
                jnp.where(accept, tn, t),
                jnp.where(accept, sn, s),
                jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6),
                jnp.minimum(c_new, c_old),
            ), None

        init = (p.R, p.t, p.s, jnp.float32(1e-4), jnp.float32(0.0))
        (R, t, s, _, cost), _ = jax.lax.scan(body, init, None, length=iters)
        return R, t, s, cost

    return optimize

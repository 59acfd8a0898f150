"""Sim3 pair refinement with mutual reprojection (ref ``optimize/transform_optimizer``).

Given matched landmark pairs between two keyframes — lm1 (in KF1 camera
coords), lm2 (in KF2 camera coords) with their pixel observations — refine
the Sim3 S_12 (maps KF2 coords -> KF1 coords) by minimizing

    r1 = uv1 - project(S_12 . lm2)        (observed in image 1)
    r2 = uv2 - project(S_12^-1 . lm1)     (observed in image 2)

with Huber at chi2=10 (the reference's deviation threshold), outlier removal
after a first phase, then a second phase — one jitted program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import sim3
from . import residuals as R
from ..ops.precision import geometry_precision

CHI2_SIM3 = 10.0


class Sim3OptResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray


def make_sim3_transform_optimizer(cam, fix_scale: bool = False,
                                  first_iters: int = 10, second_iters: int = 10):
    @jax.jit
    @geometry_precision
    def optimize(R0, t0, s0, lm1, lm2, uv1, uv2, sigma2_1, sigma2_2, mask):
        inv1 = 1.0 / jnp.maximum(sigma2_1, 1e-12)
        inv2 = 1.0 / jnp.maximum(sigma2_2, 1e-12)

        def residuals(xi, g):
            g12 = sim3.compose(sim3.exp(xi), g)
            g21 = sim3.inverse(g12)
            p1 = sim3.transform(g12, lm2)            # (N,3) in cam1
            p2 = sim3.transform(g21, lm1)            # (N,3) in cam2
            uvp1, z1, _ = cam.project(p1)
            uvp2, z2, _ = cam.project(p2)
            r1 = jnp.where((z1 > 1e-6)[:, None], uv1 - uvp1, 0.0)
            r2 = jnp.where((z2 > 1e-6)[:, None], uv2 - uvp2, 0.0)
            ok = (z1 > 1e-6) & (z2 > 1e-6)
            return r1, r2, ok

        def phase(g, active, iters):
            def body(carry, _):
                g, lam, _ = carry
                z7 = jnp.zeros(7, jnp.float32)

                def cost_vec(xi):
                    r1, r2, ok = residuals(xi, g)
                    c1 = jnp.sum(r1 * r1, -1) * inv1
                    c2 = jnp.sum(r2 * r2, -1) * inv2
                    return r1, r2, c1, c2, ok

                r1, r2, c1, c2, ok = cost_vec(z7)
                w1 = R.huber_weight(c1, CHI2_SIM3) * inv1 * (active & ok)
                w2 = R.huber_weight(c2, CHI2_SIM3) * inv2 * (active & ok)
                J1 = jax.jacfwd(lambda xi: residuals(xi, g)[0])(z7)  # (N,2,7)
                J2 = jax.jacfwd(lambda xi: residuals(xi, g)[1])(z7)
                if fix_scale:
                    J1 = J1.at[..., 6].set(0.0)
                    J2 = J2.at[..., 6].set(0.0)
                H = (
                    jnp.einsum("ndi,ndj,n->ij", J1, J1, w1)
                    + jnp.einsum("ndi,ndj,n->ij", J2, J2, w2)
                )
                grad = (
                    jnp.einsum("ndi,nd,n->i", J1, r1, w1)
                    + jnp.einsum("ndi,nd,n->i", J2, r2, w2)
                )
                eye = jnp.eye(7, dtype=jnp.float32)
                if fix_scale:
                    H = H.at[6, 6].add(1.0)
                Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * eye
                dx = -jnp.linalg.solve(Hd, grad)
                if fix_scale:
                    dx = dx.at[6].set(0.0)
                g_new = sim3.compose(sim3.exp(dx), g)
                _, _, c1n, c2n, okn = cost_vec(dx)
                m = (active & ok).astype(jnp.float32)
                mn = (active & okn).astype(jnp.float32)
                def rho(c):
                    return jnp.where(c <= CHI2_SIM3, c,
                                     2.0 * jnp.sqrt(CHI2_SIM3 * jnp.maximum(c, 0.0)) - CHI2_SIM3)
                cost_old = jnp.sum((rho(c1) + rho(c2)) * m)
                cost_new = jnp.sum((rho(c1n) + rho(c2n)) * mn)
                finite = jax.tree_util.tree_reduce(
                    lambda a, b: a & b,
                    jax.tree_util.tree_map(
                        lambda x: jnp.isfinite(x).all(), g_new),
                )
                accept = (cost_new < cost_old) & finite
                g_out = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(accept, a, b), g_new, g
                )
                lam_out = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
                return (g_out, lam_out, jnp.minimum(cost_new, cost_old)), None

            (g, _, _), _ = jax.lax.scan(
                body, (g, jnp.float32(1e-4), jnp.float32(0.0)), None, length=iters
            )
            r1, r2, ok = residuals(jnp.zeros(7, jnp.float32), g)
            c1 = jnp.sum(r1 * r1, -1) * inv1
            c2 = jnp.sum(r2 * r2, -1) * inv2
            good = ok & (c1 < CHI2_SIM3) & (c2 < CHI2_SIM3)
            return g, good

        g0 = (R0, t0, s0)
        g1, good = phase(g0, mask, first_iters)
        active = mask & good
        g2, good2 = phase(g1, active, second_iters)
        inl = active & good2
        return Sim3OptResult(g2[0], g2[1], g2[2], inl, jnp.sum(inl.astype(jnp.int32)))

    return optimize

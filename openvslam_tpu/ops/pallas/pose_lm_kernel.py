"""Pallas TPU kernel: the ENTIRE pose-only LM schedule in one kernel.

The XLA pose optimizer (optimize/pose_optimizer.py) is latency-bound: each
of the 40 LM iterations chains ~10 small XLA ops whose launch cost dominates
— the 6x6 LU solve custom call alone is ~29 us of each ~38 us iteration
(docs/kernels.md (measured-trajectory history; probe: tools/tpu_probe.py)), so the schedule floors at ~1.5 ms regardless of how
many evaluation passes are fused (docs/kernels.md (measured-trajectory history; probe: tools/tpu_probe.py)).  Inside ONE
Pallas kernel there are no per-op launches: residuals/Jacobians are analytic
(1,N)-row vector math, the normal equations are a single (8,3N)x(3N,8) MXU
contraction, the damped 6x6 solve is an unrolled scalar Cholesky on the
scalar core, and SE3 exp is ~60 scalar flops.

Semantics mirror optimize.pose_optimizer.make_pose_optimizer exactly (ref
``optimize/pose_optimizer``: g2o LM 4 rounds x 10 iters, Huber at chi2
5.991/7.815, inlier reclassification between rounds), with the Jacobian
computed analytically instead of by jacfwd — same formulas, float-rounding
level differences only.  Perspective cameras only (mono and stereo
(u,v,u_right) edges; a mono observation inside a stereo problem carries
u_right < 0 and contributes a zero third component, as in
optimize.residuals.make_stereo_residual).

The LM body `_lm_schedule` is pure jnp: the same code runs as a plain XLA
function (CPU tests, equivalence checks) and as the Pallas kernel body.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-9


def _cholesky_solve6(h, g):
    """Solve H x = g for SPD 6x6 given as scalar dict h[(i,j)] i>=j; g list.

    Fully unrolled scalar Cholesky — inside the kernel these are scalar-core
    ops with no launch overhead (the XLA-level closed form was measured
    SLOWER than the LU custom call; in-kernel it is essentially free).
    """
    L = {}
    for j in range(6):
        s = h[(j, j)]
        for k in range(j):
            s = s - L[(j, k)] * L[(j, k)]
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[(j, j)] = d
        for i in range(j + 1, 6):
            s = h[(i, j)]
            for k in range(j):
                s = s - L[(i, k)] * L[(j, k)]
            L[(i, j)] = s / d
    y = [None] * 6
    for i in range(6):
        s = g[i]
        for k in range(i):
            s = s - L[(i, k)] * y[k]
        y[i] = s / L[(i, i)]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[(k, i)] * x[k]
        x[i] = s / L[(i, i)]
    return x


def _se3_exp_scalars(w0, w1, w2, u0, u1, u2):
    """exp of twist (omega, upsilon) -> (R 3x3, t 3) as scalars.

    Same Taylor-switched Rodrigues + left-Jacobian as ops.se3.se3_exp."""
    th2 = w0 * w0 + w1 * w1 + w2 * w2
    th = jnp.sqrt(jnp.maximum(th2, _EPS * _EPS))
    small = th2 < _EPS
    a = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2)
    c = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                  (th - jnp.sin(th)) / (th2 * th))
    # W and W^2 entries
    W = [[0.0, -w2, w1], [w2, 0.0, -w0], [-w1, w0, 0.0]]
    W2 = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            W2[i][j] = sum(W[i][k] * W[k][j] for k in range(3))
    R = [[None] * 3 for _ in range(3)]
    V = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            eye = 1.0 if i == j else 0.0
            R[i][j] = eye + a * W[i][j] + b * W2[i][j]
            V[i][j] = eye + b * W[i][j] + c * W2[i][j]
    u = (u0, u1, u2)
    t = [sum(V[i][k] * u[k] for k in range(3)) for i in range(3)]
    return R, t


def _lm_schedule(X0, X1, X2, ou, ov, our, inv_s2, mask_f, T0,
                 fx, fy, cx, cy, fxb, chi2_thr, num_rounds, iters_per_round):
    """The full LM schedule over (1,N)-row operands.  Pure jnp.

    X*: landmark world coords; ou/ov/our: observations (our < 0 = mono obs);
    inv_s2: information; mask_f: 1.0 where the observation participates.
    T0: tuple of 12 scalars (rows of the 3x4 cam<-world transform).
    Returns (T 12-tuple, c2 (1,N), ok (1,N) f32, active (1,N) f32).
    """
    f32 = jnp.float32
    ur_obs = (our >= 0.0).astype(f32)

    def rho(c):
        return jnp.where(
            c <= chi2_thr, c,
            2.0 * jnp.sqrt(chi2_thr * jnp.maximum(c, 0.0)) - chi2_thr)

    def eval_at(T):
        r00, r01, r02, t0, r10, r11, r12, t1, r20, r21, r22, t2 = T
        px = r00 * X0 + r01 * X1 + r02 * X2 + t0
        py = r10 * X0 + r11 * X1 + r12 * X2 + t1
        pz = r20 * X0 + r21 * X1 + r22 * X2 + t2
        ok = (pz > _EPS).astype(f32)
        zs = jnp.where(pz > _EPS, pz, 1.0)
        iz = 1.0 / zs
        iz2 = iz * iz
        u = fx * px * iz + cx
        v = fy * py * iz + cy
        ur = u - fxb * iz
        ru = (ou - u) * ok
        rv = (ov - v) * ok
        rur = (our - ur) * ok * ur_obs
        c2 = (ru * ru + rv * rv + rur * rur) * inv_s2
        # analytic d(residual)/d(xi) for the left increment T' = exp(xi) T,
        # xi = (omega, upsilon); identical to jacfwd of the residual
        cpx = -fx * px * iz2                     # d u / d pz
        epy = -fy * py * iz2
        q = fxb * iz2
        Ju = (fx * px * py * iz2,
              -(fx + fx * px * px * iz2),
              fx * py * iz,
              -fx * iz + 0.0 * px,
              0.0 * px,
              -cpx)
        Jv = (fy + fy * py * py * iz2,
              -fy * px * py * iz2,
              -fy * px * iz,
              0.0 * px,
              -fy * iz + 0.0 * px,
              -epy)
        cq = cpx + q
        Jur = (-py * cq,
               -(fx + fx * px * px * iz2) + px * q,
               fx * py * iz,
               -fx * iz + 0.0 * px,
               0.0 * px,
               -cq)
        J = tuple(
            (Ju[i] * ok, Jv[i] * ok, Jur[i] * ok * ur_obs) for i in range(6)
        )
        return J, (ru, rv, rur), ok, c2

    def iter_step(state, active):
        T, J, r, ok, c2, cost, lam = state
        w = jnp.where(c2 <= chi2_thr, 1.0,
                      jnp.sqrt(chi2_thr / jnp.maximum(c2, _EPS)))
        w = w * inv_s2 * active * ok
        wcat = jnp.concatenate([w, w, w], axis=1)            # (1,3N)
        rows = [jnp.concatenate(J[i], axis=1) for i in range(6)]
        rows.append(jnp.concatenate(r, axis=1))
        rows.append(jnp.zeros_like(rows[0]))
        A = jnp.concatenate(rows, axis=0)                    # (8,3N)
        G = jax.lax.dot_general(
            A * wcat, A,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # (8,8)
        h = {}
        for i in range(6):
            for j in range(i + 1):
                v = G[i, j]
                if i == j:
                    v = v * (1.0 + lam) + 1e-9
                h[(i, j)] = v
        g = [G[i, 6] for i in range(6)]
        dx = _cholesky_solve6(h, g)
        ndx = [-d for d in dx]
        R, t = _se3_exp_scalars(*ndx)
        r00, r01, r02, t0, r10, r11, r12, t1, r20, r21, r22, t2 = T
        Tm = ((r00, r01, r02, t0), (r10, r11, r12, t1), (r20, r21, r22, t2))
        Tn = []
        for i in range(3):
            for j in range(4):
                v = sum(R[i][k] * Tm[k][j] for k in range(3))
                if j == 3:
                    v = v + t[i]
                Tn.append(v)
        T_try = tuple(Tn)
        J2, r2, ok2, c2n = eval_at(T_try)
        cost_try = jnp.sum(rho(c2n) * active * ok2)
        # never accept a non-finite pose: its residuals are all masked by the
        # validity gate and would read as a perfect cost of 0
        tsum = T_try[0]
        for v in T_try[1:]:
            tsum = tsum + v
        acc = (cost_try < cost) & jnp.isfinite(tsum)
        accf = acc.astype(f32)

        def sel(new, old):
            return jnp.where(acc, new, old)

        T_out = tuple(sel(n, o) for n, o in zip(T_try, T))
        J_out = tuple(tuple(sel(n, o) for n, o in zip(Jn, Jo))
                      for Jn, Jo in zip(J2, J))
        r_out = tuple(sel(n, o) for n, o in zip(r2, r))
        lam_out = jnp.clip(jnp.where(acc, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        del accf
        return (T_out, J_out, r_out, sel(ok2, ok), sel(c2n, c2),
                jnp.where(acc, cost_try, cost), lam_out)

    J, r, ok, c2 = eval_at(T0)
    T = T0
    active = mask_f
    for _ in range(num_rounds):
        cost0 = jnp.sum(rho(c2) * active * ok)
        state = (T, J, r, ok, c2, cost0, jnp.float32(1e-3))

        def body(_, s):
            return iter_step(s, active)

        T, J, r, ok, c2, _, _ = jax.lax.fori_loop(
            0, iters_per_round, body, state)
        active = mask_f * ok * (c2 < chi2_thr).astype(f32)
    return T, c2, ok, active


def _kernel(x_ref, o_ref, w_ref, t_ref, s_ref, *,
            fx, fy, cx, cy, fxb, chi2_thr, num_rounds, iters_per_round):
    T0 = tuple(t_ref[k] for k in range(12))
    T, c2, ok, active = _lm_schedule(
        x_ref[0:1, :], x_ref[1:2, :], x_ref[2:3, :],
        o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :],
        w_ref[0:1, :], w_ref[1:2, :], T0,
        fx, fy, cx, cy, fxb, chi2_thr, num_rounds, iters_per_round)
    s_ref[0:1, :] = c2
    s_ref[1:2, :] = ok
    s_ref[2:3, :] = active
    n = s_ref.shape[1]
    trow = jnp.concatenate(
        [jnp.full((1, 8), v, jnp.float32) for v in T], axis=1)  # (1,96)
    s_ref[3:4, :] = jnp.concatenate(
        [trow, jnp.zeros((1, n - 96), jnp.float32)], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("fx", "fy", "cx", "cy", "fxb", "chi2_thr",
                     "num_rounds", "iters_per_round", "interpret"),
)
def pose_lm_pallas(T_init, X_w, obs_uvr, sigma2, mask, *,
                   fx, fy, cx, cy, fxb, chi2_thr,
                   num_rounds=4, iters_per_round=10, interpret=False):
    """Fused pose-only LM.  obs_uvr: (N,3) with u_right < 0 for mono obs.

    Returns (T_cw (4,4), inliers (N,) bool, num_inliers (), chi2 (N,)) —
    the PoseOptResult fields of optimize.pose_optimizer.
    """
    N = X_w.shape[0]
    Np = max(128, -(-N // 128) * 128)
    x = jnp.zeros((8, Np), jnp.float32)
    x = x.at[0, :N].set(X_w[:, 0])
    x = x.at[1, :N].set(X_w[:, 1])
    x = x.at[2, :N].set(X_w[:, 2])
    o = jnp.zeros((8, Np), jnp.float32)
    o = o.at[0, :N].set(obs_uvr[:, 0])
    o = o.at[1, :N].set(obs_uvr[:, 1])
    o = o.at[2, :N].set(obs_uvr[:, 2] if obs_uvr.shape[1] > 2
                        else jnp.full(N, -1.0))
    w = jnp.zeros((8, Np), jnp.float32)
    w = w.at[0, :N].set(1.0 / jnp.maximum(sigma2, 1e-12))
    w = w.at[1, :N].set(mask.astype(jnp.float32))
    tvec = jnp.concatenate(
        [T_init[:3, :].reshape(-1).astype(jnp.float32),
         jnp.zeros(4, jnp.float32)])

    s_out = pl.pallas_call(
        functools.partial(
            _kernel, fx=fx, fy=fy, cx=cx, cy=cy, fxb=fxb, chi2_thr=chi2_thr,
            num_rounds=num_rounds, iters_per_round=iters_per_round),
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.float32),
        interpret=interpret,
    )(x, o, w, tvec)

    c2 = s_out[0, :N]
    ok = s_out[1, :N] > 0.5
    active = s_out[2, :N] > 0.5
    trow = s_out[3, 0:96:8]
    T = jnp.concatenate(
        [trow.reshape(3, 4),
         jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)], axis=0)
    inl = active
    return T, inl, jnp.sum(inl.astype(jnp.int32)), c2


def pose_lm_xla_reference(T_init, X_w, obs_uvr, sigma2, mask, *,
                          fx, fy, cx, cy, fxb, chi2_thr,
                          num_rounds=4, iters_per_round=10):
    """The same schedule as plain XLA (the kernel body without pallas_call)
    — used by tests to validate the analytic math against the autodiff core,
    and available as a fallback."""
    N = X_w.shape[0]
    f32 = jnp.float32
    X0 = X_w[:, 0].reshape(1, N).astype(f32)
    X1 = X_w[:, 1].reshape(1, N).astype(f32)
    X2 = X_w[:, 2].reshape(1, N).astype(f32)
    ou = obs_uvr[:, 0].reshape(1, N).astype(f32)
    ov = obs_uvr[:, 1].reshape(1, N).astype(f32)
    our = (obs_uvr[:, 2] if obs_uvr.shape[1] > 2
           else jnp.full(N, -1.0)).reshape(1, N).astype(f32)
    inv_s2 = (1.0 / jnp.maximum(sigma2, 1e-12)).reshape(1, N).astype(f32)
    mask_f = mask.astype(f32).reshape(1, N)
    T0 = tuple(T_init[:3, :].reshape(-1).astype(f32))
    T, c2, ok, active = _lm_schedule(
        X0, X1, X2, ou, ov, our, inv_s2, mask_f, T0,
        fx, fy, cx, cy, fxb, chi2_thr, num_rounds, iters_per_round)
    Tm = jnp.concatenate(
        [jnp.stack(T).reshape(3, 4),
         jnp.asarray([[0.0, 0.0, 0.0, 1.0]], f32)], axis=0)
    inl = active[0] > 0.5
    return Tm, inl, jnp.sum(inl.astype(jnp.int32)), c2[0]

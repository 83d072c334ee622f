"""Pallas fused kernel for pose-only motion refinement (bearing residuals).

``ba.bundle_adjustment.optimize_pose`` is an 8-iteration LM over ~150 bearing
observations — each iteration is ~10 small XLA kernels of launch latency for
microseconds of math (PERF.md: 0.30 ms/frame, nearly all fixed cost). This
kernel runs the whole solve in one ``pallas_call``: residuals, the (3×6)
per-observation Jacobian chain, global histogram-MAD Tukey weights, the 6×6
scalar Cholesky and the SE3 retraction all live in VMEM/registers.  The math
mirrors ``optimize_pose`` + ``optim.optimizer.optimize_lm`` (Nielsen damping,
normalized gain ratio, relative-decrease early exit); scalar helpers are
shared with ``ops.pallas_lm``.

Reference scope: ``BundleAdjustment::optimizePose``
(src/bundle_adjustment.cpp:35-177) with the unit-bearing residual choice.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdvo_tpu.geometry.se3 import SE3
from sdvo_tpu.ops.pallas_lm import (
    _MAD_BINS,
    _chol6_scalar,
    _mat9_mul,
    _scalar_grid,
    _se3_exp_scalar,
)


def _mad_bisect3(r3, vis_f, n_vis):
    """Global MAD over three (N,1) residual columns via independent binned
    counts — the 3-column analog of ops.pallas_lm._mad_bisect (no lane-axis
    concatenation: Mosaic's layout engine rejects it inside kernel loops)."""
    big = jnp.asarray(3.0e38, jnp.float32)
    half_n = 0.5 * n_vis
    B = _MAD_BINS

    def min_reduce(xs):
        out = xs[0]
        for x in xs[1:]:
            out = jnp.minimum(out, x)
        return out

    def max_reduce(xs):
        out = xs[0]
        for x in xs[1:]:
            out = jnp.maximum(out, x)
        return out

    def bin_median(vals, lo, hi, stages=2):
        # two zoom stages — see ops.pallas_lm._bin_median (a single coarse
        # pass collapses when outliers stretch the range)
        med = hi
        for _ in range(stages):
            span = jnp.maximum(hi - lo, 1e-12)
            cnts = [
                sum(jnp.sum(jnp.where(v <= lo + ((b + 1.0) / B) * span, vis_f, 0.0))
                    for v in vals)
                for b in range(B)
            ]
            prev = jnp.asarray(0.0, jnp.float32)
            new_lo, new_hi = lo, hi
            for b in range(B):
                hit = (prev < half_n) & (cnts[b] >= half_n)
                frac = (half_n - prev) / jnp.maximum(cnts[b] - prev, 1.0)
                med = jnp.where(hit, lo + (b + frac) * (span / B), med)
                new_lo = jnp.where(hit, lo + b * (span / B), new_lo)
                new_hi = jnp.where(hit, lo + (b + 1.0) * (span / B), new_hi)
                prev = cnts[b]
            lo, hi = new_lo, new_hi
        return med

    lo = min_reduce([jnp.min(jnp.where(vis_f > 0.5, v, big)) for v in r3])
    hi = max_reduce([jnp.max(jnp.where(vis_f > 0.5, v, -big)) for v in r3])
    med = bin_median(r3, lo, hi)
    dev = [jnp.abs(v - med) for v in r3]
    hi2 = max_reduce([jnp.max(jnp.where(vis_f > 0.5, v, 0.0)) for v in dev])
    return bin_median(dev, jnp.asarray(0.0, jnp.float32), hi2)


def _pose_kernel(
    pose_ref,  # (3, 4) [R | t] initial (world→camera)
    pts_ref,  # (N, 3) world points
    brg_ref,  # (N, 3) unit bearings in the camera frame
    vis_ref,  # (N, 1) f32 mask
    out_pose,  # (3, 4)
    out_stats,  # (1, 4) chi2, n_vis, iters, unused
    *, max_iters: int, min_rel_decrease: float,
):
    pts = pts_ref[...]
    brg = brg_ref[...]
    base_vis = vis_ref[...]  # (N,1) f32
    N = pts.shape[0]
    X = pts[:, 0:1]
    Y = pts[:, 1:2]
    Z = pts[:, 2:3]
    b0 = brg[:, 0:1]
    b1 = brg[:, 1:2]
    b2 = brg[:, 2:3]

    def residuals(R, t):
        px = X * R[0] + Y * R[1] + Z * R[2] + t[0]
        py = X * R[3] + Y * R[4] + Z * R[5] + t[1]
        pz = X * R[6] + Y * R[7] + Z * R[8] + t[2]
        n2 = px * px + py * py + pz * pz
        n = jnp.sqrt(jnp.maximum(n2, 1e-24))
        f0 = px / n
        f1 = py / n
        f2 = pz / n
        r3 = ((f0 - b0) * base_vis, (f1 - b1) * base_vis, (f2 - b2) * base_vis)
        return r3, (px, py, pz, f0, f1, f2, n)

    def weights_chi2(r3):
        n_vis = jnp.maximum(jnp.sum(base_vis) * 3.0, 1.0)
        sigma = 1.4826 * _mad_bisect3(r3, base_vis, n_vis)
        c = 4.6851 * jnp.maximum(sigma, 1e-12)
        w3 = []
        chi2 = jnp.asarray(0.0, jnp.float32)
        for r in r3:
            w = (1.0 - (r * r) / (c * c)) ** 2
            w = jnp.where(jnp.abs(r) <= c, w, 0.0) * base_vis
            w3.append(w)
            chi2 = chi2 + jnp.sum(w * r * r)
        return tuple(w3), chi2, n_vis

    def jac_cols(geom):
        """Per-observation J (3 rows × 6 cols) as 18 (N,1) components, laid
        out J[row][col]: dfdp = (I − f fᵀ)/n; dp/dξ = [I | −hat(p)]."""
        px, py, pz, f0, f1, f2, n = geom
        inv_n = 1.0 / n
        f = (f0, f1, f2)
        p = (px, py, pz)
        # dfdp[i][j]
        dfdp = [[((1.0 if i == j else 0.0) - f[i] * f[j]) * inv_n
                 for j in range(3)] for i in range(3)]
        # Q = -hat(p): [[0, pz, -py], [-pz, 0, px], [py, -px, 0]]
        zero = jnp.zeros_like(px)
        Q = [[zero, pz, -py], [-pz, zero, px], [py, -px, zero]]
        J = [[None] * 6 for _ in range(3)]
        for i in range(3):
            for j in range(3):
                J[i][j] = dfdp[i][j]
            for k in range(3):
                J[i][3 + k] = sum(dfdp[i][j] * Q[j][k] for j in range(3))
        return J

    R0 = tuple(pose_ref[i, j] for i in range(3) for j in range(3))
    t0 = tuple(pose_ref[i, 3] for i in range(3))
    r0, geom0 = residuals(R0, t0)
    _, chi0, _ = weights_chi2(r0)

    def cond(state):
        it, done = state[0], state[1]
        return (it < max_iters) & jnp.logical_not(done)

    def body(state):
        (it, done, chi, lam, nu) = state[:5]
        R = state[5:14]
        t = state[14:17]
        rr, geom = residuals(R, t)
        ww, _, _ = weights_chi2(rr)
        J = jac_cols(geom)
        H = {}
        g = []
        for a in range(6):
            g.append(sum(jnp.sum(ww[i] * J[i][a] * rr[i]) for i in range(3)))
            for bcol in range(a + 1):
                H[(a, bcol)] = sum(
                    jnp.sum(ww[i] * J[i][a] * J[i][bcol]) for i in range(3)
                )
        diag_max = H[(0, 0)]
        for a in range(1, 6):
            diag_max = jnp.maximum(diag_max, jnp.abs(H[(a, a)]))
        lam_eff = jnp.where(it == 0, lam * diag_max, lam)
        Hd = dict(H)
        for a in range(6):
            Hd[(a, a)] = H[(a, a)] + lam_eff
        dx, okc = _chol6_scalar(Hd, g)
        dx = [jnp.where(okc, d, 0.0) for d in dx]
        # left-multiplicative retraction: T ← exp(-dx) ∘ T
        dR, dt = _se3_exp_scalar([-d for d in dx])
        R_new = _mat9_mul(dR, R)
        t_new = (
            dR[0] * t[0] + dR[1] * t[1] + dR[2] * t[2] + dt[0],
            dR[3] * t[0] + dR[4] * t[1] + dR[5] * t[2] + dt[1],
            dR[6] * t[0] + dR[7] * t[1] + dR[8] * t[2] + dt[2],
        )
        r_n, _ = residuals(R_new, t_new)
        _, chi_n, _ = weights_chi2(r_n)
        pred = sum(d * (lam_eff * d + gi) for d, gi in zip(dx, g))
        rho = (chi - chi_n) / jnp.maximum(pred, 1e-30)
        success = (chi - chi_n) > 0.0
        lam_next = jnp.where(
            success, lam_eff * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
            lam_eff * nu,
        )
        nu_next = jnp.where(success, 2.0, nu * 2.0)
        small = sum(d * d for d in dx) < 1e-16
        rel_dec = (chi - chi_n) / jnp.maximum(chi, 1e-30)
        rel_pred = pred / jnp.maximum(chi, 1e-30)
        done_n = (
            small | jnp.logical_not(okc)
            | (success & (rel_dec < min_rel_decrease))
            | (rel_pred < 0.1 * min_rel_decrease)
        )
        accept = success & jnp.logical_not(small)
        R_out = tuple(jnp.where(accept, a, b) for a, b in zip(R_new, R))
        t_out = tuple(jnp.where(accept, a, b) for a, b in zip(t_new, t))
        chi_out = jnp.where(accept, chi_n, chi)
        return (it + 1, done_n, chi_out, lam_next, nu_next) + R_out + t_out

    init = (
        jnp.asarray(0, jnp.int32), jnp.asarray(False), chi0,
        jnp.asarray(1e-2, jnp.float32), jnp.asarray(2.0, jnp.float32),
    ) + R0 + t0
    final = jax.lax.while_loop(cond, body, init)
    it_f, chi_f = final[0], final[2]
    R_f = final[5:14]
    t_f = final[14:17]
    n_vis = jnp.maximum(jnp.sum(base_vis) * 3.0, 1.0)

    pose_vals = {}
    for i in range(3):
        for j in range(3):
            pose_vals[(i, j)] = R_f[3 * i + j]
        pose_vals[(i, 3)] = t_f[i]
    out_pose[...] = _scalar_grid(pose_vals, 3, 4)
    out_stats[...] = _scalar_grid(
        {(0, 0): chi_f, (0, 1): n_vis, (0, 2): it_f.astype(jnp.float32),
         (0, 3): jnp.asarray(0.0, jnp.float32)}, 1, 4,
    )


@functools.partial(
    jax.jit, static_argnames=("max_iters", "min_rel_decrease", "interpret")
)
def pose_refine(
    T_init: SE3,
    points_w: jax.Array,  # (N, 3) world points
    bearings: jax.Array,  # (N, 3) unit bearings (camera frame)
    valid: jax.Array,  # (N,) bool
    max_iters: int = 8,
    min_rel_decrease: float = 1e-3,
    interpret: bool = False,
) -> Tuple[SE3, jax.Array, jax.Array]:
    """One fused pose-only LM. Returns (T, rmse, iterations)."""
    f32 = jnp.float32
    pose = jnp.concatenate(
        [T_init.rotation.astype(f32), T_init.translation.astype(f32)[:, None]],
        axis=1,
    )
    out_pose, out_stats = pl.pallas_call(
        functools.partial(
            _pose_kernel, max_iters=max_iters, min_rel_decrease=min_rel_decrease
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, 4), f32),
            jax.ShapeDtypeStruct((1, 4), f32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(pose, points_w.astype(f32), bearings.astype(f32), valid.astype(f32)[:, None])
    T = SE3(
        out_pose[0:3, 0:3].astype(T_init.dtype), out_pose[0:3, 3].astype(T_init.dtype)
    )
    rmse = jnp.sqrt(out_stats[0, 0] / out_stats[0, 1]).astype(T_init.dtype)
    return T, rmse, out_stats[0, 2].astype(jnp.int32)

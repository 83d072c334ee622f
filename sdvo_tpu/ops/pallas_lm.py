"""Pallas fused LM level-kernel for sparse photometric alignment.

One pyramid level of the coarse-to-fine alignment is ~10 LM iterations, each
issuing 10-15 small XLA kernels (~80 µs/iteration of pure launch latency —
see PERF.md: the pipeline runs at ~2% of the bandwidth roofline because of
exactly this). This kernel runs the ENTIRE level — project → sample →
residual → robust weights → JᵀWJ → 6×6 solve → SE3 update → accept/reject —
inside one ``pallas_call``: the per-feature current-image windows (≤0.5 MB),
reference patches and frozen inverse-compositional/ESM Jacobians (≤0.2 MB)
are VMEM-resident, and the LM loop is a ``lax.while_loop`` in-kernel, so the
per-iteration cost is pure VPU compute instead of kernel launches.

Mosaic constraints shape the implementation (all found the hard way, on the
real chip — the interpret-mode tests do not exercise the layout engine):
* no gather / dynamic_slice in-kernel → sampling is bilinear interpolation
  written as P² unrolled weighted reductions over the FLAT (N, WH·WW)
  window: weight(n, j) = tri(y+p − j÷WW) · tri(x+q − j mod WW). The
  separable 3-D contraction form (ops.window_sampler) compiles standalone
  but hits "Invalid relayout" inside any in-kernel loop on this toolchain;
  the flat 2-D form is loop-safe and still ~15 M VPU ops (~4 µs) per pass;
* in-kernel reshape (N,25)→(1,N·25) is an unsupported shape cast → the
  robust scale uses BISECTION: masked-count median (12 halvings, each one
  (N,P²)→scalar reduction) instead of a histogram CDF;
* the while-loop carry holds ONLY scalars (pose, chi², lambda) — (N,·)
  vector carries trip layout-inference across the loop boundary, so
  residuals/weights are recomputed from the pose each iteration (one extra
  sample pass, ~4 µs);
* tpu.iota is integer-only → iota int32 then cast; small 1-D vectors / 3×3
  matrices hit layout-rank checks → ALL pose math (SE3 exp, composition,
  the 6×6 Cholesky solve) runs on plain scalars, every vector value stays
  ≥2-D, and scalars are written out via one-hot masked accumulation.

Reference scope: the per-level body of ``ImageAlignment::align`` +
``Optimizer::optimizeLM`` (src/image_alignment.cpp:49-62,
src/optimizer.cpp:161-370).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdvo_tpu.geometry.se3 import SE3

def _sample_rows(win_flat, offs_x, offs_y, patch, WH, WW):
    """Separable bilinear P×P patches — 2-D ops only.

    win_flat (N, WH·WW): flat windows (a 3-D (WH,N,WW) layout would pad the
    32-lane minor dim to 128 and OOM VMEM); window rows are STATIC lane
    slices ``win_flat[:, h·WW:(h+1)·WW]``. Two stages, both cheap: row
    interpolation (P·WH scalar-broadcast multiply-adds on (N, WW)) then
    column weighting (P² masked reductions over WW lanes) — ~7× less VPU
    work than weighting the full flat window per patch pixel.
    Returns (vals (N, P²), ok (N, 1) bool); identical math to
    ops.window_sampler.sample_windows (tri-weight bilinear interpolation).
    """
    N = win_flat.shape[0]
    assert (WH * WW) % 128 == 0 and 128 % WW == 0, (WH, WW)
    G = (WH * WW) // 128  # 128-lane groups; each holds 128//WW window rows
    rpg = 128 // WW
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    h_in_g = (lane // WW).astype(jnp.float32)  # window row within the group
    w_lane = (lane % WW).astype(jnp.float32)  # window column of the lane
    half = patch // 2
    y0 = offs_y - half  # (N, 1)
    x0 = offs_x - half
    # stage A: per patch row, accumulate y-weighted 128-lane groups (every
    # slice is 128-lane ALIGNED — unaligned WW-lane slices pad 4× and OOM
    # scoped VMEM); the 4 window rows of a group stay unsummed in their lane
    # sub-blocks, stage B's reduction folds them together
    S = []
    for p in range(patch):
        acc = None
        for g in range(G):
            wy = jnp.maximum(
                0.0, 1.0 - jnp.abs(y0 + p - (h_in_g + g * rpg))
            )  # (N, 128)
            term = wy * win_flat[:, g * 128 : (g + 1) * 128]
            acc = term if acc is None else acc + term
        S.append(acc)
    # stage B: x-weight by lane column and reduce all 128 lanes
    cols = {}
    for q in range(patch):
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(x0 + q - w_lane))  # (N, 128)
        for p in range(patch):
            cols[p * patch + q] = jnp.sum(S[p] * wx, axis=1, keepdims=True)
    ci = jax.lax.broadcasted_iota(jnp.int32, (N, patch * patch), 1)
    out = jnp.zeros((N, patch * patch), jnp.float32)
    for c in range(patch * patch):
        out = out + jnp.where(ci == c, cols[c], 0.0)
    # value-only bilinear support: the last tap touches row/col
    # ⌈y0+patch−1+1⌉ ≤ WH−1 — identical to ops.window_sampler.sample_windows
    # (the −2 bound belongs to the GRADIENT sampler's extra ±1 taps; with a
    # patch-7 filter window it has zero slack and rejects everything)
    ok = (
        (x0 >= 1) & (y0 >= 1) & (x0 + patch <= WW - 1) & (y0 + patch <= WH - 1)
    )  # (N,1)
    return out, ok


_MAD_BINS = 16


def _bin_median(x, vis_f, lo, hi, half_n, bins=_MAD_BINS, stages=2):
    """Masked median via ``bins`` INDEPENDENT cumulative counts + in-bin
    linear interpolation, zoomed over ``stages`` rounds. A bisection search
    is N SERIAL array→scalar reductions (each ~µs of cross-lane latency, and
    they dominated the fused-LM iteration); here each stage's counts are
    independent (the hardware pipelines them) and only the cheap scalar
    chains are serial — 2 serialization points for bins^stages effective
    resolution. The zoom matters with heavy-tailed residuals: outliers
    stretch [lo, hi] so a single 16-bin pass drops every inlier into one
    bin; stage 2 re-bins inside that bin."""
    med = hi
    for _ in range(stages):
        span = jnp.maximum(hi - lo, 1e-12)
        cnts = [
            jnp.sum(jnp.where(x <= lo + ((b + 1.0) / bins) * span, vis_f, 0.0))
            for b in range(bins)
        ]
        prev = jnp.asarray(0.0, jnp.float32)
        new_lo, new_hi = lo, hi
        for b in range(bins):
            hit = (prev < half_n) & (cnts[b] >= half_n)
            frac = (half_n - prev) / jnp.maximum(cnts[b] - prev, 1.0)
            med = jnp.where(hit, lo + (b + frac) * (span / bins), med)
            new_lo = jnp.where(hit, lo + b * (span / bins), new_lo)
            new_hi = jnp.where(hit, lo + (b + 1.0) * (span / bins), new_hi)
            prev = cnts[b]
        lo, hi = new_lo, new_hi
    return med


def _mad_bisect(r, vis_f, n_vis):
    """MAD = median(|r − median(r)|), two binned-count passes (the in-kernel
    analog of geometry.robust.masked_mad_hist)."""
    half_n = 0.5 * n_vis
    big = jnp.asarray(3.0e38, jnp.float32)
    lo = jnp.min(jnp.where(vis_f > 0.5, r, big))
    hi = jnp.max(jnp.where(vis_f > 0.5, r, -big))
    med = _bin_median(r, vis_f, lo, hi, half_n)
    dev = jnp.abs(r - med)
    hi2 = jnp.max(jnp.where(vis_f > 0.5, dev, 0.0))
    return _bin_median(dev, vis_f, jnp.asarray(0.0, jnp.float32), hi2, half_n)


def _chol6_scalar(H, g):
    """6×6 Cholesky solve on PLAIN SCALARS. H: dict (i,j)→scalar, g: list.
    Returns (dx list of 6 scalars, ok scalar bool)."""
    D = 6
    L = {}
    ok = None
    for i in range(D):
        for j in range(i + 1):
            s = H[(i, j)]
            for kk in range(j):
                s = s - L[(i, kk)] * L[(j, kk)]
            if i == j:
                pos = s > 0.0
                ok = pos if ok is None else (ok & pos)
                L[(i, j)] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[(i, j)] = s / L[(j, j)]
    y = [None] * D
    for i in range(D):
        s = g[i]
        for kk in range(i):
            s = s - L[(i, kk)] * y[kk]
        y[i] = s / L[(i, i)]
    x = [None] * D
    for i in reversed(range(D)):
        s = y[i]
        for kk in range(i + 1, D):
            s = s - L[(kk, i)] * x[kk]
        x[i] = s / L[(i, i)]
    for xi in x:
        ok = ok & jnp.isfinite(xi)
    return x, ok


def _se3_exp_scalar(tau):
    """SE3 exp on 6 scalars → (R 9 scalars row-major, t 3 scalars).
    Matches geometry.se3.exp."""
    ux, uy, uz, wx, wy, wz = tau
    theta2 = wx * wx + wy * wy + wz * wz
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-30))
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta))
    # R = I + a W + b W², W = hat(w)
    R = (
        1.0 + b * (-wz * wz - wy * wy), -a * wz + b * wx * wy, a * wy + b * wx * wz,
        a * wz + b * wx * wy, 1.0 + b * (-wx * wx - wz * wz), -a * wx + b * wy * wz,
        -a * wy + b * wx * wz, a * wx + b * wy * wz, 1.0 + b * (-wx * wx - wy * wy),
    )
    # V = I + b W + c W²
    V = (
        1.0 + c * (-wz * wz - wy * wy), -b * wz + c * wx * wy, b * wy + c * wx * wz,
        b * wz + c * wx * wy, 1.0 + c * (-wx * wx - wz * wz), -b * wx + c * wy * wz,
        -b * wy + c * wx * wz, b * wx + c * wy * wz, 1.0 + c * (-wx * wx - wy * wy),
    )
    t = (
        V[0] * ux + V[1] * uy + V[2] * uz,
        V[3] * ux + V[4] * uy + V[5] * uz,
        V[6] * ux + V[7] * uy + V[8] * uz,
    )
    return R, t


def _mat9_mul(A, B):
    """(9,)-scalar row-major 3×3 product A@B."""
    return tuple(
        A[3 * i + 0] * B[0 + j] + A[3 * i + 1] * B[3 + j] + A[3 * i + 2] * B[6 + j]
        for i in range(3) for j in range(3)
    )


def _scalar_grid(vals, rows, cols):
    """Scalars → one 2-D block via one-hot accumulation (Mosaic can neither
    store scalars to VMEM nor build small 1-D vectors)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    out = jnp.zeros((rows, cols), jnp.float32)
    for (i, j), v in vals.items():
        out = out + jnp.where((ri == i) & (ci == j), v, 0.0)
    return out


def _lm_level_kernel(
    pose_ref,  # (3, 4) [R | t] initial
    win_ref,  # (N, WH·WW) flat current-image windows
    patch_ref,  # (N, P2)
    J_ref,  # (6, N, P2) — component-major: slicing the minor (lane) dim of an
            # (N, P2, 6) array gives offset layouts Mosaic cannot reduce over
    pts_ref,  # (N, 3)
    org_ref,  # (N, 2)
    vis_ref,  # (N, 1) f32 mask
    intr_ref,  # (1, 4) fx, fy, cx, cy (level-scaled)
    out_pose,  # (3, 4)
    out_stats,  # (1, 4) chi2, n_vis, iters, status
    r_scr,  # VMEM (N, P2) scratch: residuals at the accepted pose
    vis_scr,  # VMEM (N, P2) scratch: visibility mask at the accepted pose
    w_scr,  # VMEM (N, P2) scratch: Tukey weights at the accepted pose
    *, patch: int, win_h: int, win_w: int, max_iters: int,
    min_rel_decrease: float, freeze_sigma: bool = False,
):
    win = win_ref[...]
    patches = patch_ref[...]
    J = J_ref[...]
    pts = pts_ref[...]
    org_x = org_ref[:, 0:1]  # (N,1)
    org_y = org_ref[:, 1:2]
    base_vis = vis_ref[...]  # (N,1) f32
    fx = intr_ref[0, 0]
    fy = intr_ref[0, 1]
    cx = intr_ref[0, 2]
    cy = intr_ref[0, 3]
    N, P2 = patches.shape
    X = pts[:, 0:1]  # (N,1)
    Y = pts[:, 1:2]
    Z = pts[:, 2:3]

    def residuals(R, t):
        # R: 9 scalars row-major, t: 3 scalars
        px = X * R[0] + Y * R[1] + Z * R[2] + t[0]
        py = X * R[3] + Y * R[4] + Z * R[5] + t[1]
        pz = X * R[6] + Y * R[7] + Z * R[8] + t[2]
        zs = jnp.where(pz < 1e-6, 1.0, pz)
        u = fx * px / zs + cx - org_x  # (N,1)
        v = fy * py / zs + cy - org_y
        vals, ok = _sample_rows(win, u, v, patch, win_h, win_w)
        # visibility travels as an f32 mask: selecting between BOOL vectors
        # ("arith.select" on i1) does not legalize in Mosaic
        vis1 = ((base_vis > 0.5) & ok & (pz > 1e-6)).astype(jnp.float32)  # (N,1)
        vis2 = jnp.broadcast_to(vis1, (N, P2))
        r = (vals - patches) * vis2
        return r, vis2

    def weights_chi2(r, vis, c_frozen=None):
        # vis: f32 mask (N,P2)
        n_vis = jnp.maximum(jnp.sum(vis), 1.0)
        if c_frozen is None:
            sigma = 1.4826 * _mad_bisect(r, vis, n_vis)
            c = 4.6851 * jnp.maximum(sigma, 1e-12)
        else:
            c = c_frozen
        w = (1.0 - (r * r) / (c * c)) ** 2
        w = jnp.where(jnp.abs(r) <= c, w, 0.0) * vis
        chi2 = jnp.sum(w * r * r)
        return w, chi2, n_vis, c

    R0 = tuple(pose_ref[i, j] for i in range(3) for j in range(3))
    t0 = tuple(pose_ref[i, 3] for i in range(3))
    r0, vis0 = residuals(R0, t0)
    w0, chi0, _, c0 = weights_chi2(r0, vis0)
    # the accepted-state residual/visibility/weight VECTORS travel through
    # VMEM scratch: the while-loop carry must stay scalar-only (vector carries
    # break Mosaic layout inference), and recomputing them from the pose every
    # iteration would double the sampling+MAD cost
    r_scr[...] = r0
    vis_scr[...] = vis0
    w_scr[...] = w0

    def cond(state):
        it, done = state[0], state[1]
        return (it < max_iters) & jnp.logical_not(done)

    def body(state):
        (it, done, chi, lam, nu, csig) = state[:6]
        R = state[6:15]
        t = state[15:18]
        r = r_scr[...]
        vis = vis_scr[...]
        w = w_scr[...]
        wv = w * vis
        # H, g as scalars via full 2-D reductions over component-major J
        H = {}
        g = []
        Jw = [J[i] * wv for i in range(6)]  # six (N,P2) weighted components
        for i in range(6):
            g.append(jnp.sum(Jw[i] * r))
            for j in range(i + 1):
                H[(i, j)] = jnp.sum(Jw[i] * J[j])
        diag_max = H[(0, 0)]
        for i in range(1, 6):
            diag_max = jnp.maximum(diag_max, jnp.abs(H[(i, i)]))
        lam_eff = jnp.where(it == 0, lam * diag_max, lam)
        Hd = dict(H)
        for i in range(6):
            Hd[(i, i)] = H[(i, i)] + lam_eff
        dx, okc = _chol6_scalar(Hd, g)
        dx = [jnp.where(okc, d, 0.0) for d in dx]
        # T_new = T ∘ exp(-dx)
        dR, dt = _se3_exp_scalar([-d for d in dx])
        R_new = _mat9_mul(R, dR)
        t_new = (
            R[0] * dt[0] + R[1] * dt[1] + R[2] * dt[2] + t[0],
            R[3] * dt[0] + R[4] * dt[1] + R[5] * dt[2] + t[1],
            R[6] * dt[0] + R[7] * dt[1] + R[8] * dt[2] + t[2],
        )
        r_n, vis_n = residuals(R_new, t_new)
        # freeze_sigma: the Tukey cutoff stays at its entry value (σ from the
        # kernel's initial residuals) — saves the 4 serialized bin-median
        # stages per iteration; used by the phase-B polish kernel where the
        # scale is already converged
        w_n, chi_n, _, c_new = weights_chi2(
            r_n, vis_n, csig if freeze_sigma else None
        )
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
        acc_f = jnp.where(accept, 1.0, 0.0)
        r_scr[...] = r * (1.0 - acc_f) + r_n * acc_f
        vis_scr[...] = vis * (1.0 - acc_f) + vis_n * acc_f
        w_scr[...] = w * (1.0 - acc_f) + w_n * acc_f
        c_next = csig if freeze_sigma else jnp.where(accept, c_new, csig)
        return (it + 1, done_n, chi_out, lam_next, nu_next, c_next) + R_out + t_out

    init = (
        jnp.asarray(0, jnp.int32), jnp.asarray(False), chi0,
        jnp.asarray(1e-2, jnp.float32), jnp.asarray(2.0, jnp.float32), c0,
    ) + R0 + t0
    final = jax.lax.while_loop(cond, body, init)
    it_f, chi_f = final[0], final[2]
    R_f = final[6:15]
    t_f = final[15:18]
    n_vis = jnp.maximum(jnp.sum(vis_scr[...]), 1.0)

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
    jax.jit,
    static_argnames=("patch", "max_iters", "min_rel_decrease", "freeze_sigma",
                     "interpret"),
)
def lm_align_level(
    T_init: SE3,
    windows: jax.Array,  # (N, WH, WW) current-image windows (level coords)
    ref_patches: jax.Array,  # (N, P2)
    J: jax.Array,  # (N, P2, 6) frozen IC/ESM Jacobians
    points_ref: jax.Array,  # (N, 3)
    origins: jax.Array,  # (N, 2) window origins (level pixel coords)
    visible: jax.Array,  # (N,) bool
    fx, fy, cx, cy,  # level-scaled intrinsics
    patch: int = 5,
    max_iters: int = 12,
    min_rel_decrease: float = 1e-3,
    freeze_sigma: bool = False,
    interpret: bool = False,
) -> Tuple[SE3, jax.Array, jax.Array]:
    """One fused-LM pyramid level. Returns (T, rmse, iterations)."""
    f32 = jnp.float32
    N, WH, WW = windows.shape
    pose = jnp.concatenate(
        [T_init.rotation.astype(f32), T_init.translation.astype(f32)[:, None]], axis=1
    )
    intr = jnp.stack([fx, fy, cx, cy]).astype(f32).reshape(1, 4)
    kernel = functools.partial(
        _lm_level_kernel, patch=patch, win_h=WH, win_w=WW, max_iters=max_iters,
        min_rel_decrease=min_rel_decrease, freeze_sigma=freeze_sigma,
    )
    P2 = patch * patch
    out_pose, out_stats = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((3, 4), f32),
            jax.ShapeDtypeStruct((1, 4), f32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, P2), f32),  # accepted residuals
            pltpu.VMEM((N, P2), f32),  # accepted visibility
            pltpu.VMEM((N, P2), f32),  # accepted Tukey weights
        ],
        interpret=interpret,
    )(
        pose, windows.astype(f32).reshape(N, WH * WW), ref_patches.astype(f32),
        jnp.transpose(J.astype(f32), (2, 0, 1)),  # (6, N, P2) component-major
        points_ref.astype(f32), origins.astype(f32),
        visible.astype(f32)[:, None], intr,
    )
    T = SE3(out_pose[0:3, 0:3].astype(T_init.dtype), out_pose[0:3, 3].astype(T_init.dtype))
    rmse = jnp.sqrt(out_stats[0, 0] / out_stats[0, 1]).astype(T_init.dtype)
    return T, rmse, out_stats[0, 2].astype(jnp.int32)

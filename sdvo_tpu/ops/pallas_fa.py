"""Pallas fused kernel for batched 2D+illumination feature alignment.

``align_features_2d_cached`` runs N independent 3-parameter LMs (u, v,
illumination offset) in one ``lax.while_loop``; each iteration issues ~10
small XLA kernels (sampling contractions, per-feature Tukey, batched 3×3
solve) — ~0.5 ms/frame of almost pure launch latency (PERF.md stage table).
This kernel runs the WHOLE solve in one ``pallas_call``: the per-feature
current-image windows, cached reference patches/gradients, and all LM state
live in VMEM; every operation is (N, ·)-elementwise VPU code (there is no
cross-feature coupling), so the per-iteration cost is a few microseconds of
vector compute.

Mosaic-safety (see ops.pallas_lm for the full list of constraints found on
the real chip): sampling works on the FLAT (N, WH·WW) window with P²
unrolled weighted reductions; the per-feature robust scale is an exact-range
BISECTION median (each step one (N, P²)→(N, 1) masked count); and the LM
iterations are FULLY UNROLLED in Python — no lax loop means no vector loop
carries, which is the construct Mosaic's layout inference cannot handle.

The math mirrors ``align.feature_alignment.align_features_2d_cached`` step
for step; ``tests/test_pallas_fa.py`` asserts parity.

Reference scope: ``FeatureAlignment::align`` + the per-candidate LM of
``Map::reprojectCell`` (src/feature_alignment.cpp:25-205, src/map.cpp:505-579).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BISECT_STEPS = 10


from sdvo_tpu.ops.pallas_lm import _sample_rows


def _pf_median_bisect(x, vis, lo, hi, half_n):
    """Per-feature masked median by UNROLLED range bisection. x, vis (N, P2)
    f32; lo/hi/half_n (N, 1). Max error (hi−lo)/2^steps — far below the
    Tukey cutoff's sensitivity."""
    for _ in range(_BISECT_STEPS):
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(jnp.where(x <= mid, vis, 0.0), axis=1, keepdims=True)
        reach = cnt >= half_n
        lo = jnp.where(reach, lo, mid)
        hi = jnp.where(reach, mid, hi)
    return 0.5 * (lo + hi)


def _pf_tukey(r, vis, sigma_floor):
    """Per-feature Tukey weights (mirrors _tukey_per_feature): sigma =
    max(1.4826·MAD, floor), c = 4.6851σ. r, vis (N, P2) → w (N, P2)."""
    big = jnp.asarray(3.0e38, jnp.float32)
    cnt = jnp.sum(vis, axis=1, keepdims=True)
    half_n = 0.5 * jnp.maximum(cnt, 1.0)
    lo = jnp.min(jnp.where(vis > 0.5, r, big), axis=1, keepdims=True)
    hi = jnp.max(jnp.where(vis > 0.5, r, -big), axis=1, keepdims=True)
    lo = jnp.where(cnt > 0.5, lo, 0.0)
    hi = jnp.where(cnt > 0.5, hi, 1.0)
    med = _pf_median_bisect(r, vis, lo, hi, half_n)
    dev = jnp.abs(r - med)
    hi2 = jnp.max(jnp.where(vis > 0.5, dev, 0.0), axis=1, keepdims=True)
    mad = _pf_median_bisect(dev, vis, jnp.zeros_like(hi2), hi2, half_n)
    sigma = jnp.maximum(1.4826 * mad, sigma_floor)
    c = 4.6851 * sigma
    w = (1.0 - (r * r) / (c * c)) ** 2
    w = jnp.where(jnp.abs(r) <= c, w, 0.0)
    return w * vis


def _solve3(H, g, lam):
    """Per-feature damped 3×3 cofactor solve. H: dict (i,j)→(N,1); g: list of
    three (N,1); lam (N,1) added to the diagonal. Returns 3 × (N,1)."""
    a = H[(0, 0)] + lam
    b = H[(0, 1)]
    c = H[(0, 2)]
    e = H[(1, 1)] + lam
    f = H[(1, 2)]
    i = H[(2, 2)] + lam
    A = e * i - f * f
    B = -(b * i - f * c)
    C = b * f - e * c
    det = a * A + b * B + c * C
    bad = jnp.abs(det) < 1e-12
    det_s = jnp.where(bad, 1.0, det)
    E = a * i - c * c
    F = -(a * f - b * c)
    I = a * e - b * b
    dx0 = (A * g[0] + B * g[1] + C * g[2]) / det_s
    dx1 = (B * g[0] + E * g[1] + F * g[2]) / det_s
    dx2 = (C * g[0] + F * g[1] + I * g[2]) / det_s
    z = jnp.zeros_like(dx0)
    return (
        jnp.where(bad, z, dx0),
        jnp.where(bad, z, dx1),
        jnp.where(bad, z, dx2),
    )


def _fa_kernel(
    win_ref,  # (N, WH·WW) flat current-frame gradient windows
    patch_ref,  # (N, P2) cached reference patches
    gx_ref,  # (N, P2)
    gy_ref,  # (N, P2)
    uv0_ref,  # (N, 2) initial uv (image coords)
    org_ref,  # (N, 2) window origins
    live_ref,  # (N, 1) f32 mask
    out_ref,  # (N, 4): u, v, rmse, converged
    *, patch: int, win_h: int, win_w: int, max_iters: int,
    sigma_floor: float, contrast_threshold: float,
):
    win = win_ref[...]
    refp = patch_ref[...]
    gx = gx_ref[...]
    gy = gy_ref[...]
    u0 = uv0_ref[:, 0:1]
    v0 = uv0_ref[:, 1:2]
    ox = org_ref[:, 0:1]
    oy = org_ref[:, 1:2]
    live = live_ref[...]  # (N,1) f32
    N, P2 = refp.shape

    def residuals(u, v, o):
        vals, ok = _sample_rows(win, u - ox, v - oy, patch, win_h, win_w)
        vis = ((live > 0.5) & ok).astype(jnp.float32)  # (N,1)
        vis_f = jnp.broadcast_to(vis, (N, P2))
        r = -(vals - refp + o) * vis_f
        return r, vis_f

    # illumination offset init: cancel the mean patch difference
    cur0, ok0 = _sample_rows(win, u0 - ox, v0 - oy, patch, win_h, win_w)
    ok0f = jnp.broadcast_to(((live > 0.5) & ok0).astype(jnp.float32), (N, P2))
    cnt0 = jnp.maximum(jnp.sum(ok0f, axis=1, keepdims=True), 1.0)
    o0 = -jnp.sum((cur0 - refp) * ok0f, axis=1, keepdims=True) / cnt0

    r0, vis0 = residuals(u0, v0, o0)
    w0 = _pf_tukey(r0, vis0, sigma_floor)
    chi0 = jnp.sum(r0 * r0 * w0, axis=1, keepdims=True)

    # fully unrolled LM (no lax loops — see module docstring)
    u, v, o = u0, v0, o0
    lam = jnp.full((N, 1), 1e-2, jnp.float32)
    nu = jnp.full((N, 1), 2.0, jnp.float32)
    chi = chi0
    r, vis = r0, vis0
    stalled = 1.0 - live  # (N,1) f32; dead features start stalled
    for it in range(max_iters):
        w = _pf_tukey(r, vis, sigma_floor)

        def rsum(x):
            return jnp.sum(x, axis=1, keepdims=True)

        H = {
            (0, 0): rsum(w * gx * gx), (0, 1): rsum(w * gx * gy),
            (0, 2): rsum(w * gx), (1, 1): rsum(w * gy * gy),
            (1, 2): rsum(w * gy), (2, 2): rsum(w),
        }
        g = [rsum(w * gx * r), rsum(w * gy * r), rsum(w * r)]
        diag_max = jnp.maximum(
            jnp.abs(H[(0, 0)]), jnp.maximum(jnp.abs(H[(1, 1)]), jnp.abs(H[(2, 2)]))
        )
        lam_eff = lam * diag_max if it == 0 else lam
        dx0, dx1, dx2 = _solve3(H, g, lam_eff)
        un, vn, on = u + dx0, v + dx1, o + dx2
        r_n, vis_n = residuals(un, vn, on)
        w_n = _pf_tukey(r_n, vis_n, sigma_floor)
        chi_n = jnp.sum(r_n * r_n * w_n, axis=1, keepdims=True)
        pred = dx0 * (lam_eff * dx0 + g[0]) + dx1 * (lam_eff * dx1 + g[1]) \
            + dx2 * (lam_eff * dx2 + g[2])
        rho = (chi - chi_n) / jnp.maximum(pred, 1e-30)
        success = (chi - chi_n) > 0.0
        lam_next = jnp.where(
            success, lam_eff * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
            lam_eff * nu,
        )
        nu = jnp.where(success, 2.0, nu * 2.0)
        lam = lam_next
        chi_ref = jnp.maximum(chi, 1e-30)
        rel_dec = (chi - chi_n) / chi_ref
        rel_pred = pred / chi_ref
        # a stalled feature's state freezes (the while-loop early exit of the
        # XLA path becomes a mask here)
        acc = success & (stalled < 0.5)
        u = jnp.where(acc, un, u)
        v = jnp.where(acc, vn, v)
        o = jnp.where(acc, on, o)
        chi = jnp.where(acc, chi_n, chi)
        r = jnp.where(acc, r_n, r)
        vis = jnp.where(acc, vis_n, vis)
        stalled = jnp.maximum(
            stalled,
            ((success & (rel_dec < 1e-3)) | (rel_pred < 1e-4)).astype(jnp.float32),
        )

    r_f, vis_f = residuals(u, v, o)
    n_vis = jnp.maximum(jnp.sum(vis_f, axis=1, keepdims=True), 1.0)
    rmse = jnp.sqrt(jnp.sum(r_f * r_f, axis=1, keepdims=True) / n_vis)
    moved2 = (u - u0) ** 2 + (v - v0) ** 2
    # contrast gate (see align_features_2d_cached): variance of the final
    # current patch, in (squared) intensity units of the input images
    cur_f, _ = _sample_rows(win, u - ox, v - oy, patch, win_h, win_w)
    mean_c = jnp.sum(cur_f * vis_f, axis=1, keepdims=True) / n_vis
    var_c = jnp.sum((cur_f - mean_c) ** 2 * vis_f, axis=1, keepdims=True) / n_vis
    conv = (
        (live > 0.5)
        & (moved2 < (2.0 * patch) ** 2)
        & (var_c > contrast_threshold)
    )
    ci = jax.lax.broadcasted_iota(jnp.int32, (N, 4), 1)
    out = jnp.where(ci == 0, u, 0.0) + jnp.where(ci == 1, v, 0.0) \
        + jnp.where(ci == 2, rmse, 0.0) \
        + jnp.where(ci == 3, conv.astype(jnp.float32), 0.0)
    out_ref[...] = out


@functools.partial(
    jax.jit,
    static_argnames=("patch", "max_iters", "sigma_floor", "contrast_threshold",
                     "interpret"),
)
def fa_align_batch(
    windows: jax.Array,  # (N, WH, WW) current gradient windows
    ref_patch: jax.Array,  # (N, P2)
    gx: jax.Array,  # (N, P2)
    gy: jax.Array,  # (N, P2)
    uv_init: jax.Array,  # (N, 2)
    origins: jax.Array,  # (N, 2)
    live: jax.Array,  # (N,) bool
    patch: int = 5,
    max_iters: int = 10,
    sigma_floor: float = 1.0,
    contrast_threshold: float = 1.0,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One fused feature-alignment solve. Returns (uv (N,2), rmse (N,),
    converged (N,) bool)."""
    f32 = jnp.float32
    N, WH, WW = windows.shape
    kernel = functools.partial(
        _fa_kernel, patch=patch, win_h=WH, win_w=WW, max_iters=max_iters,
        sigma_floor=sigma_floor, contrast_threshold=contrast_threshold,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, 4), f32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        windows.astype(f32).reshape(N, WH * WW), ref_patch.astype(f32),
        gx.astype(f32), gy.astype(f32), uv_init.astype(f32),
        origins.astype(f32), live.astype(f32)[:, None],
    )
    dtype = uv_init.dtype
    return out[:, 0:2].astype(dtype), out[:, 2].astype(dtype), out[:, 3] > 0.5

"""Batched pyramidal Lucas-Kanade optical flow in pure JAX.

Replaces ``cv::calcOpticalFlowPyrLK`` used by the reference's bootstrap
(``algorithm::computeOpticalFlowSparse``, src/algorithm.cpp:29-107): track N
features from ref to cur through an intensity pyramid, coarse→fine, with a
fixed-iteration per-level GN on 2D translation. All N features advance in one
fused tensor program (vmap replaces OpenCV's per-feature loop) — TPU-shaped.
Also provides the reference's median-disparity bootstrap gate.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from sdvo_tpu.geometry.robust import masked_median
from sdvo_tpu.image.interp import bilinear_sample, patch_offsets


def _track_level(
    ref_img: jax.Array,
    cur_img: jax.Array,
    uv_ref_l: jax.Array,  # (N, 2) positions at this level
    flow: jax.Array,  # (N, 2) current flow estimate at this level
    window: int,
    iterations: int,
):
    H, W = ref_img.shape
    offs = patch_offsets(window, dtype=uv_ref_l.dtype)  # (W², 2)
    uv = uv_ref_l[:, None, :] + offs[None, :, :]  # (N, W², 2)
    ref_patch, ref_ok = bilinear_sample(ref_img, uv)
    ex = jnp.array([1.0, 0.0], uv.dtype)
    ey = jnp.array([0.0, 1.0], uv.dtype)
    Ix = 0.5 * (bilinear_sample(ref_img, uv + ex)[0] - bilinear_sample(ref_img, uv - ex)[0])
    Iy = 0.5 * (bilinear_sample(ref_img, uv + ey)[0] - bilinear_sample(ref_img, uv - ey)[0])
    # 2×2 structure tensor per feature
    gxx = jnp.sum(Ix * Ix, axis=-1)
    gxy = jnp.sum(Ix * Iy, axis=-1)
    gyy = jnp.sum(Iy * Iy, axis=-1)
    det = gxx * gyy - gxy * gxy
    ok = jnp.all(ref_ok, axis=-1) & (det > 1e-6)
    det_safe = jnp.where(ok, det, 1.0)

    def body(i, fl):
        cur_vals, cur_ok = bilinear_sample(cur_img, uv + fl[:, None, :])
        dI = jnp.where(cur_ok, ref_patch - cur_vals, 0.0)
        bx = jnp.sum(dI * Ix, axis=-1)
        by = jnp.sum(dI * Iy, axis=-1)
        vx = (gyy * bx - gxy * by) / det_safe
        vy = (gxx * by - gxy * bx) / det_safe
        step = jnp.stack([vx, vy], axis=-1)
        return fl + jnp.where(ok[:, None], step, 0.0)

    flow = jax.lax.fori_loop(0, iterations, body, flow)
    return flow, ok


def pyramidal_klt(
    ref_pyramid: Sequence[jax.Array],
    cur_pyramid: Sequence[jax.Array],
    uv_ref: jax.Array,  # (N, 2) level-0 positions in ref
    window: int = 11,
    iterations: int = 20,
    max_error: float = 25.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Track uv_ref from ref to cur. Returns (uv_cur (N,2), status (N,),
    error (N,) mean |I_ref - I_cur| over the window)."""
    L = len(ref_pyramid)
    N = uv_ref.shape[0]
    flow = jnp.zeros((N, 2), uv_ref.dtype)  # at the coarsest level scale
    ok_all = jnp.ones((N,), bool)
    for level in range(L - 1, -1, -1):
        scale = 1.0 / (1 << level)
        uv_l = uv_ref * scale
        flow, ok = _track_level(
            ref_pyramid[level], cur_pyramid[level], uv_l, flow, window, iterations
        )
        ok_all = ok_all & ok
        if level > 0:
            flow = flow * 2.0
    uv_cur = uv_ref + flow
    # final photometric error at level 0
    offs = patch_offsets(window, dtype=uv_ref.dtype)
    ref_patch, _ = bilinear_sample(ref_pyramid[0], uv_ref[:, None, :] + offs[None, :, :])
    cur_patch, cur_ok = bilinear_sample(cur_pyramid[0], uv_cur[:, None, :] + offs[None, :, :])
    err = jnp.mean(jnp.abs(ref_patch - cur_patch), axis=-1)
    H, W = cur_pyramid[0].shape
    inside = (
        (uv_cur[:, 0] >= 0) & (uv_cur[:, 1] >= 0) & (uv_cur[:, 0] < W - 1) & (uv_cur[:, 1] < H - 1)
    )
    status = ok_all & inside & jnp.all(cur_ok, axis=-1) & (err < max_error)
    return uv_cur, status, err


def optical_flow_with_gate(
    ref_pyramid, cur_pyramid, uv_ref, valid, window=11, iterations=20,
    disparity_threshold: float = 5.0,
):
    """The reference's computeOpticalFlowSparse semantics
    (src/algorithm.cpp:29-107): track, drop failures, and report whether the
    MEDIAN disparity of surviving tracks exceeds the bootstrap threshold.

    Returns (uv_cur, status, median_disparity, enough_baseline).
    """
    uv_cur, status, err = pyramidal_klt(ref_pyramid, cur_pyramid, uv_ref, window, iterations)
    status = status & valid
    disp = jnp.linalg.norm(uv_cur - uv_ref, axis=-1)
    med = masked_median(disp, status)
    return uv_cur, status, med, med > disparity_threshold

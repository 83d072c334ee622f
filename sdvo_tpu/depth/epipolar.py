"""Batched epipolar-line ZSSD matching for depth-filter updates.

Replaces ``algorithm::matchEpipolarConstraint`` (src/algorithm.cpp:412-551):
project the [min, max]-depth hypotheses into the current frame, walk the
epipolar segment scoring a zero-mean SAD between patches, take the argmin,
triangulate.

TPU redesign (two levels):

* The reference walks a variable-length segment per feature in a scalar loop;
  here every filter samples a FIXED number of positions K along its own
  segment (short segments oversample — harmless), so the whole filter bank is
  one batched program (SURVEY §7 hard part (d)).
* The reference warps the CURRENT-image sample grid by a per-feature affine A
  (src/algorithm.cpp:369-394) — per-pixel fractional positions, i.e. scattered
  element gathers, the slowest memory pattern on TPU. Instead the current
  image is sampled on the AXIS-ALIGNED patch grid via a shifted patch stack
  (contiguous row gathers, sdvo_tpu.image.stack) and the compensating inverse
  warp A⁻¹ is applied to the STORED reference patch — a local (P², P²)
  bilinear resample inside the 7×7 patch (clamped at the patch border),
  which is a trivial batched matmul. Photometrically this scores the same
  alignment hypothesis; the only approximation is border clamping of the
  warped reference patch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sdvo_tpu.geometry.se3 import SE3
from sdvo_tpu.geometry.triangulation import triangulate_two_view_depth
from sdvo_tpu.image.interp import patch_offsets
from sdvo_tpu.image.stack import PatchStack, sample_patches


def affine_warp_matrix(
    T_cur_ref: SE3,
    uv_ref: jax.Array,  # (F, 2)
    depth_ref: jax.Array,  # (F,)
    fx, fy, cx, cy,
    half_patch: int,
) -> jax.Array:
    """Batched first-order affine warp ref-patch → cur-patch
    (``algorithm::getAffineWarp``, src/algorithm.cpp:335-367): finite
    differences of the reprojection at (+h, 0) and (0, +h)."""

    def backproject(uv):
        x = (uv[..., 0] - cx) / fx
        y = (uv[..., 1] - cy) / fy
        b = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        return b / jnp.linalg.norm(b, axis=-1, keepdims=True)

    def project(p):
        z = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
        return jnp.stack([fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy], axis=-1)

    h = float(half_patch)
    du = jnp.asarray([h, 0.0], uv_ref.dtype)
    dv = jnp.asarray([0.0, h], uv_ref.dtype)
    p_c = backproject(uv_ref) * depth_ref[:, None]
    p_u = backproject(uv_ref + du) * depth_ref[:, None]
    p_v = backproject(uv_ref + dv) * depth_ref[:, None]
    c_c = project(T_cur_ref.apply(p_c))
    c_u = project(T_cur_ref.apply(p_u))
    c_v = project(T_cur_ref.apply(p_v))
    A = jnp.stack([(c_u - c_c) / h, (c_v - c_c) / h], axis=-1)  # (F, 2, 2) cols
    return A


def _inv2x2(A: jax.Array) -> jax.Array:
    a, b = A[..., 0, 0], A[..., 0, 1]
    c, d = A[..., 1, 0], A[..., 1, 1]
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) < 1e-9, 1.0, det)
    inv = jnp.stack(
        [jnp.stack([d, -b], axis=-1), jnp.stack([-c, a], axis=-1)], axis=-2
    )
    return inv / det[..., None, None]


def warp_ref_patches(ref_patches: jax.Array, A_inv: jax.Array, patch_size: int) -> jax.Array:
    """Resample stored reference patches through A⁻¹ (bilinear inside the
    patch, border-clamped). ref_patches: (F, P²), A_inv: (F, 2, 2) mapping
    cur-grid offsets → ref-grid offsets. Returns (F, P²)."""
    F = ref_patches.shape[0]
    P = patch_size
    half = P // 2
    dtype = ref_patches.dtype
    offs = patch_offsets(P, dtype)  # (P², 2) axis-aligned cur-grid offsets
    q = jnp.einsum("fij,pj->fpi", A_inv, offs)  # (F, P², 2) ref-grid offsets
    # exact clip: q = P-1 lands on the edge sample with wx = 0 (the ix = P-1
    # edge fold below keeps the +1 selector in-bounds)
    qx = jnp.clip(q[..., 0] + half, 0.0, P - 1.0)
    qy = jnp.clip(q[..., 1] + half, 0.0, P - 1.0)
    x0 = jnp.floor(qx)
    y0 = jnp.floor(qy)
    wx = (qx - x0)[..., None]  # (F, P², 1)
    wy = (qy - y0)[..., None]
    grid = ref_patches.reshape(F, P, P)
    ix = x0.astype(jnp.int32)
    iy = y0.astype(jnp.int32)
    # one-hot row/col selectors → the whole warp is two tiny batched matmuls
    ar = jnp.arange(P)
    selx0 = (ix[..., None] == ar).astype(dtype)  # (F, P², P)
    selx1 = (ix[..., None] + 1 == ar).astype(dtype)
    sely0 = (iy[..., None] == ar).astype(dtype)
    sely1 = (iy[..., None] + 1 == ar).astype(dtype)
    selx = selx0 * (1.0 - wx) + selx1 * wx
    sely = sely0 * (1.0 - wy) + sely1 * wy
    # clamped +1 at the border: fold the weight back onto the edge sample
    edge_x = (ix == P - 1).astype(dtype)[..., None]
    edge_y = (iy == P - 1).astype(dtype)[..., None]
    selx = selx + selx0 * wx * edge_x
    sely = sely + sely0 * wy * edge_y
    rows = jnp.einsum("fpy,fyx->fpx", sely, grid)  # (F, P², P)
    return jnp.einsum("fpx,fpx->fp", rows, selx)


def zssd_score(ref_patch: jax.Array, cur_patch: jax.Array) -> jax.Array:
    """Zero-mean SAD (the reference's ``computeScore``,
    src/algorithm.cpp:396-410 — despite the ZSSD name it sums |·|)."""
    r = ref_patch - jnp.mean(ref_patch, axis=-1, keepdims=True)
    c = cur_patch - jnp.mean(cur_patch, axis=-1, keepdims=True)
    return jnp.sum(jnp.abs(r - c), axis=-1)


def epipolar_search(
    T_cur_ref: SE3,  # batched (F,) relative poses ref-kf → cur
    cur: jax.Array,  # (H, W) current image OR a prebuilt PatchStack for it
    ref_patches: jax.Array,  # (F, P²) fixed reference patches
    bearings_ref: jax.Array,  # (F, 3) unit
    mu: jax.Array,  # (F,) inverse-depth mean
    inv_min: jax.Array,  # (F,) upper inverse depth (near bound)
    inv_max: jax.Array,  # (F,) lower inverse depth (far bound)
    valid: jax.Array,  # (F,)
    fx, fy, cx, cy,
    patch_size: int = 7,
    num_steps: int = 16,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (depth_ref (F,), matched (F,), best_uv (F, 2)).

    depth_ref is the triangulated depth along the reference bearing at the
    best-scoring location; ``matched`` combines the in-image, score and
    cheirality gates (threshold = patchArea·128, src/algorithm.cpp:427).
    """
    if isinstance(cur, PatchStack):
        cur_stack = cur
        W = cur_stack.width.astype(mu.dtype)
        H = cur_stack.height.astype(mu.dtype)
    else:
        # window path: per-(filter, step) block-aligned windows — the full
        # 7×7 shifted stack moved ~90 MB of HBM per frame to feed 8k samples
        cur_stack = None
        H = jnp.asarray(cur.shape[0], mu.dtype)
        W = jnp.asarray(cur.shape[1], mu.dtype)
    dtype = mu.dtype
    half = patch_size // 2
    P2 = patch_size * patch_size

    def project(p):
        z = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
        return jnp.stack([fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy], axis=-1)

    def clampuv(uv):
        return jnp.stack(
            [jnp.clip(uv[..., 0], 0.0, W - 1.0), jnp.clip(uv[..., 1], 0.0, H - 1.0)], axis=-1
        )

    d_center = 1.0 / jnp.maximum(mu, 1e-9)
    d_min = 1.0 / jnp.maximum(inv_min, 1e-9)  # near depth
    d_max = 1.0 / jnp.maximum(inv_max, 1e-9)  # far depth
    p_center = T_cur_ref.apply(bearings_ref * d_center[:, None])
    in_front = p_center[..., 2] > 0.0
    uv_center = project(p_center)
    inside = (
        (uv_center[..., 0] >= 0) & (uv_center[..., 0] < W)
        & (uv_center[..., 1] >= 0) & (uv_center[..., 1] < H)
    )
    live = valid & in_front & inside

    uv_min = clampuv(project(T_cur_ref.apply(bearings_ref * d_min[:, None])))
    uv_max = clampuv(project(T_cur_ref.apply(bearings_ref * d_max[:, None])))
    epi = uv_max - uv_min  # (F, 2)
    norm = jnp.linalg.norm(epi, axis=-1)

    # affine warp at the center depth, applied INVERSELY to the stored
    # reference patch (see module docstring); reference pixel position =
    # projection of the ref-frame point under the identity pose
    z_ref = bearings_ref[..., 2] * d_center
    uv_ref = jnp.stack(
        [fx * bearings_ref[..., 0] * d_center / jnp.maximum(z_ref, 1e-9) + cx,
         fy * bearings_ref[..., 1] * d_center / jnp.maximum(z_ref, 1e-9) + cy],
        axis=-1,
    )
    A = affine_warp_matrix(T_cur_ref, uv_ref, d_center, fx, fy, cx, cy, half)  # (F,2,2)
    ref_warped = warp_ref_patches(ref_patches, _inv2x2(A), patch_size)  # (F, P²)

    # fixed-K positions along the segment (short segments oversample)
    t = (jnp.arange(num_steps, dtype=dtype) + 0.5) / num_steps  # (K,)
    locs = uv_min[:, None, :] + t[None, :, None] * epi[:, None, :]  # (F, K, 2)
    if cur_stack is not None:
        cur_vals, patch_ok = sample_patches(cur_stack, locs)  # (F, K, P²), (F, K)
        scores = zssd_score(ref_warped[:, None, :], cur_vals)  # (F, K)
    else:
        from sdvo_tpu.ops.window_sampler import sample_windows, window_gather

        Fn, K = locs.shape[:2]
        locs_f = locs.reshape(Fn * K, 2)
        # (bf16 windows were tried for this gather in round 5 — no measurable
        # win at the 2 ms/frame state, so the path stays f32 for exact parity
        # with the XLA backend; depth_scores accepts bf16 if that changes)
        win, org, ok_w = window_gather(cur, locs_f, win_h=patch_size + 5)
        if jax.default_backend() == "tpu":
            # fused scoring sweep: sample+center+ZSSD for all (filter, step)
            # rows in one gridded Mosaic kernel (ops.pallas_depth)
            from sdvo_tpu.ops.pallas_depth import depth_scores

            cref = ref_warped - jnp.mean(ref_warped, axis=-1, keepdims=True)
            cref_rep = jnp.repeat(cref.astype(jnp.float32), K, axis=0)
            sc, ok_s = depth_scores(
                win.reshape(Fn * K, -1), cref_rep, (locs_f - org),
                patch=patch_size, win_h=patch_size + 5, win_w=win.shape[-1],
            )
            scores = sc.reshape(Fn, K).astype(dtype)
            patch_ok = (ok_w & ok_s).reshape(Fn, K)
        else:
            vals, ok_s = sample_windows(win, locs_f - org, patch_size)
            cur_vals = vals.reshape(Fn, K, P2)
            patch_ok = (ok_w & ok_s).reshape(Fn, K)
            scores = zssd_score(ref_warped[:, None, :], cur_vals)
    scores = jnp.where(patch_ok, scores, jnp.inf)

    short = norm < 2.0
    best_k = jnp.argmin(scores, axis=-1)
    best_score = jnp.min(scores, axis=-1)
    best_uv_long = jnp.take_along_axis(locs, best_k[:, None, None], axis=1)[:, 0, :]
    uv_mid = 0.5 * (uv_min + uv_max)
    best_uv = jnp.where(short[:, None], uv_mid, best_uv_long)

    threshold = P2 * 128.0
    score_ok = short | (best_score < threshold)

    # triangulate depth along the ref bearing
    x = (best_uv[..., 0] - cx) / fx
    y = (best_uv[..., 1] - cy) / fy
    bearing_cur = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    depth = triangulate_two_view_depth(T_cur_ref, bearings_ref, bearing_cur)
    depth_ok = depth > 1e-6
    matched = live & score_ok & depth_ok
    return depth, matched, best_uv

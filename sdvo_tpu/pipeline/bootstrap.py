"""Two-frame map bootstrap.

The reference's ``processSecondFrame`` pipeline (src/system.cpp:117-302):
KLT optical flow → median-disparity gate → essential-matrix RANSAC → Sampson
correction → pose recovery with cheirality vote → DLT triangulation → scale
normalization (median scene depth → initMapScaleFactor, :172-190) → two-view
BA. Every geometric stage here is the batched JAX version (KLT:
sdvo_tpu.features.klt; E-RANSAC: sdvo_tpu.geometry.essential; BA:
sdvo_tpu.ba).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sdvo_tpu.ba.bundle_adjustment import (
    BAObservations,
    BASettings,
    build_point_table,
    two_view_ba,
)
from sdvo_tpu.features.klt import optical_flow_with_gate
from sdvo_tpu.geometry import se3
from sdvo_tpu.geometry.se3 import SE3
from sdvo_tpu.geometry.essential import find_essential_ransac, recover_pose
from sdvo_tpu.geometry.triangulation import (
    sampson_correction,
    triangulate_two_view_depth,
)


class BootstrapResult(NamedTuple):
    success: bool
    reason: str
    T_cur_ref: Optional[np.ndarray]  # 4x4, scaled
    uv_ref: Optional[np.ndarray]  # (N, 2) inlier features in ref
    uv_cur: Optional[np.ndarray]  # (N, 2) inlier features in cur
    points_w: Optional[np.ndarray]  # (N, 3) triangulated, world = ref camera
    median_depth: float = 0.0
    min_depth: float = 0.0


def bootstrap_two_view(
    ref_pyramid,
    cur_pyramid,
    uv_ref: np.ndarray,  # (N, 2) detected features in the ref frame
    cam,
    key,
    min_disparity: float = 5.0,
    min_inliers: int = 50,
    map_scale_factor: float = 1.0,
    klt_window: int = 11,
    ransac_hypotheses: int = 256,
    ransac_threshold_px: float = 1.0,
    run_ba: bool = True,
) -> BootstrapResult:
    N = uv_ref.shape[0]
    uv_ref_j = jnp.asarray(uv_ref)
    valid = jnp.ones((N,), bool)

    # 1. KLT + disparity gate (src/algorithm.cpp:29-107)
    uv_cur, status, med_disp, enough = optical_flow_with_gate(
        ref_pyramid.images, cur_pyramid.images, uv_ref_j, valid,
        window=klt_window, disparity_threshold=min_disparity,
    )
    if not bool(enough):
        return BootstrapResult(False, f"insufficient disparity ({float(med_disp):.2f}px)", None, None, None, None)

    # 2. E-matrix RANSAC on normalized coordinates (src/algorithm.cpp:109-171)
    x_ref = cam.normalized(uv_ref_j)[..., :2]
    x_cur = cam.normalized(uv_cur)[..., :2]
    thr = (ransac_threshold_px / float(cam.fx)) ** 2
    E, inliers, count = find_essential_ransac(
        x_ref, x_cur, status, key, num_hypotheses=ransac_hypotheses, threshold=thr
    )
    if int(count) < min_inliers:
        return BootstrapResult(False, f"too few E-inliers ({int(count)})", None, None, None, None)

    # 3. Sampson correction toward the epipolar manifold (:173-237)
    h_ref = jnp.concatenate([x_ref, jnp.ones_like(x_ref[..., :1])], axis=-1)
    h_cur = jnp.concatenate([x_cur, jnp.ones_like(x_cur[..., :1])], axis=-1)
    h_ref_c, h_cur_c = sampson_correction(E, h_ref, h_cur)
    x_ref_c = h_ref_c[..., :2] / h_ref_c[..., 2:3]
    x_cur_c = h_cur_c[..., :2] / h_cur_c[..., 2:3]

    # 4. pose recovery (cheirality vote, :241-333)
    T_rel, cheir = recover_pose(E, x_ref_c, x_cur_c, inliers)
    good = inliers & cheir

    # 5. triangulate along ref bearings (unit-scale translation)
    f_ref = jnp.concatenate([x_ref_c, jnp.ones_like(x_ref_c[..., :1])], axis=-1)
    f_cur = jnp.concatenate([x_cur_c, jnp.ones_like(x_cur_c[..., :1])], axis=-1)
    d_ref = triangulate_two_view_depth(T_rel, f_ref, f_cur)
    p_ref = d_ref[..., None] * f_ref  # ref camera frame == world
    z_cur = T_rel.apply(p_ref)[..., 2]
    good = good & (d_ref > 1e-6) & (z_cur > 1e-6)

    good_np = np.asarray(good)
    if good_np.sum() < min_inliers:
        return BootstrapResult(False, f"too few triangulated ({int(good_np.sum())})", None, None, None, None)

    # 6. scale: median depth in CUR camera → map_scale_factor (src/system.cpp:172-190)
    z_cur_np = np.asarray(z_cur)[good_np]
    median_depth = float(np.median(z_cur_np))
    scale = map_scale_factor / median_depth
    T_scaled = SE3(T_rel.rotation, T_rel.translation * scale)
    p_w = np.asarray(p_ref)[good_np] * scale

    uv_ref_in = np.asarray(uv_ref)[good_np]
    uv_cur_in = np.asarray(uv_cur)[good_np]

    # 7. two-view BA (src/bundle_adjustment.cpp:397-478)
    if run_ba:
        P = p_w.shape[0]
        poses = SE3(
            jnp.stack([jnp.eye(3, dtype=jnp.float64), T_scaled.rotation.astype(jnp.float64)]),
            jnp.stack([jnp.zeros(3, dtype=jnp.float64), T_scaled.translation.astype(jnp.float64)]),
        )
        cam_idx = np.concatenate([np.zeros(P, np.int32), np.ones(P, np.int32)])
        pt_idx = np.concatenate([np.arange(P, dtype=np.int32)] * 2)
        uv_all = np.concatenate([uv_ref_in, uv_cur_in])
        obs = BAObservations(
            cam_idx=jnp.asarray(cam_idx),
            pt_idx=jnp.asarray(pt_idx),
            uv=jnp.asarray(uv_all),
            valid=jnp.ones((2 * P,), bool),
        )
        table = jnp.asarray(build_point_table(pt_idx, np.ones(2 * P, bool), P, 2))
        poses_out, pts_out, chi2_obs, _ = two_view_ba(
            poses, jnp.asarray(p_w), obs, table, jnp.zeros((P,), bool),
            cam.fx, cam.fy, cam.cx, cam.cy, settings=BASettings(iterations=10, huber_delta=2.0),
        )
        # chi2 pruning (reference prunes edges > threshold after BA)
        chi2_np = np.asarray(chi2_obs).reshape(2, P)
        keep = (chi2_np < 5.991).all(axis=0)
        if keep.sum() < min_inliers:
            # adaptive fallback: the fixed 95% gate assumes ~1 px observation
            # noise; a sequence bootstrapping at larger residuals (blur,
            # rolling shutter, synthetic anti-aliasing) would lose EVERY
            # point and silently fail the whole init. Keep the best 70% by
            # worst-view chi² instead, and say so loudly.
            worst = chi2_np.max(axis=0)
            thr = max(5.991, float(np.quantile(worst, 0.7)))
            keep = worst <= thr
            import logging

            logging.getLogger("sdvo_tpu.Bootstrap").warning(
                "two-view BA chi2 gate 5.991 kept %d < %d points; relaxed to "
                "%.2f (70%% quantile), keeping %d",
                int((chi2_np < 5.991).all(axis=0).sum()), min_inliers,
                thr, int(keep.sum()),
            )
        p_w = np.asarray(pts_out)[keep]
        uv_ref_in = uv_ref_in[keep]
        uv_cur_in = uv_cur_in[keep]
        T_scaled = SE3(poses_out.rotation[1], poses_out.translation[1])
        z_after = np.asarray(T_scaled.apply(jnp.asarray(p_w)))[:, 2]
        pos = z_after > 1e-6
        p_w, uv_ref_in, uv_cur_in = p_w[pos], uv_ref_in[pos], uv_cur_in[pos]
        median_depth = float(np.median(z_after[pos]))

    if len(p_w) < min_inliers:
        return BootstrapResult(False, f"too few after BA ({len(p_w)})", None, None, None, None)

    T44 = np.asarray(SE3(T_scaled.rotation, T_scaled.translation).as_matrix(), dtype=np.float64)
    min_depth = float(np.min(np.asarray(T_scaled.apply(jnp.asarray(p_w)))[:, 2]))
    return BootstrapResult(True, "ok", T44, uv_ref_in, uv_cur_in, p_w, median_depth, min_depth)

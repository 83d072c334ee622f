"""Windowed bundle adjustment via batched Schur complement — the g2o
replacement.

The reference does sparse graph BA through g2o with CHOLMOD and the Schur
trick over marginalized landmark vertices (src/bundle_adjustment.cpp:311-339:
LM + BlockSolver_6_3 + marginalized points; twoViewBA :397-478; localBA
:480-625; plus hand-rolled optimizePose :35-177 and optimizeStructure
:179-304). TPU-native redesign:

* All observations live in fixed-capacity SoA arrays (cam_idx, pt_idx, uv,
  valid) — no graph objects; per-observation residuals/Jacobians come from one
  vmapped evaluation.
* Camera Hessian blocks ``Hcc`` (K,6,6) and landmark blocks ``Hpp`` (P,3,3)
  accumulate with ``segment_sum`` (a scatter-add the TPU does well).
* The Schur complement uses the closed-form cofactor inverse of each damped
  3×3 landmark block, and a per-point observation table (P, M_max) to form the
  camera-camera fill-in as a batched (M,M) block outer product — the window
  has K ≤ ~10 cameras, so the reduced system is ≤ 60×60 and solves with one
  dense Cholesky (the role CHOLMOD plays in the reference).
* Fixed cameras (twoViewBA fixes the first frame :417; localBA fixes
  out-of-window covisible keyframes :519) are handled by zeroing their
  Jacobian columns, which pins their poses exactly.
* LM accept/reject + Huber weights + post-hoc per-observation chi2 for outlier
  pruning (the reference prunes edges with chi2 > threshold after solving,
  :454-477, :583-624) — returned to the caller as a mask.

The distributed variant (landmark blocks sharded over a mesh axis, Schur
reduction via psum) lives in sdvo_tpu.parallel.dist_ba and reuses these
per-shard primitives.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdvo_tpu.geometry import se3
from sdvo_tpu.geometry.se3 import SE3


class BAObservations(NamedTuple):
    """Fixed-capacity observation set.

    cam_idx / pt_idx index into the pose window (K) and point arena (P).
    uv is the PIXEL observation; residuals are in pixels so chi2 thresholds
    match the reference's g2o setup.
    """

    cam_idx: jax.Array  # (M,) int32
    pt_idx: jax.Array  # (M,) int32
    uv: jax.Array  # (M, 2)
    valid: jax.Array  # (M,) bool


class BASettings(NamedTuple):
    iterations: int = 10
    huber_delta: float = 2.0  # pixels
    init_lambda: float = 1e-4
    lambda_up: float = 10.0
    lambda_down: float = 0.1
    chi2_prune: float = 5.991  # 95% chi-square with 2 dof — g2o convention


def _project_residual(T: SE3, pts: jax.Array, uv: jax.Array, fx, fy, cx, cy):
    """r = pi(T p) - uv (pixels). Returns (r (M,2), z (M,), p_cam (M,3))."""
    p_cam = T.apply(pts)
    z = p_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * p_cam[..., 0] / z_safe + cx
    v = fy * p_cam[..., 1] / z_safe + cy
    r = jnp.stack([u, v], axis=-1) - uv
    return r, z, p_cam


def _jacobians(T: SE3, p_cam: jax.Array, fx, fy):
    """Analytic Jc (M,2,6) wrt right-perturbation of the camera pose and
    Jp (M,2,3) wrt the world point."""
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    zeros = jnp.zeros_like(x)
    # duv/dp_cam
    Jpix = jnp.stack(
        [
            jnp.stack([fx * iz, zeros, -fx * x * iz2], axis=-1),
            jnp.stack([zeros, fy * iz, -fy * y * iz2], axis=-1),
        ],
        axis=-2,
    )  # (M, 2, 3)
    # right perturbation T·exp(xi): dp_cam/dxi = [R | R·(-hat(p_w))]? No:
    # p_cam = T·exp(xi)·p_w => d/dxi = R_T [I | -hat(p_w)] — but expressing via
    # p_cam is cleaner: T·exp(xi)·p_w = T p_w + R(xi_u + xi_w × p_w) + O(xi²);
    # using the CAMERA-frame perturbation exp(xi)·(T p_w) instead gives
    # dp_cam/dxi = [I | -hat(p_cam)] — we adopt the camera-frame convention
    # (update composes exp(-dx) on the LEFT of T).
    eye = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), p_cam.shape[:-1] + (3, 3))
    dpdxi = jnp.concatenate([eye, -se3.hat(p_cam)], axis=-1)  # (M, 3, 6)
    Jc = Jpix @ dpdxi  # (M, 2, 6)
    # dp_cam/dp_w = R
    Jp = Jpix @ jnp.broadcast_to(T.rotation, p_cam.shape[:-1] + (3, 3))
    return Jc, Jp


def _huber_w(r: jax.Array, delta: float):
    """Per-observation Huber IRLS weight on the residual norm (g2o's
    RobustKernelHuber)."""
    n = jnp.linalg.norm(r, axis=-1)
    return jnp.where(n <= delta, 1.0, delta / jnp.maximum(n, 1e-12))


def _inv3x3(H: jax.Array) -> jax.Array:
    a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    d, e, f = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    g, h, i = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    inv = adj / det_safe[..., None, None]
    return jnp.where((jnp.abs(det) < 1e-12)[..., None, None], 0.0, inv)


def build_point_table(pt_idx: np.ndarray, valid: np.ndarray, num_points: int, max_obs: int) -> np.ndarray:
    """Host-side: per-point observation-index table (P, max_obs), padded -1.

    The observation STRUCTURE is static across LM iterations, so this packs
    once per BA call.
    """
    table = -np.ones((num_points, max_obs), dtype=np.int32)
    fill = np.zeros(num_points, dtype=np.int32)
    for m, (p, ok) in enumerate(zip(np.asarray(pt_idx), np.asarray(valid))):
        if not ok or p < 0:
            continue
        if fill[p] < max_obs:
            table[p, fill[p]] = m
            fill[p] += 1
    return table


class _BAState(NamedTuple):
    poses: SE3  # (K,)
    points: jax.Array  # (P, 3)
    lam: jax.Array
    chi2: jax.Array


@partial(jax.jit, static_argnames=("settings", "num_cams"))
def local_ba(
    poses: SE3,  # (K,) world→camera
    points: jax.Array,  # (P, 3)
    obs: BAObservations,
    point_table: jax.Array,  # (P, M_max) int32, -1 padded
    fixed_cam: jax.Array,  # (K,) bool
    fixed_pt: jax.Array,  # (P,) bool (e.g. unused arena slots)
    fx, fy, cx, cy,
    settings: BASettings = BASettings(),
    num_cams: Optional[int] = None,
) -> Tuple[SE3, jax.Array, jax.Array, jax.Array]:
    """Schur-complement LM bundle adjustment over a keyframe window.

    Returns (poses, points, chi2_per_obs, total_chi2). Callers prune
    observations with chi2_per_obs > settings.chi2_prune afterwards, as the
    reference does post-solve (src/bundle_adjustment.cpp:454-477).
    """
    K = num_cams if num_cams is not None else poses.translation.shape[0]
    P = points.shape[0]
    dtype = points.dtype
    fxj = jnp.asarray(fx, dtype)
    fyj = jnp.asarray(fy, dtype)
    cxj = jnp.asarray(cx, dtype)
    cyj = jnp.asarray(cy, dtype)

    def gather_pose(idx):
        return SE3(poses.rotation[idx], poses.translation[idx])

    def residuals(poses_, points_):
        T = SE3(poses_.rotation[obs.cam_idx], poses_.translation[obs.cam_idx])
        pts = points_[obs.pt_idx]
        r, z, p_cam = _project_residual(T, pts, obs.uv, fxj, fyj, cxj, cyj)
        ok = obs.valid & (z > 1e-6) & ~fixed_pt[obs.pt_idx]
        r = jnp.where(ok[:, None], r, 0.0)
        return r, ok, p_cam, T

    def chi2_of(r, w, ok):
        return jnp.sum(jnp.where(ok, w * jnp.sum(r * r, axis=-1), 0.0))

    r0, ok0, _, _ = residuals(poses, points)
    w0 = _huber_w(r0, settings.huber_delta)
    state = _BAState(poses, points, jnp.asarray(settings.init_lambda, dtype), chi2_of(r0, w0, ok0))

    def step(s: _BAState, _):
        r, ok, p_cam, T = residuals(s.poses, s.points)
        w = _huber_w(r, settings.huber_delta) * ok.astype(dtype)
        Jc, Jp = _jacobians(T, p_cam, fxj, fyj)
        # zero jacobians of fixed cameras and invalid obs
        free_cam = (~fixed_cam)[obs.cam_idx].astype(dtype) * ok.astype(dtype)
        Jc = Jc * free_cam[:, None, None]
        Jp = Jp * ok.astype(dtype)[:, None, None]

        # per-observation weighted blocks
        JcW = Jc * w[:, None, None]  # (M,2,6)
        JpW = Jp * w[:, None, None]
        Hcc_obs = jnp.einsum("mri,mrj->mij", JcW, Jc)  # (M,6,6)
        Hpp_obs = jnp.einsum("mri,mrj->mij", JpW, Jp)  # (M,3,3)
        Wcp_obs = jnp.einsum("mri,mrj->mij", JcW, Jp)  # (M,6,3)
        gc_obs = jnp.einsum("mri,mr->mi", JcW, r)  # (M,6)
        gp_obs = jnp.einsum("mri,mr->mi", JpW, r)  # (M,3)

        Hcc = jax.ops.segment_sum(Hcc_obs, obs.cam_idx, num_segments=K)  # (K,6,6)
        gc = jax.ops.segment_sum(gc_obs, obs.cam_idx, num_segments=K)
        Hpp = jax.ops.segment_sum(Hpp_obs, obs.pt_idx, num_segments=P)
        gp = jax.ops.segment_sum(gp_obs, obs.pt_idx, num_segments=P)

        lam = s.lam
        Hpp_d = Hpp + lam * jnp.eye(3, dtype=dtype)
        Hpp_inv = _inv3x3(Hpp_d)  # (P,3,3)

        # --- Schur fill-in via the per-point table -------------------------
        Mmax = point_table.shape[1]
        t_ok = point_table >= 0  # (P, Mmax)
        t_idx = jnp.maximum(point_table, 0)
        Wp = Wcp_obs[t_idx] * t_ok[..., None, None]  # (P, Mmax, 6, 3)
        cam_of = jnp.where(t_ok, obs.cam_idx[t_idx], 0)  # (P, Mmax)
        Y = jnp.einsum("pmij,pjk->pmik", Wp, Hpp_inv)  # (P, Mmax, 6, 3)
        # camera-pair fill-in: (P, Mmax, Mmax, 6, 6)
        F = jnp.einsum("paik,pbjk->pabij", Y, Wp)
        pair_idx = cam_of[:, :, None] * K + cam_of[:, None, :]  # (P,Mmax,Mmax)
        pair_ok = t_ok[:, :, None] & t_ok[:, None, :]
        F = F * pair_ok[..., None, None]
        S_fill = jax.ops.segment_sum(
            F.reshape(-1, 6, 6), pair_idx.reshape(-1), num_segments=K * K
        ).reshape(K, K, 6, 6)
        # reduced rhs: gc - sum_p W Hpp_inv gp
        rhs_fill = jnp.einsum("pmik,pk->pmi", Y, gp)  # (P, Mmax, 6)
        rhs_fill = rhs_fill * t_ok[..., None]
        g_red_fill = jax.ops.segment_sum(
            rhs_fill.reshape(-1, 6), cam_of.reshape(-1), num_segments=K
        )

        S = jnp.zeros((K, K, 6, 6), dtype)
        S = S.at[jnp.arange(K), jnp.arange(K)].set(Hcc + lam * jnp.eye(6, dtype=dtype))
        S = S - S_fill
        g_red = gc - g_red_fill

        # pin fixed cameras: identity rows/cols, zero rhs
        free = (~fixed_cam).astype(dtype)
        S = S * free[:, None, None, None] * free[None, :, None, None]
        S = S.at[jnp.arange(K), jnp.arange(K)].add(
            (1.0 - free)[:, None, None] * jnp.eye(6, dtype=dtype)
        )
        g_red = g_red * free[:, None]

        S_dense = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
        g_dense = g_red.reshape(6 * K)
        L = jnp.linalg.cholesky(S_dense + 1e-10 * jnp.eye(6 * K, dtype=dtype))
        ok_chol = jnp.all(jnp.isfinite(L))
        L_safe = jnp.where(ok_chol, L, jnp.eye(6 * K, dtype=dtype))
        dc = jax.scipy.linalg.cho_solve((L_safe, True), g_dense).reshape(K, 6)
        dc = jnp.where(ok_chol, dc, 0.0)

        # back-substitute points: dp = Hpp_inv (gp - sum_obs Wᵀ dc)
        WTdc = jnp.einsum("pmij,pmi->pmj", Wp, dc[cam_of] * t_ok[..., None])  # (P,Mmax,3)
        WTdc = jnp.sum(WTdc, axis=1)  # (P,3)
        dp = jnp.einsum("pij,pj->pi", Hpp_inv, gp - WTdc)
        dp = jnp.where(fixed_pt[:, None], 0.0, dp)

        # camera-frame left update: T_new = exp(-dc) ∘ T
        delta = se3.exp(-dc)
        poses_new = SE3(
            delta.rotation @ s.poses.rotation,
            jnp.einsum("kij,kj->ki", delta.rotation, s.poses.translation) + delta.translation,
        )
        points_new = s.points - dp

        r_n, ok_n, _, _ = residuals(poses_new, points_new)
        w_n = _huber_w(r_n, settings.huber_delta) * ok_n.astype(dtype)
        chi_n = chi2_of(r_n, w_n, ok_n)
        better = chi_n < s.chi2
        poses_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(better, a, b), poses_new, s.poses
        )
        points_out = jnp.where(better, points_new, s.points)
        lam_out = jnp.where(better, lam * settings.lambda_down, lam * settings.lambda_up)
        chi_out = jnp.where(better, chi_n, s.chi2)
        return _BAState(poses_out, points_out, lam_out, chi_out), None

    final, _ = jax.lax.scan(step, state, None, length=settings.iterations)
    r_f, ok_f, _, _ = residuals(final.poses, final.points)
    chi2_obs = jnp.where(ok_f, jnp.sum(r_f * r_f, axis=-1), 0.0)
    return final.poses, final.points, chi2_obs, final.chi2


def two_view_ba(poses, points, obs, point_table, fixed_pt, fx, fy, cx, cy, settings=BASettings()):
    """First frame fixed, second + points free (src/bundle_adjustment.cpp:397-478)."""
    fixed_cam = jnp.asarray([True, False])
    return local_ba(
        poses, points, obs, point_table, fixed_cam, fixed_pt, fx, fy, cx, cy,
        settings=settings, num_cams=2,
    )


# --- hand-rolled single-frame optimizers (reference optimizePose /
# optimizeStructure, src/bundle_adjustment.cpp:35-304) ------------------------


def optimize_pose(
    T0: SE3, points: jax.Array, bearings: jax.Array, valid: jax.Array,
    settings=None,
):
    """Pose-only motion refinement with bearing-vector residuals (3 per
    observation), matching the reference's optimizePose residual choice
    (src/bundle_adjustment.cpp:85-110: unit bearing vs normalized T·p)."""
    from sdvo_tpu.optim.optimizer import LMSettings, optimize_lm

    settings = settings or LMSettings(max_iterations=15)

    def residual_fn(T):
        p_cam = T.apply(points)
        norm = jnp.linalg.norm(p_cam, axis=-1, keepdims=True)
        f = p_cam / jnp.maximum(norm, 1e-12)
        r = (f - bearings).reshape(-1)
        vis = jnp.broadcast_to(valid[:, None], (points.shape[0], 3)).reshape(-1)
        return jnp.where(vis, r, 0.0), vis

    def jacobian_fn(T):
        # d f/d xi with camera-frame perturbation exp(xi)·p_cam:
        # df/dp = (I - f fᵀ)/|p|; dp/dxi = [I | -hat(p)]
        p_cam = T.apply(points)
        norm = jnp.linalg.norm(p_cam, axis=-1, keepdims=True)
        f = p_cam / jnp.maximum(norm, 1e-12)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=points.dtype), p_cam.shape[:-1] + (3, 3))
        dfdp = (eye - f[..., :, None] * f[..., None, :]) / jnp.maximum(norm[..., None], 1e-12)
        dpdxi = jnp.concatenate([eye, -se3.hat(p_cam)], axis=-1)
        J = dfdp @ dpdxi  # (N,3,6)
        return J.reshape(-1, 6)

    def update_fn(T, dx):
        d = se3.exp(-dx)
        return SE3(d.rotation @ T.rotation, d.rotation @ T.translation + d.translation)

    return optimize_lm(T0, residual_fn, jacobian_fn, update_fn, settings)


def optimize_structure(
    points: jax.Array,  # (P, 3)
    poses: SE3,  # (K,)
    obs: BAObservations,
    point_table: jax.Array,  # (P, M_max)
    fx, fy, cx, cy,
    iterations: int = 5,
):
    """Structure-only refinement: per-point GN over its observations, all
    points in parallel (reference optimizeStructure,
    src/bundle_adjustment.cpp:179-304, one scalar GN per point)."""
    dtype = points.dtype
    fxj, fyj, cxj, cyj = (jnp.asarray(v, dtype) for v in (fx, fy, cx, cy))
    Mmax = point_table.shape[1]
    t_ok = point_table >= 0
    t_idx = jnp.maximum(point_table, 0)
    cam_of = jnp.where(t_ok, obs.cam_idx[t_idx], 0)  # (P, Mmax)
    uv_of = obs.uv[t_idx]  # (P, Mmax, 2)
    R_of = poses.rotation[cam_of]  # (P, Mmax, 3, 3)
    t_of = poses.translation[cam_of]

    def body(i, pts):
        p = pts[:, None, :]  # (P,1,3)
        p_cam = jnp.einsum("pmij,pmj->pmi", R_of, jnp.broadcast_to(p, R_of.shape[:2] + (3,))) + t_of
        z = jnp.where(jnp.abs(p_cam[..., 2]) < 1e-9, 1e-9, p_cam[..., 2])
        u = fxj * p_cam[..., 0] / z + cxj
        v = fyj * p_cam[..., 1] / z + cyj
        r = jnp.stack([u, v], axis=-1) - uv_of  # (P, Mmax, 2)
        ok = t_ok & (p_cam[..., 2] > 1e-6)
        r = jnp.where(ok[..., None], r, 0.0)
        iz = 1.0 / z
        iz2 = iz * iz
        zeros = jnp.zeros_like(z)
        Jpix = jnp.stack(
            [
                jnp.stack([fxj * iz, zeros, -fxj * p_cam[..., 0] * iz2], axis=-1),
                jnp.stack([zeros, fyj * iz, -fyj * p_cam[..., 1] * iz2], axis=-1),
            ],
            axis=-2,
        )  # (P, Mmax, 2, 3)
        Jp = Jpix @ R_of  # (P, Mmax, 2, 3)
        Jp = Jp * ok[..., None, None]
        H = jnp.einsum("pmri,pmrj->pij", Jp, Jp) + 1e-8 * jnp.eye(3, dtype=dtype)
        g = jnp.einsum("pmri,pmr->pi", Jp, r)
        dp = jnp.einsum("pij,pj->pi", _inv3x3(H), g)
        has_obs = jnp.any(t_ok, axis=-1)
        return pts - jnp.where(has_obs[:, None], dp, 0.0)

    return jax.lax.fori_loop(0, iterations, body, points)

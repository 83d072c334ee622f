"""Triangulation and two-view depth recovery, batched over correspondences.

Replaces the reference's DLT triangulation (homogeneous
src/algorithm.cpp:628-653 and inhomogeneous :655-680), bearing-vector two-view
depth (:682-703), Sampson correction (:173-237) and structure/photometric error
metrics (:711-781). Everything vmaps over N correspondences; the per-point
4×4/3×3 solves are tiny dense problems XLA batches well.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sdvo_tpu.geometry.se3 import SE3


def triangulate_dlt_homogeneous(P_ref: jax.Array, P_cur: jax.Array, uv_ref: jax.Array, uv_cur: jax.Array) -> jax.Array:
    """Homogeneous DLT from two 3×4 projection matrices; batched over leading
    dims of uv. Returns world points (..., 3) (src/algorithm.cpp:628-653)."""

    def row_pair(P, uv):
        # u * P[2] - P[0]; v * P[2] - P[1]
        r0 = uv[..., 0:1] * P[..., 2, :] - P[..., 0, :]
        r1 = uv[..., 1:2] * P[..., 2, :] - P[..., 1, :]
        return r0, r1

    r0, r1 = row_pair(P_ref, uv_ref)
    r2, r3 = row_pair(P_cur, uv_cur)
    A = jnp.stack([r0, r1, r2, r3], axis=-2)  # (..., 4, 4)
    # Null vector of A = right-singular vector of smallest singular value.
    _, _, Vt = jnp.linalg.svd(A)
    X = Vt[..., 3, :]
    return X[..., :3] / X[..., 3:4]


def triangulate_two_view_depth(T_cur_ref: SE3, f_ref: jax.Array, f_cur: jax.Array) -> jax.Array:
    """Depth of the point along the *reference* bearing, by solving the 2-view
    least-squares system  [R f_ref | -f_cur] [d_ref, d_cur]ᵀ = -t
    (src/algorithm.cpp:682-703). Bearings need not be unit.

    Returns d_ref (…,) — multiply by f_ref to get the ref-camera point.
    """
    Rf = T_cur_ref.rotate(f_ref)  # (..., 3)
    A = jnp.stack([Rf, -f_cur], axis=-1)  # (..., 3, 2)
    AtA = jnp.einsum("...ij,...ik->...jk", A, A)  # (..., 2, 2)
    Atb = jnp.einsum("...ij,...i->...j", A, -jnp.broadcast_to(T_cur_ref.translation, Rf.shape))
    det = AtA[..., 0, 0] * AtA[..., 1, 1] - AtA[..., 0, 1] * AtA[..., 1, 0]
    det = jnp.where(jnp.abs(det) < 1e-18, jnp.sign(det) * 1e-18 + 1e-18, det)
    d_ref = (AtA[..., 1, 1] * Atb[..., 0] - AtA[..., 0, 1] * Atb[..., 1]) / det
    return d_ref


def sampson_correction(E: jax.Array, x_ref: jax.Array, x_cur: jax.Array):
    """First-order (Sampson) correction of normalized-homogeneous
    correspondences toward the epipolar manifold (src/algorithm.cpp:173-237).

    x_* are (..., 3) with z=1; returns corrected (x_ref', x_cur').
    """
    Ex = jnp.einsum("ij,...j->...i", E, x_ref)  # (..., 3)
    Etxp = jnp.einsum("ji,...j->...i", E, x_cur)
    err = jnp.einsum("...i,...i->...", x_cur, Ex)  # scalar epipolar error
    denom = Ex[..., 0] ** 2 + Ex[..., 1] ** 2 + Etxp[..., 0] ** 2 + Etxp[..., 1] ** 2
    lam = err / jnp.clip(denom, 1e-18, None)
    dx_ref = lam[..., None] * jnp.stack([Etxp[..., 0], Etxp[..., 1], jnp.zeros_like(lam)], axis=-1)
    dx_cur = lam[..., None] * jnp.stack([Ex[..., 0], Ex[..., 1], jnp.zeros_like(lam)], axis=-1)
    return x_ref - dx_ref, x_cur - dx_cur


def sampson_distance(E: jax.Array, x_ref: jax.Array, x_cur: jax.Array) -> jax.Array:
    """Squared Sampson distance — the RANSAC scoring metric."""
    Ex = jnp.einsum("ij,...j->...i", E, x_ref)
    Etxp = jnp.einsum("ji,...j->...i", E, x_cur)
    err = jnp.einsum("...i,...i->...", x_cur, Ex)
    denom = Ex[..., 0] ** 2 + Ex[..., 1] ** 2 + Etxp[..., 0] ** 2 + Etxp[..., 1] ** 2
    return err * err / jnp.clip(denom, 1e-18, None)


def reprojection_error(T_wc: SE3, cam, pts_w: jax.Array, uv_obs: jax.Array) -> jax.Array:
    """Per-observation pixel reprojection error (src/algorithm.cpp:711-735)."""
    p_cam = T_wc.apply(pts_w)
    uv = cam.project(p_cam)
    return jnp.linalg.norm(uv - uv_obs, axis=-1)

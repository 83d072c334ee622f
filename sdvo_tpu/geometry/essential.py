"""Essential-matrix estimation with fully-vectorized RANSAC + pose recovery.

Replaces ``cv::findEssentialMat`` (src/algorithm.cpp:109-171) and the
reference's E-decomposition → 4 candidate poses → cheirality vote
(src/algorithm.cpp:241-333). TPU-first design: instead of a sequential RANSAC
loop, all hypotheses are solved at once — sample ``(S, 8)`` correspondence
subsets, run the normalized 8-point algorithm batched via ``vmap`` (one small
SVD each — XLA batches them), score every hypothesis against every
correspondence with the Sampson distance in one ``(S, N)`` pass, then pick the
best by inlier count.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sdvo_tpu.geometry.se3 import SE3
from sdvo_tpu.geometry.triangulation import sampson_distance, triangulate_two_view_depth


def _normalize_points(x: jax.Array, mask: jax.Array):
    """Masked Hartley normalization: zero-mean, mean distance sqrt(2). x: (N, 2)."""
    w = mask.astype(x.dtype)
    cnt = jnp.clip(jnp.sum(w), 1.0, None)
    mean = jnp.sum(x * w[:, None], axis=0) / cnt
    d = jnp.linalg.norm(x - mean, axis=-1) * w
    scale = jnp.sqrt(2.0) / jnp.clip(jnp.sum(d) / cnt, 1e-12, None)
    T = jnp.stack(
        [
            jnp.stack([scale, jnp.zeros_like(scale), -scale * mean[0]]),
            jnp.stack([jnp.zeros_like(scale), scale, -scale * mean[1]]),
            jnp.stack([jnp.zeros_like(scale), jnp.zeros_like(scale), jnp.ones_like(scale)]),
        ]
    )
    xn = (x - mean) * scale
    return xn, T


def eight_point(x_ref: jax.Array, x_cur: jax.Array, mask: jax.Array = None) -> jax.Array:
    """Normalized 8-point estimate of E from (N>=8, 2) normalized-plane coords.

    ``mask`` selects the rows that participate (least-squares over all valid
    rows — used both for minimal 8-sample hypotheses and for inlier polish).
    Returns a 3×3 essential matrix with enforced (1, 1, 0) singular values.
    """
    if mask is None:
        mask = jnp.ones(x_ref.shape[0], dtype=bool)
    xr, Tr = _normalize_points(x_ref, mask)
    xc, Tc = _normalize_points(x_cur, mask)
    u1, v1 = xr[..., 0], xr[..., 1]
    u2, v2 = xc[..., 0], xc[..., 1]
    ones = jnp.ones_like(u1)
    # x_curᵀ E x_ref = 0 rows
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1)
    A = A * mask[:, None].astype(A.dtype)
    # Null vector via eigh of the 9×9 normal matrix — cheaper than a full SVD
    # and shape-agnostic in N (works for the minimal 8-row case too).
    _, V = jnp.linalg.eigh(A.T @ A)
    F = V[:, 0].reshape(3, 3)
    F = Tc.T @ F @ Tr
    # project to essential manifold
    U, _, Vt2 = jnp.linalg.svd(F)
    S = jnp.diag(jnp.array([1.0, 1.0, 0.0], dtype=F.dtype))
    # keep proper rotations downstream
    return U @ S @ Vt2


def decompose_essential(E: jax.Array):
    """E -> (R1, R2, t) with the ±t / R1,R2 four-way ambiguity
    (src/algorithm.cpp:241-259)."""
    U, _, Vt = jnp.linalg.svd(E)
    # make U, V proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return R1, R2, t


def recover_pose(
    E: jax.Array, x_ref: jax.Array, x_cur: jax.Array, mask: jax.Array
) -> Tuple[SE3, jax.Array]:
    """Cheirality vote over the 4 (R, t) candidates (src/algorithm.cpp:261-333).

    x_* are (N, 2) normalized-plane coords; mask marks valid correspondences.
    Returns (T_cur_ref with unit translation, per-point positive-depth mask of
    the winning candidate).
    """
    R1, R2, t = decompose_essential(E)
    f_ref = jnp.concatenate([x_ref, jnp.ones_like(x_ref[..., :1])], axis=-1)
    f_cur = jnp.concatenate([x_cur, jnp.ones_like(x_cur[..., :1])], axis=-1)

    def score(R, tvec):
        T = SE3(R, tvec)
        d_ref = triangulate_two_view_depth(T, f_ref, f_cur)
        p_ref = d_ref[..., None] * f_ref
        d_cur = T.apply(p_ref)[..., 2]
        good = (d_ref > 0) & (d_cur > 0) & mask
        return jnp.sum(good.astype(jnp.int32)), good

    candidates = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    counts = []
    goods = []
    Rs = []
    ts = []
    for R, tv in candidates:
        c, g = score(R, tv)
        counts.append(c)
        goods.append(g)
        Rs.append(R)
        ts.append(tv)
    counts = jnp.stack(counts)
    best = jnp.argmax(counts)
    R = jnp.stack(Rs)[best]
    tv = jnp.stack(ts)[best]
    good = jnp.stack(goods)[best]
    return SE3(R, tv), good


def find_essential_ransac(
    x_ref: jax.Array,
    x_cur: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    num_hypotheses: int = 256,
    threshold: float = 1e-6,
):
    """Fully-batched RANSAC over the 8-point solver.

    Args:
      x_ref, x_cur: (N, 2) normalized-plane correspondences (undistorted).
      mask: (N,) validity.
      threshold: squared Sampson distance inlier gate *on the normalized
        plane* (pixel threshold tau_px maps to ``(tau_px / f)**2``).

    Returns (E_best, inlier_mask, inlier_count).
    """
    N = x_ref.shape[0]
    # weighted sampling without replacement is overkill; sample indices among
    # valid by gumbel-top-k on masked uniforms so all hypotheses draw valid pts
    S = num_hypotheses
    # minimal-sample gate: with < 8 valid correspondences top_k would silently
    # include invalid indices and "solve" on garbage — return count 0 so the
    # caller's min_inliers gate rejects the frame deterministically
    enough = jnp.sum(mask.astype(jnp.int32)) >= 8
    g = jax.random.uniform(key, (S, N), dtype=x_ref.dtype)
    g = jnp.where(mask[None, :], g, -1.0)
    _, idx = jax.lax.top_k(g, 8)  # (S, 8) distinct valid indices

    def solve(one_idx):
        return eight_point(x_ref[one_idx], x_cur[one_idx])

    Es = jax.vmap(solve)(idx)  # (S, 3, 3)
    # score all hypotheses × all correspondences
    d2 = jax.vmap(lambda E: sampson_distance(E,
        jnp.concatenate([x_ref, jnp.ones_like(x_ref[..., :1])], axis=-1),
        jnp.concatenate([x_cur, jnp.ones_like(x_cur[..., :1])], axis=-1)))(Es)  # (S, N)
    inl = (d2 < threshold) & mask[None, :]
    counts = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(counts)
    E_best = Es[best]
    inliers = inl[best]
    count_best = counts[best]

    h_ref = jnp.concatenate([x_ref, jnp.ones_like(x_ref[..., :1])], axis=-1)
    h_cur = jnp.concatenate([x_cur, jnp.ones_like(x_cur[..., :1])], axis=-1)

    # Iterative polish: least-squares refit on the current inlier set, re-gate,
    # repeat (minimal 8-point hypotheses are noise-limited; a few refit rounds
    # recover the full inlier set). The iteration runs unconditionally — the
    # consensus may dip transiently — while the best (E, inliers) seen is kept.
    def polish_step(carry, _):
        inl_c, bestE, bestInl, bestCount = carry
        E_p = eight_point(x_ref, x_cur, inl_c)
        d2p = sampson_distance(E_p, h_ref, h_cur)
        inl_p = (d2p < threshold) & mask
        count_p = jnp.sum(inl_p.astype(jnp.int32))
        better = count_p >= bestCount
        bestE = jnp.where(better, E_p, bestE)
        bestInl = jnp.where(better, inl_p, bestInl)
        bestCount = jnp.maximum(count_p, bestCount)
        return (inl_p, bestE, bestInl, bestCount), None

    (_, E_final, inl_final, count_final), _ = jax.lax.scan(
        polish_step, (inliers, E_best, inliers, count_best), None, length=6
    )
    inl_final = inl_final & enough
    count_final = jnp.where(enough, count_final, 0)
    return E_final, inl_final, count_final

"""Distributed bundle adjustment: landmark blocks sharded over the mesh.

BASELINE config 5: shard the landmark set (and each landmark's observations,
which stay with their landmark) across the ``shard`` mesh axis. Each device
computes its partial camera Hessian blocks, reduced-system fill-in, and
right-hand side from its own landmarks; one ``psum`` over the ``shard`` axis
assembles the global reduced camera system (6K×6K, K ≤ ~10); the dense solve
replicates on every device; point back-substitution is purely local. This is
the Schur-over-collectives design from SURVEY §2.4/§5 — the only
communication per LM iteration is the (6K)² psum + a scalar chi².

The per-observation math is shared with the single-chip BA
(sdvo_tpu.ba.bundle_adjustment — the g2o replacement).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdvo_tpu.ba.bundle_adjustment import (
    BAObservations,
    BASettings,
    _huber_w,
    _inv3x3,
    _jacobians,
    _project_residual,
    build_point_table,
)
from sdvo_tpu.geometry import se3
from sdvo_tpu.geometry.se3 import SE3


def shard_observations(
    cam_idx: np.ndarray, pt_idx: np.ndarray, uv: np.ndarray, valid: np.ndarray,
    num_points: int, num_shards: int, max_obs_per_point: int,
):
    """Host-side: partition points (and their observations) into equal-size
    shards, padding each shard to the max sizes. Returns per-shard stacked
    arrays with leading axis ``num_shards`` plus the point permutation.

    Fully vectorized (sort + segment ranks): packs a 100k-point global map in
    milliseconds — the original per-point loop was O(P·M) and unusable at the
    BASELINE-config-5 scale. Layout: point i (in sorted-unique order) lands on
    shard ``i % S`` at local index ``i // S``; its observations occupy the
    regular stride ``local · max_obs + rank``.
    """
    S = num_shards
    cam_idx = np.asarray(cam_idx)
    pt_idx = np.asarray(pt_idx)
    uv = np.asarray(uv)
    valid = np.asarray(valid, bool)

    vrows = np.nonzero(valid)[0]
    order = vrows[np.argsort(pt_idx[vrows], kind="stable")]
    pts_sorted = pt_idx[order]
    uniq, starts, counts = np.unique(pts_sorted, return_index=True, return_counts=True)
    n_pts = max(len(uniq), 1)
    P_s = -(-n_pts // S)
    M_s = P_s * max_obs_per_point

    s_cam = np.zeros((S, M_s), np.int32)
    s_new_pt = np.zeros((S, M_s), np.int32)
    s_uv = np.zeros((S, M_s, 2), np.float64)
    s_valid = np.zeros((S, M_s), bool)
    s_table = -np.ones((S, P_s, max_obs_per_point), np.int32)
    s_points = -np.ones((S, P_s), np.int64)
    if len(uniq) == 0:
        return s_cam, s_new_pt, s_uv, s_valid, s_table, s_points

    seq = np.arange(len(uniq))
    shard_of_pt = seq % S
    local_of_pt = seq // S
    s_points[shard_of_pt, local_of_pt] = uniq

    seg_id = np.repeat(seq, counts)  # (n_obs,) unique-point ordinal per obs
    rank = np.arange(len(order)) - np.repeat(starts, counts)
    keep = rank < max_obs_per_point
    r, g, rk = order[keep], seg_id[keep], rank[keep]
    s = shard_of_pt[g]
    lp = local_of_pt[g]
    m = lp * max_obs_per_point + rk
    s_cam[s, m] = cam_idx[r]
    s_new_pt[s, m] = lp
    s_uv[s, m] = uv[r]
    s_valid[s, m] = True
    s_table[s, lp, rk] = m
    return s_cam, s_new_pt, s_uv, s_valid, s_table, s_points


@partial(
    jax.jit,
    static_argnames=("mesh", "num_cams", "iterations"),
)
def distributed_local_ba(
    poses: SE3,  # (K,) replicated
    points: jax.Array,  # (S, P_s, 3) sharded over 'shard'
    cam_idx: jax.Array,  # (S, M_s)
    pt_idx: jax.Array,  # (S, M_s) local (within-shard) point index
    uv: jax.Array,  # (S, M_s, 2)
    valid: jax.Array,  # (S, M_s)
    table: jax.Array,  # (S, P_s, Mmax)
    fixed_cam: jax.Array,  # (K,)
    fx, fy, cx, cy,
    mesh: Mesh,
    num_cams: int,
    iterations: int = 8,
    huber_delta: float = 2.0,
    init_lambda: float = 1e-4,
):
    """Schur-complement LM with landmark shards reduced over the mesh.

    Returns (poses', points' (S, P_s, 3), total_chi2, S_reduced) where
    ``S_reduced`` is the undamped Schur-reduced camera system (6K×6K) of the
    final iteration — the marginal pose information the pose-graph refine
    harvests (:func:`ba_with_pose_graph_refine`).
    """
    K = num_cams
    dtype = points.dtype
    fxj, fyj, cxj, cyj = (jnp.asarray(v, dtype) for v in (fx, fy, cx, cy))

    def shard_fn(poses_R, poses_t, pts, ci, pi, uvs, ok, tbl):
        # shard_map keeps the (now size-1) leading shard axis — drop it
        pts, ci, pi, uvs, ok, tbl = (x[0] for x in (pts, ci, pi, uvs, ok, tbl))
        P_s = pts.shape[0]

        def residuals(R_all, t_all, pts_):
            T = SE3(R_all[ci], t_all[ci])
            r, z, p_cam = _project_residual(T, pts_[pi], uvs, fxj, fyj, cxj, cyj)
            live = ok & (z > 1e-6)
            return jnp.where(live[:, None], r, 0.0), live, p_cam, T

        def chi2_of(r, w, live):
            local = jnp.sum(jnp.where(live, w * jnp.sum(r * r, axis=-1), 0.0))
            return jax.lax.psum(local, axis_name="shard")

        def step(carry, _):
            R_all, t_all, pts_, lam, chi = carry
            r, live, p_cam, T = residuals(R_all, t_all, pts_)
            w = _huber_w(r, huber_delta) * live.astype(dtype)
            Jc, Jp = _jacobians(T, p_cam, fxj, fyj)
            free = (~fixed_cam)[ci].astype(dtype) * live.astype(dtype)
            Jc = Jc * free[:, None, None]
            Jp = Jp * live.astype(dtype)[:, None, None]
            JcW = Jc * w[:, None, None]
            JpW = Jp * w[:, None, None]
            # broadcast-reduce block outer products (see ba.bundle_adjustment
            # _bmm note: batched tiny einsums lower to padded MXU matmuls)
            Hcc_obs = jnp.sum(JcW[:, :, :, None] * Jc[:, :, None, :], axis=1)
            Hpp_obs = jnp.sum(JpW[:, :, :, None] * Jp[:, :, None, :], axis=1)
            Wcp_obs = jnp.sum(JcW[:, :, :, None] * Jp[:, :, None, :], axis=1)
            gc_obs = jnp.sum(JcW * r[:, :, None], axis=1)
            gp_obs = jnp.sum(JpW * r[:, :, None], axis=1)

            Hcc = jax.ops.segment_sum(Hcc_obs, ci, num_segments=K)
            gc = jax.ops.segment_sum(gc_obs, ci, num_segments=K)
            Hpp = jax.ops.segment_sum(Hpp_obs, pi, num_segments=P_s)
            gp = jax.ops.segment_sum(gp_obs, pi, num_segments=P_s)
            Hpp_inv = _inv3x3(Hpp + lam * jnp.eye(3, dtype=dtype))

            # Schur fill-in as one local dense matmul over the shard's points
            # (same dense-W formulation as the single-chip local_ba)
            Wd = jnp.zeros((P_s, K, 6, 3), dtype).at[pi, ci].add(
                Wcp_obs * live[:, None, None].astype(dtype)
            )
            Yd = jnp.sum(Wd[..., :, None] * Hpp_inv[:, None, None, :, :], axis=-2)
            Wr = Wd.transpose(1, 2, 0, 3).reshape(K * 6, P_s * 3)
            Yr = Yd.transpose(1, 2, 0, 3).reshape(K * 6, P_s * 3)
            S_fill = Yr @ Wr.T  # (6K, 6K)
            g_fill = Yr @ gp.reshape(P_s * 3)

            # ---- the one collective: reduce the camera system over shards ----
            # S_fill (= Σ_p W_p Hpp⁻¹ W_pᵀ) and the Hcc blocks are symmetric:
            # psum only the packed lower triangle + the two rhs vectors as ONE
            # fused payload — 6K(6K+1)/2 + 36K/… floats instead of (6K)² + …
            # (≈ half the bytes on the wire, and one collective launch).
            tl_r, tl_c = np.tril_indices(K * 6)
            hl_r, hl_c = np.tril_indices(6)
            payload = jnp.concatenate([
                S_fill[tl_r, tl_c],
                Hcc[:, hl_r, hl_c].reshape(-1),
                gc.reshape(-1),
                g_fill,
            ])
            payload = jax.lax.psum(payload, axis_name="shard")
            nS = tl_r.shape[0]
            nH = K * hl_r.shape[0]
            S_low = jnp.zeros((K * 6, K * 6), dtype).at[tl_r, tl_c].set(payload[:nS])
            S_fill = S_low + S_low.T - jnp.diag(jnp.diagonal(S_low))
            H_low = jnp.zeros((K, 6, 6), dtype).at[:, hl_r, hl_c].set(
                payload[nS : nS + nH].reshape(K, -1)
            )
            Hcc = H_low + H_low.transpose(0, 2, 1) - jax.vmap(jnp.diag)(
                jax.vmap(jnp.diagonal)(H_low)
            )
            gc = payload[nS + nH : nS + nH + K * 6].reshape(K, 6)
            g_fill = payload[nS + nH + K * 6 :]

            Sd = -S_fill
            Sd = Sd.reshape(K, 6, K, 6).at[jnp.arange(K), :, jnp.arange(K), :].add(
                Hcc + lam * jnp.eye(6, dtype=dtype)
            ).reshape(K * 6, K * 6)
            g_red = gc.reshape(K * 6) - g_fill
            free6 = jnp.repeat((~fixed_cam).astype(dtype), 6)
            Sd = Sd * free6[:, None] * free6[None, :] + jnp.diag(1.0 - free6)
            g_red = g_red * free6
            L = jnp.linalg.cholesky(Sd + 1e-10 * jnp.eye(6 * K, dtype=dtype))
            okc = jnp.all(jnp.isfinite(L))
            L = jnp.where(okc, L, jnp.eye(6 * K, dtype=dtype))
            dc = jax.scipy.linalg.cho_solve((L, True), g_red).reshape(K, 6)
            dc = jnp.where(okc, dc, 0.0)

            WTdc = (Wr.T @ dc.reshape(K * 6)).reshape(P_s, 3)
            dp = jnp.sum(Hpp_inv * (gp - WTdc)[:, None, :], axis=-1)

            delta = se3.exp(-dc)
            R_new = delta.rotation @ R_all
            t_new = jnp.einsum("kij,kj->ki", delta.rotation, t_all) + delta.translation
            pts_new = pts_ - dp

            r_n, live_n, _, _ = residuals(R_new, t_new, pts_new)
            w_n = _huber_w(r_n, huber_delta) * live_n.astype(dtype)
            chi_n = chi2_of(r_n, w_n, live_n)
            better = chi_n < chi
            R_out = jnp.where(better, R_new, R_all)
            t_out = jnp.where(better, t_new, t_all)
            pts_out = jnp.where(better, pts_new, pts_)
            lam_out = jnp.where(better, lam * 0.1, lam * 10.0)
            chi_out = jnp.where(better, chi_n, chi)
            # UNDAMPED reduced camera system at the pre-step state — the last
            # scan emission is the harvestable marginal pose information for
            # the pose-graph refine (pose_graph.edge_info_from_reduced_hessian)
            S_und = (-S_fill).reshape(K, 6, K, 6).at[
                jnp.arange(K), :, jnp.arange(K), :
            ].add(Hcc).reshape(K * 6, K * 6)
            return (R_out, t_out, pts_out, lam_out, chi_out), S_und

        r0, live0, _, _ = residuals(poses_R, poses_t, pts)
        w0 = _huber_w(r0, huber_delta) * live0.astype(dtype)
        chi0 = chi2_of(r0, w0, live0)
        (R_f, t_f, pts_f, _, chi_f), S_all = jax.lax.scan(
            step,
            (poses_R, poses_t, pts, jnp.asarray(init_lambda, dtype), chi0),
            None,
            length=iterations,
        )
        return R_f, t_f, pts_f[None], chi_f, S_all[-1]

    shard = P("shard")
    out = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), shard, shard, shard, shard, shard, shard),
        out_specs=(P(), P(), shard, P(), P()),
        check_vma=False,
    )(
        poses.rotation, poses.translation, points, cam_idx, pt_idx, uv, valid, table
    )
    R_f, t_f, pts_f, chi_f, S_red = out
    return SE3(R_f, t_f), pts_f, chi_f, S_red


def ba_with_pose_graph_refine(
    poses_all: SE3,  # (N,) the FULL keyframe trajectory (world→camera)
    window_start: int,  # index of the BA window's first keyframe in poses_all
    ba_args: tuple,  # positional args of distributed_local_ba after `poses`
    loop_edges=None,  # optional PoseGraphEdges over trajectory indices
    mesh: Mesh = None,
    num_shards: int = 1,
    pg_iterations: int = 10,
    **ba_kwargs,
):
    """BASELINE config 5, final stage: windowed distributed Schur BA followed
    by a pose-graph refine over the whole keyframe trajectory.

    The reduced camera system the BA produces (landmarks marginalized — the
    output of the Schur complement) is harvested as the information of the
    within-window relative-pose constraints; outside the window, plain
    odometry edges (identity information) chain the remaining keyframes; any
    ``loop_edges`` (e.g. from place recognition) close long-range drift. The
    refine itself runs as :func:`~sdvo_tpu.parallel.pose_graph.
    distributed_pose_graph` — edges sharded over the mesh, one (6N)²-psum per
    LM iteration. This is the graph-optimizer role of the reference's g2o
    setup (``/root/reference/src/bundle_adjustment.cpp:311-339``) with the
    landmark side already eliminated.

    Host-side orchestration: two jitted solves + numpy edge packing.
    Returns (refined poses (N,), BA points, BA chi², pose-graph chi²).
    """
    from sdvo_tpu.parallel.pose_graph import (
        concat_edges,
        distributed_pose_graph,
        edge_info_from_reduced_hessian,
        odometry_edges,
        optimize_pose_graph,
        shard_edges,
    )

    N = int(poses_all.translation.shape[0])
    window_poses = jax.tree.map(lambda x: x[window_start:], poses_all)
    K = int(window_poses.translation.shape[0])
    ba_kwargs.setdefault("num_cams", K)
    poses_w, pts_out, chi_ba, S_red = distributed_local_ba(
        window_poses, *ba_args, mesh=mesh, **ba_kwargs
    )

    # splice the BA-refined window back into the trajectory
    R_all = poses_all.rotation.at[window_start:].set(poses_w.rotation)
    t_all = poses_all.translation.at[window_start:].set(poses_w.translation)
    poses_new = SE3(R_all, t_all)

    # odometry edges over the whole chain; within-window consecutive edges
    # carry the BA-harvested information (scaled to the identity-info scale of
    # the plain odometry edges so the two regimes are commensurable)
    edges = odometry_edges(poses_new)
    iw = jnp.arange(K - 1, dtype=jnp.int32)
    lam_w = edge_info_from_reduced_hessian(S_red, iw + 1, iw)
    # normalize: window edges get info ∝ their BA certainty, mean-traced to 10×
    # the unit odometry info (BA-backed constraints should dominate raw odometry)
    tr = jnp.clip(jnp.trace(lam_w, axis1=-2, axis2=-1) / 6.0, 1e-12, None)
    lam_w = lam_w / tr[:, None, None] * 10.0
    info = edges.info.at[window_start : window_start + K - 1].set(lam_w)
    edges = edges._replace(info=info)
    if loop_edges is not None:
        edges = concat_edges(edges, loop_edges)

    fixed = jnp.zeros((N,), bool).at[0].set(True)
    if mesh is not None and num_shards > 1:
        sharded = shard_edges(edges, num_shards)
        poses_ref, chi_pg = distributed_pose_graph(
            poses_new, sharded, fixed, mesh=mesh, num_poses=N,
            iterations=pg_iterations,
        )
    else:
        poses_ref, chi_pg = optimize_pose_graph(
            poses_new, edges, fixed, num_poses=N, iterations=pg_iterations
        )
    return poses_ref, pts_out, chi_ba, chi_pg

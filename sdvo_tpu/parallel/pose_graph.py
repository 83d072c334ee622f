"""Pose-graph refinement over SE(3) relative-pose constraints.

Completes BASELINE config 5: after the landmark-sharded Schur BA
(:mod:`sdvo_tpu.parallel.dist_ba`) solves the windowed camera+structure
problem, a pose-graph solve over the REDUCED camera system redistributes the
remaining inconsistency across the whole keyframe trajectory — the role the
reference's sparse graph optimizer plays in its g2o setup
(``/root/reference/src/bundle_adjustment.cpp:311-339``: block solver +
Levenberg over a camera/landmark graph; here the landmark side has already
been marginalized, so the graph is poses-only).

TPU-native design
-----------------
* Every edge's 6-vector residual ``r_e = log(Z_e⁻¹ ∘ T_i ∘ T_j⁻¹)`` and its
  two 6×6 Jacobian blocks are evaluated for ALL edges at once — Jacobians by
  ``jacfwd`` of the left-perturbed residual (12 forward tangents through the
  exp/log chain, exact to machine precision, no hand-derived BCH
  approximations to get wrong), vmapped over the edge batch.
* The Gauss-Newton system assembles by scatter-add into the LEADING axes of a
  dense ``(N, N, 6, 6)`` block grid (mixed-axis scatters are a measured ~10×
  trap on TPU — see ba.bundle_adjustment._bmm note), then reshapes to the
  dense ``6N×6N`` normal matrix.  N is the keyframe count (≤ a few hundred),
  so the dense Cholesky is microseconds on the MXU.
* LM with accept/reject runs as a ``lax.scan`` of a fixed iteration count —
  one compiled program, no host round-trips.
* The distributed variant shards EDGES over the ``shard`` mesh axis
  (``shard_map``); each device accumulates its partial ``(6N×6N, 6N)``
  system and one ``psum`` assembles the global one — the same
  one-collective-per-iteration pattern as distributed_local_ba.

Measurements ``Z_e`` use the world→camera convention throughout the package:
``Z_e = T_i ∘ T_j⁻¹`` maps camera-j coordinates to camera-i coordinates, and
is exactly :func:`sdvo_tpu.geometry.se3.relative`'s output for
``(T_ref=T_j, T_cur=T_i)``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sdvo_tpu.geometry import se3
from sdvo_tpu.geometry.se3 import SE3


class PoseGraphEdges(NamedTuple):
    """A batch of relative-pose constraints ``i ← j``.

    ``info`` is the 6×6 information matrix Λ of each constraint (inverse
    covariance of the tangent-space measurement error, ordered
    ``[upsilon, omega]``); ``chi² = Σ_e r_eᵀ Λ_e r_e``.
    """

    i: jax.Array  # (E,) int32 — target keyframe index
    j: jax.Array  # (E,) int32 — source keyframe index
    R_meas: jax.Array  # (E, 3, 3) — rotation of Z_e = T_i ∘ T_j⁻¹
    t_meas: jax.Array  # (E, 3)
    info: jax.Array  # (E, 6, 6)
    valid: jax.Array  # (E,) bool


def _edge_residual(xi_i, xi_j, Ri, ti, Rj, tj, Rz, tz):
    """r = log(Z⁻¹ ∘ (exp(ξ_i) T_i) ∘ (exp(ξ_j) T_j)⁻¹) for one edge."""
    Ti = se3.exp(xi_i).compose(SE3(Ri, ti))
    Tj = se3.exp(xi_j).compose(SE3(Rj, tj))
    Z = SE3(Rz, tz)
    return se3.log(Z.inverse().compose(Ti).compose(Tj.inverse()))


# residual + both Jacobian blocks at ξ = 0, vmapped over the edge batch
_edge_r_and_J = jax.vmap(
    lambda Ri, ti, Rj, tj, Rz, tz: (
        _edge_residual(
            jnp.zeros(6, Ri.dtype), jnp.zeros(6, Ri.dtype), Ri, ti, Rj, tj, Rz, tz
        ),
        jax.jacfwd(_edge_residual, argnums=(0, 1))(
            jnp.zeros(6, Ri.dtype), jnp.zeros(6, Ri.dtype), Ri, ti, Rj, tj, Rz, tz
        ),
    )
)


def _accumulate(poses_R, poses_t, edges: PoseGraphEdges, num_poses: int,
                huber_delta: float):
    """Residuals, robust weights, and the assembled (H, g, chi²) for all edges.

    Returns ``H`` as (6N, 6N), ``g`` as (6N,) for the stacked left-perturbation
    ``[ξ_0 … ξ_{N-1}]``, and the robust chi².
    """
    N = num_poses
    dtype = poses_t.dtype
    ei, ej = edges.i, edges.j
    r, (A, B) = _edge_r_and_J(
        poses_R[ei], poses_t[ei], poses_R[ej], poses_t[ej],
        edges.R_meas, edges.t_meas,
    )
    live = edges.valid.astype(dtype)
    # Huber on the information-weighted norm (g2o's robust kernel semantics)
    Lr = jnp.einsum("eab,eb->ea", edges.info, r)
    m2 = jnp.maximum(jnp.sum(r * Lr, axis=-1), 0.0)
    m = jnp.sqrt(m2 + 1e-30)
    w = jnp.where(m <= huber_delta, 1.0, huber_delta / m) * live
    chi2 = jnp.sum(jnp.where(m <= huber_delta, m2, huber_delta * (2.0 * m - huber_delta)) * live)

    WL = edges.info * w[:, None, None]  # (E, 6, 6) — weighted Λ
    # block outer products via broadcast-reduce (batched tiny matmuls pad the
    # MXU per batch entry — measured trap, see ba.bundle_adjustment._bmm)
    AtL = jnp.einsum("eca,ecb->eab", A, WL)  # AᵀWΛ (E,6,6)
    BtL = jnp.einsum("eca,ecb->eab", B, WL)
    Hii = jnp.einsum("eac,ebc->eab", AtL, A.transpose(0, 2, 1))
    Hij = jnp.einsum("eac,ebc->eab", AtL, B.transpose(0, 2, 1))
    Hjj = jnp.einsum("eac,ebc->eab", BtL, B.transpose(0, 2, 1))
    gi = jnp.einsum("eab,eb->ea", AtL, r)
    gj = jnp.einsum("eab,eb->ea", BtL, r)

    Hgrid = jnp.zeros((N, N, 6, 6), dtype)
    Hgrid = Hgrid.at[ei, ei].add(Hii)
    Hgrid = Hgrid.at[ei, ej].add(Hij)
    Hgrid = Hgrid.at[ej, ei].add(Hij.transpose(0, 2, 1))
    Hgrid = Hgrid.at[ej, ej].add(Hjj)
    g = jnp.zeros((N, 6), dtype).at[ei].add(gi).at[ej].add(gj)
    H = Hgrid.transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)
    return H, g.reshape(6 * N), chi2


def _pg_chi2(poses_R, poses_t, edges: PoseGraphEdges, huber_delta: float):
    r, _ = _edge_r_and_J(
        poses_R[edges.i], poses_t[edges.i], poses_R[edges.j], poses_t[edges.j],
        edges.R_meas, edges.t_meas,
    )
    live = edges.valid.astype(poses_t.dtype)
    Lr = jnp.einsum("eab,eb->ea", edges.info, r)
    m2 = jnp.maximum(jnp.sum(r * Lr, axis=-1), 0.0)
    m = jnp.sqrt(m2 + 1e-30)
    return jnp.sum(
        jnp.where(m <= huber_delta, m2, huber_delta * (2.0 * m - huber_delta)) * live
    )


def _pg_step(H, g, poses_R, poses_t, fixed, lam, num_poses):
    """One damped solve + left-multiplicative retraction of all poses."""
    N = num_poses
    dtype = poses_t.dtype
    free6 = jnp.repeat((~fixed).astype(dtype), 6)
    Hd = H + lam * jnp.diag(jnp.maximum(jnp.diagonal(H), 1.0))
    Hd = Hd * free6[:, None] * free6[None, :] + jnp.diag(1.0 - free6)
    g_f = g * free6
    L = jnp.linalg.cholesky(Hd + 1e-10 * jnp.eye(6 * N, dtype=dtype))
    ok = jnp.all(jnp.isfinite(L))
    L = jnp.where(ok, L, jnp.eye(6 * N, dtype=dtype))
    dx = jax.scipy.linalg.cho_solve((L, True), g_f).reshape(N, 6)
    dx = jnp.where(ok, dx, 0.0)
    delta = se3.exp(-dx)
    R_new = delta.rotation @ poses_R
    t_new = jnp.einsum("kij,kj->ki", delta.rotation, poses_t) + delta.translation
    return R_new, t_new


@partial(jax.jit, static_argnames=("num_poses", "iterations"))
def optimize_pose_graph(
    poses: SE3,  # (N,)
    edges: PoseGraphEdges,
    fixed: jax.Array,  # (N,) bool — gauge anchors (≥1 required)
    num_poses: int,
    iterations: int = 10,
    huber_delta: float = 5.0,
    init_lambda: float = 1e-6,
) -> Tuple[SE3, jax.Array]:
    """Levenberg–Marquardt pose-graph solve. Returns (poses', final chi²)."""
    dtype = poses.translation.dtype

    def step(carry, _):
        R_all, t_all, lam, chi = carry
        H, g, _ = _accumulate(R_all, t_all, edges, num_poses, huber_delta)
        R_new, t_new = _pg_step(H, g, R_all, t_all, fixed, lam, num_poses)
        chi_n = _pg_chi2(R_new, t_new, edges, huber_delta)
        better = chi_n < chi
        R_out = jnp.where(better, R_new, R_all)
        t_out = jnp.where(better, t_new, t_all)
        lam_out = jnp.where(better, lam * 0.3, lam * 10.0)
        chi_out = jnp.where(better, chi_n, chi)
        return (R_out, t_out, lam_out, chi_out), None

    chi0 = _pg_chi2(poses.rotation, poses.translation, edges, huber_delta)
    (R_f, t_f, _, chi_f), _ = jax.lax.scan(
        step,
        (poses.rotation, poses.translation, jnp.asarray(init_lambda, dtype), chi0),
        None,
        length=iterations,
    )
    return SE3(R_f, t_f), chi_f


@partial(jax.jit, static_argnames=("mesh", "num_poses", "iterations"))
def distributed_pose_graph(
    poses: SE3,  # (N,) replicated
    edges: PoseGraphEdges,  # leading axis (S, E_s) — edge shards
    fixed: jax.Array,  # (N,) bool, replicated
    mesh: Mesh,
    num_poses: int,
    iterations: int = 10,
    huber_delta: float = 5.0,
    init_lambda: float = 1e-6,
) -> Tuple[SE3, jax.Array]:
    """:func:`optimize_pose_graph` with edges sharded over the ``shard`` axis.

    Each device accumulates its shard's (6N×6N, 6N, chi²) partials; one
    ``psum`` per LM iteration assembles the global system; the dense solve
    and the pose retraction replicate on every device (N is small — the psum
    payload at N=16 keyframes is 96²·4 B ≈ 37 KB, ICI-negligible).
    """
    dtype = poses.translation.dtype

    def shard_fn(poses_R, poses_t, ei, ej, Rz, tz, info, valid):
        ed = PoseGraphEdges(ei[0], ej[0], Rz[0], tz[0], info[0], valid[0])

        def chi2_of(R_all, t_all):
            return jax.lax.psum(
                _pg_chi2(R_all, t_all, ed, huber_delta), axis_name="shard"
            )

        def step(carry, _):
            R_all, t_all, lam, chi = carry
            H, g, _ = _accumulate(R_all, t_all, ed, num_poses, huber_delta)
            H = jax.lax.psum(H, axis_name="shard")
            g = jax.lax.psum(g, axis_name="shard")
            R_new, t_new = _pg_step(H, g, R_all, t_all, fixed, lam, num_poses)
            chi_n = chi2_of(R_new, t_new)
            better = chi_n < chi
            R_out = jnp.where(better, R_new, R_all)
            t_out = jnp.where(better, t_new, t_all)
            lam_out = jnp.where(better, lam * 0.3, lam * 10.0)
            chi_out = jnp.where(better, chi_n, chi)
            return (R_out, t_out, lam_out, chi_out), None

        chi0 = chi2_of(poses_R, poses_t)
        (R_f, t_f, _, chi_f), _ = jax.lax.scan(
            step,
            (poses_R, poses_t, jnp.asarray(init_lambda, dtype), chi0),
            None,
            length=iterations,
        )
        return R_f, t_f, chi_f

    shard = P("shard")
    R_f, t_f, chi_f = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), shard, shard, shard, shard, shard, shard),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(
        poses.rotation, poses.translation,
        edges.i, edges.j, edges.R_meas, edges.t_meas, edges.info, edges.valid,
    )
    return SE3(R_f, t_f), chi_f


# ---------------------------------------------------------------------------
# constraint harvesting
# ---------------------------------------------------------------------------

def odometry_edges(poses: SE3, info: Optional[jax.Array] = None) -> PoseGraphEdges:
    """Consecutive-keyframe constraints ``i+1 ← i`` from the current estimate.

    ``info``: optional (N-1, 6, 6) information matrices; identity when absent.
    Measurements are taken from the given poses, so immediately after a BA
    solve these edges pin the refined local geometry while loop-closure edges
    pull the chain globally.
    """
    N = poses.translation.shape[0]
    dtype = poses.translation.dtype
    j = jnp.arange(N - 1, dtype=jnp.int32)
    i = j + 1
    Ti = jax.tree.map(lambda x: x[i], poses)
    Tj = jax.tree.map(lambda x: x[j], poses)
    Z = se3.relative(Tj, Ti)  # T_i ∘ T_j⁻¹
    if info is None:
        info = jnp.broadcast_to(jnp.eye(6, dtype=dtype), (N - 1, 6, 6))
    return PoseGraphEdges(
        i=i, j=j, R_meas=Z.rotation, t_meas=Z.translation,
        info=info, valid=jnp.ones((N - 1,), bool),
    )


def edge_info_from_reduced_hessian(S_reduced: jax.Array, i: jax.Array,
                                   j: jax.Array) -> jax.Array:
    """Per-edge information from the Schur-reduced camera system.

    After BA, ``S_reduced`` (6K×6K) is the information of the camera block
    with landmarks marginalized.  The exact pairwise marginal needs a 12×12
    inversion per pair; the standard cheap surrogate (used by windowed SLAM
    systems when exporting BA certainty to a pose graph) takes the symmetric
    average of the two diagonal blocks, floored to keep Λ positive-definite.
    """
    K6 = S_reduced.shape[0]
    K = K6 // 6
    Sblk = S_reduced.reshape(K, 6, K, 6)
    diag = Sblk[jnp.arange(K), :, jnp.arange(K), :]  # (K, 6, 6)
    lam = 0.5 * (diag[i] + diag[j])
    lam = 0.5 * (lam + lam.transpose(0, 2, 1))
    return lam + 1e-3 * jnp.eye(6, dtype=S_reduced.dtype)


def concat_edges(*groups: PoseGraphEdges) -> PoseGraphEdges:
    """Stack edge batches (odometry + loop closures) into one."""
    return PoseGraphEdges(*(jnp.concatenate(parts, axis=0) for parts in zip(*groups)))


def shard_edges(edges: PoseGraphEdges, num_shards: int) -> PoseGraphEdges:
    """Host-side: round-robin edges into ``num_shards`` equal shards (padded
    with invalid edges), leading axis S — the layout distributed_pose_graph
    consumes."""
    E = int(np.asarray(edges.valid).shape[0])
    S = num_shards
    E_s = -(-E // S)

    def pack(x, fill):
        x = np.asarray(x)
        out = np.full((S * E_s,) + x.shape[1:], fill, x.dtype)
        out[:E] = x
        return jnp.asarray(out.reshape((S, E_s) + x.shape[1:]))

    # padded edges carry IDENTITY rotations: a zero R would make so3_log
    # produce NaN, and NaN·0 still poisons the masked chi² reduction
    R_pad = np.broadcast_to(
        np.eye(3, dtype=np.asarray(edges.R_meas).dtype), (S * E_s, 3, 3)
    ).copy()
    R_pad[:E] = np.asarray(edges.R_meas)
    return PoseGraphEdges(
        i=pack(edges.i, 0), j=pack(edges.j, 0),
        R_meas=jnp.asarray(R_pad.reshape(S, E_s, 3, 3)),
        t_meas=pack(edges.t_meas, 0.0),
        info=pack(edges.info, 0.0),
        valid=pack(edges.valid, False),
    )

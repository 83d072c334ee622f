"""Pose-graph refinement: loop-drift redistribution + distributed parity.

Models the classic SLAM validation for a pose-graph backend (the role of the
reference's g2o graph setup, ``src/bundle_adjustment.cpp:311-339``): integrate
a noisy odometry chain around a closed loop, add the exact loop-closure
constraint, optimize — the accumulated drift must redistribute and the final
trajectory land near ground truth.
"""

import numpy as np
import jax
import jax.numpy as jnp

from sdvo_tpu.geometry import se3
from sdvo_tpu.geometry.se3 import SE3
from sdvo_tpu.parallel.mesh import make_vo_mesh
from sdvo_tpu.parallel.pose_graph import (
    PoseGraphEdges,
    concat_edges,
    distributed_pose_graph,
    edge_info_from_reduced_hessian,
    odometry_edges,
    optimize_pose_graph,
    shard_edges,
)


def _circle_ground_truth(N, radius=5.0):
    """World→camera poses of a camera walking a circle, facing forward."""
    Ts = []
    for k in range(N):
        th = 2.0 * np.pi * k / N
        c = np.array([radius * np.cos(th), radius * np.sin(th), 0.0])
        fwd = np.array([-np.sin(th), np.cos(th), 0.0])
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        R_wc = np.stack([right, -up, fwd], axis=0)  # rows: cam axes in world
        t = -R_wc @ c
        Ts.append((R_wc, t))
    R = jnp.asarray(np.stack([T[0] for T in Ts]))
    t = jnp.asarray(np.stack([T[1] for T in Ts]))
    return SE3(R, t)


def _drifted_chain(T_gt: SE3, rng, sigma_rot=0.01, sigma_t=0.02):
    """Integrate the true relative motions with per-step noise → drifted
    absolute poses (first pose exact), plus the NOISY odometry measurements."""
    N = T_gt.translation.shape[0]
    poses = [jax.tree.map(lambda x: x[0], T_gt)]
    Z_noisy = []
    for k in range(1, N):
        Zk = se3.relative(
            jax.tree.map(lambda x: x[k - 1], T_gt), jax.tree.map(lambda x: x[k], T_gt)
        )
        eps = jnp.asarray(
            np.concatenate([rng.normal(0, sigma_t, 3), rng.normal(0, sigma_rot, 3)])
        )
        Zn = se3.exp(eps).compose(Zk)
        Z_noisy.append(Zn)
        poses.append(Zn.compose(poses[-1]))
    stack = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)
    return stack(poses), stack(Z_noisy)


def _centers(T: SE3):
    return np.asarray(se3.camera_center(T))


def _make_problem(rng, N=24):
    T_gt = _circle_ground_truth(N)
    T_init, Z_noisy = _drifted_chain(T_gt, rng)
    j = jnp.arange(N - 1, dtype=jnp.int32)
    eye6 = jnp.broadcast_to(jnp.eye(6, dtype=T_gt.dtype), (N - 1, 6, 6))
    odo = PoseGraphEdges(
        i=j + 1, j=j, R_meas=Z_noisy.rotation, t_meas=Z_noisy.translation,
        info=eye6, valid=jnp.ones((N - 1,), bool),
    )
    # exact loop closure N-1 ← 0, weighted like ~the whole chain
    Zl = se3.relative(
        jax.tree.map(lambda x: x[0], T_gt), jax.tree.map(lambda x: x[N - 1], T_gt)
    )
    loop = PoseGraphEdges(
        i=jnp.asarray([N - 1], jnp.int32), j=jnp.asarray([0], jnp.int32),
        R_meas=Zl.rotation[None], t_meas=Zl.translation[None],
        info=(50.0 * jnp.eye(6, dtype=T_gt.dtype))[None],
        valid=jnp.ones((1,), bool),
    )
    edges = concat_edges(odo, loop)
    fixed = jnp.zeros((N,), bool).at[0].set(True)
    return T_gt, T_init, edges, fixed


def test_loop_drift_redistribution(rng):
    N = 24
    T_gt, T_init, edges, fixed = _make_problem(rng, N)
    err0 = np.linalg.norm(_centers(T_init) - _centers(T_gt), axis=-1)
    assert err0.max() > 0.25, "synthetic chain should have drifted"

    T_opt, chi = optimize_pose_graph(T_init, edges, fixed, num_poses=N, iterations=15)
    err1 = np.linalg.norm(_centers(T_opt) - _centers(T_gt), axis=-1)
    # drift redistributes: max error drops well below the raw chain's
    assert err1.max() < 0.4 * err0.max(), (err0.max(), err1.max())
    assert err1.mean() < 0.5 * err0.mean()
    assert np.isfinite(float(chi))
    # rotations stay orthonormal through the retractions
    R = np.asarray(T_opt.rotation)
    assert np.allclose(R @ R.transpose(0, 2, 1), np.eye(3), atol=1e-6)


def test_loop_closure_pins_endpoint(rng):
    N = 24
    T_gt, T_init, edges, fixed = _make_problem(rng, N)
    T_opt, _ = optimize_pose_graph(T_init, edges, fixed, num_poses=N, iterations=15)
    # the heavily-weighted loop edge must hold: endpoint relative pose ≈ truth
    Z_opt = se3.relative(
        jax.tree.map(lambda x: x[0], T_opt), jax.tree.map(lambda x: x[N - 1], T_opt)
    )
    Z_gt = se3.relative(
        jax.tree.map(lambda x: x[0], T_gt), jax.tree.map(lambda x: x[N - 1], T_gt)
    )
    dr = se3.log(Z_gt.inverse().compose(Z_opt))
    assert np.linalg.norm(np.asarray(dr)) < 0.05


def test_distributed_matches_single(rng):
    N = 16
    T_gt, T_init, edges, fixed = _make_problem(rng, N)
    T_single, chi_s = optimize_pose_graph(
        T_init, edges, fixed, num_poses=N, iterations=10
    )
    mesh = make_vo_mesh(num_seq=2, num_shard=4)
    sharded = shard_edges(edges, 4)
    T_dist, chi_d = distributed_pose_graph(
        T_init, sharded, fixed, mesh=mesh, num_poses=N, iterations=10
    )
    np.testing.assert_allclose(
        np.asarray(T_single.translation), np.asarray(T_dist.translation), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(T_single.rotation), np.asarray(T_dist.rotation), atol=1e-6
    )
    np.testing.assert_allclose(float(chi_s), float(chi_d), rtol=1e-6)


def test_edge_info_from_reduced_hessian():
    K = 4
    rng = np.random.default_rng(3)
    A = rng.normal(size=(6 * K, 6 * K))
    S = jnp.asarray(A @ A.T + np.eye(6 * K))
    i = jnp.asarray([1, 3], jnp.int32)
    j = jnp.asarray([0, 2], jnp.int32)
    lam = edge_info_from_reduced_hessian(S, i, j)
    assert lam.shape == (2, 6, 6)
    lam_np = np.asarray(lam)
    # symmetric positive-definite
    assert np.allclose(lam_np, lam_np.transpose(0, 2, 1))
    assert (np.linalg.eigvalsh(lam_np) > 0).all()
    # matches the average of the diagonal blocks
    Sb = np.asarray(S).reshape(K, 6, K, 6)
    want = 0.5 * (Sb[1, :, 1, :] + Sb[0, :, 0, :])
    want = 0.5 * (want + want.T) + 1e-3 * np.eye(6)
    np.testing.assert_allclose(lam_np[0], want, rtol=1e-6)


def test_odometry_edges_zero_residual():
    """Edges harvested from the current poses have zero residual there."""
    rng = np.random.default_rng(0)
    N = 6
    T = se3.exp(jnp.asarray(rng.normal(0, 0.3, (N, 6))))
    ed = odometry_edges(T)
    from sdvo_tpu.parallel.pose_graph import _pg_chi2

    chi = _pg_chi2(T.rotation, T.translation, ed, 5.0)
    assert float(chi) < 1e-12


def test_ba_with_pose_graph_refine(rng):
    """End-to-end: distributed Schur BA + pose-graph refine over the full
    trajectory — the complete BASELINE config 5 stack."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_parallel import _window_problem, FX, FY, CX, CY
    from sdvo_tpu.parallel.dist_ba import (
        ba_with_pose_graph_refine,
        shard_observations,
    )

    poses_true, pts_true, poses_init, pts_init, obs, table = _window_problem(
        rng, noise_px=0.1, pose_noise=0.05, pt_noise=0.1
    )
    K, P = 5, 120
    nsh = 4
    s_cam, s_pt, s_uv, s_valid, s_table, s_points = shard_observations(
        np.asarray(obs.cam_idx), np.asarray(obs.pt_idx), np.asarray(obs.uv),
        np.asarray(obs.valid), P, nsh, max_obs_per_point=K,
    )
    pts_sharded = np.zeros((nsh, s_points.shape[1], 3))
    for s in range(nsh):
        for lp, p in enumerate(s_points[s]):
            if p >= 0:
                pts_sharded[s, lp] = np.asarray(pts_init)[p]
    fixed_cam = jnp.zeros((K,), bool).at[0].set(True).at[1].set(True)

    # prepend 3 older keyframes to make a 8-pose trajectory
    pre = se3.exp(jnp.asarray(np.asarray([
        [-0.6, 0.0, -0.15, 0.0, -0.03, 0.0],
        [-0.4, 0.0, -0.10, 0.0, -0.02, 0.0],
        [-0.2, 0.0, -0.05, 0.0, -0.01, 0.0],
    ])))
    poses_all = SE3(
        jnp.concatenate([pre.rotation, poses_init.rotation]),
        jnp.concatenate([pre.translation, poses_init.translation]),
    )
    mesh = make_vo_mesh(num_seq=2, num_shard=nsh)
    ba_args = (
        jnp.asarray(pts_sharded), jnp.asarray(s_cam), jnp.asarray(s_pt),
        jnp.asarray(s_uv), jnp.asarray(s_valid), jnp.asarray(s_table),
        fixed_cam, FX, FY, CX, CY,
    )
    poses_ref, pts_out, chi_ba, chi_pg = ba_with_pose_graph_refine(
        poses_all, 3, ba_args, mesh=mesh, num_shards=nsh,
        num_cams=K, iterations=8,
    )
    assert poses_ref.translation.shape == (8, 3)
    assert np.isfinite(float(chi_ba)) and np.isfinite(float(chi_pg))
    R = np.asarray(poses_ref.rotation)
    assert np.allclose(R @ R.transpose(0, 2, 1), np.eye(3), atol=1e-6)
    # the window's BA solution must survive the refine: relative poses inside
    # the window stay within tolerance of the BA-only result
    from sdvo_tpu.parallel.dist_ba import distributed_local_ba
    poses_ba, _, _, _ = distributed_local_ba(
        poses_init, *ba_args, mesh=mesh, num_cams=K, iterations=8,
    )
    for k in range(1, K):
        Z_ref = se3.relative(
            jax.tree.map(lambda x: x[3 + k - 1], poses_ref),
            jax.tree.map(lambda x: x[3 + k], poses_ref),
        )
        Z_ba = se3.relative(
            jax.tree.map(lambda x: x[k - 1], poses_ba),
            jax.tree.map(lambda x: x[k], poses_ba),
        )
        d = np.asarray(se3.log(Z_ba.inverse().compose(Z_ref)))
        assert np.linalg.norm(d) < 0.05, (k, d)

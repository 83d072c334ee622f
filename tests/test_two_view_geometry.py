"""Two-view geometry: DLT triangulation, two-view depth, Sampson, E-matrix
RANSAC + pose recovery — the TPU-native replacements for
src/algorithm.cpp:109-333,553-703."""

import jax
import jax.numpy as jnp
import numpy as np

from sdvo_tpu.geometry import se3
from sdvo_tpu.geometry.se3 import SE3
from sdvo_tpu.geometry.camera import PinholeCamera
from sdvo_tpu.geometry import triangulation as tri
from sdvo_tpu.geometry import essential as ess


def make_scene(rng, n=200, noise=0.0):
    cam = PinholeCamera.create(721.5377, 721.5377, 609.5593, 172.854, 1241, 376, dtype=jnp.float64)
    pts_w = rng.uniform(low=[-10, -3, 6], high=[10, 3, 50], size=(n, 3))
    T_ref = SE3.identity(dtype=jnp.float64)
    tau = jnp.asarray([0.5, 0.05, 0.3, 0.01, 0.03, 0.005])
    T_cur = se3.exp(tau)  # world->cam of second view
    uv_ref = cam.project(T_ref.apply(jnp.asarray(pts_w)))
    uv_cur = cam.project(T_cur.apply(jnp.asarray(pts_w)))
    if noise > 0:
        uv_ref = uv_ref + rng.normal(size=uv_ref.shape) * noise
        uv_cur = uv_cur + rng.normal(size=uv_cur.shape) * noise
    return cam, jnp.asarray(pts_w), T_ref, T_cur, uv_ref, uv_cur


def test_triangulate_dlt(rng):
    cam, pts_w, T_ref, T_cur, uv_ref, uv_cur = make_scene(rng)
    K = cam.K()
    P_ref = K @ T_ref.matrix3x4()
    P_cur = K @ T_cur.matrix3x4()
    X = tri.triangulate_dlt_homogeneous(P_ref, P_cur, uv_ref, uv_cur)
    np.testing.assert_allclose(X, pts_w, atol=1e-6)


def test_two_view_depth(rng):
    cam, pts_w, T_ref, T_cur, uv_ref, uv_cur = make_scene(rng)
    T_cur_ref = se3.relative(T_ref, T_cur)
    f_ref = cam.backproject(uv_ref)
    f_cur = cam.backproject(uv_cur)
    d = tri.triangulate_two_view_depth(T_cur_ref, f_ref, f_cur)
    depth_true = jnp.linalg.norm(pts_w, axis=-1)  # ref cam at origin, unit bearings
    np.testing.assert_allclose(d, depth_true, rtol=1e-6)


def test_essential_ransac_and_recover(rng):
    cam, pts_w, T_ref, T_cur, uv_ref, uv_cur = make_scene(rng, n=300, noise=0.2)
    # inject 20% outliers
    n_out = 60
    uv_cur_np = np.array(uv_cur)
    uv_cur_np[:n_out] += rng.uniform(20, 80, size=(n_out, 2)) * np.sign(rng.normal(size=(n_out, 2)))
    uv_cur = jnp.asarray(uv_cur_np)

    x_ref = cam.normalized(uv_ref)[..., :2]
    x_cur = cam.normalized(uv_cur)[..., :2]
    mask = jnp.ones(x_ref.shape[0], dtype=bool)
    thr = (2.0 / float(cam.fx)) ** 2
    E, inl, count = ess.find_essential_ransac(
        x_ref, x_cur, mask, jax.random.PRNGKey(0), num_hypotheses=256, threshold=thr
    )
    assert int(count) > 220
    # outliers mostly rejected
    assert int(jnp.sum(inl[:n_out])) < n_out // 4

    T_rel, good = ess.recover_pose(E, x_ref, x_cur, inl)
    # translation direction matches ground truth relative pose (unit-scale)
    T_gt = se3.relative(T_ref, T_cur)
    t_gt = np.array(T_gt.translation)
    t_gt /= np.linalg.norm(t_gt)
    t_est = np.array(T_rel.translation)
    t_est /= np.linalg.norm(t_est)
    assert abs(float(np.dot(t_gt, t_est))) > 0.999
    # rotation close
    dR = np.asarray(T_rel.rotation).T @ np.asarray(T_gt.rotation)
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5


def test_sampson_correction_reduces_error(rng):
    cam, pts_w, T_ref, T_cur, uv_ref, uv_cur = make_scene(rng, n=100, noise=0.5)
    T_rel = se3.relative(T_ref, T_cur)
    E = se3.hat(T_rel.translation) @ T_rel.rotation
    x_ref = cam.normalized(uv_ref)
    x_cur = cam.normalized(uv_cur)
    d_before = tri.sampson_distance(E, x_ref, x_cur)
    xr2, xc2 = tri.sampson_correction(E, x_ref, x_cur)
    d_after = tri.sampson_distance(E, xr2, xc2)
    assert float(jnp.mean(d_after)) < float(jnp.mean(d_before)) * 0.05


def test_reprojection_error_zero(rng):
    cam, pts_w, T_ref, T_cur, uv_ref, uv_cur = make_scene(rng)
    err = tri.reprojection_error(T_cur, cam, pts_w, uv_cur)
    np.testing.assert_allclose(err, 0.0, atol=1e-8)


def test_ransac_fails_fast_below_minimal_sample(rng):
    """Fewer than 8 valid correspondences cannot constrain E — the RANSAC must
    return inlier count 0 (previously top_k silently drew invalid indices)."""
    import jax
    import jax.numpy as jnp

    from sdvo_tpu.geometry.essential import find_essential_ransac

    N = 32
    x_ref = jnp.asarray(rng.normal(size=(N, 2)) * 0.2)
    x_cur = x_ref + 0.01
    mask = jnp.zeros((N,), bool).at[:6].set(True)  # only 6 valid
    E, inl, count = find_essential_ransac(
        x_ref, x_cur, mask, jax.random.PRNGKey(0), num_hypotheses=32
    )
    assert int(count) == 0
    assert not bool(jnp.any(inl))

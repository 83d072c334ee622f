"""Fused Pallas pose-refinement kernel vs optimize_pose (interpret mode on
CPU — the same kernel compiles with Mosaic on TPU)."""

import jax.numpy as jnp
import numpy as np

from sdvo_tpu.ba.bundle_adjustment import optimize_pose
from sdvo_tpu.geometry import se3
from sdvo_tpu.geometry.se3 import SE3
from sdvo_tpu.ops.pallas_pose import pose_refine
from sdvo_tpu.optim.optimizer import LMSettings


def _problem(rng, n=150, outliers=10):
    f32 = jnp.float32
    pts = rng.uniform([-4, -3, 6], [4, 3, 18], size=(n, 3))
    tau_true = np.asarray([0.05, -0.03, 0.08, 0.004, -0.006, 0.01])
    T_true = se3.exp(jnp.asarray(tau_true, f32))
    p_cam = np.asarray(T_true.rotation) @ pts.T
    p_cam = p_cam.T + np.asarray(T_true.translation)
    brg = p_cam / np.linalg.norm(p_cam, axis=-1, keepdims=True)
    brg += rng.normal(0, 5e-4, size=brg.shape)
    brg[:outliers] += rng.normal(0, 0.05, size=(outliers, 3))
    brg /= np.linalg.norm(brg, axis=-1, keepdims=True)
    valid = np.ones(n, bool)
    valid[-5:] = False
    return (
        jnp.asarray(pts, f32), jnp.asarray(brg, f32), jnp.asarray(valid),
        T_true,
    )


def test_pose_refine_matches_optimize_pose(rng):
    pts, brg, valid, T_true = _problem(rng)
    T0 = SE3.identity(dtype=jnp.float32)

    T_x, _, _ = optimize_pose(
        T0, pts, brg, valid,
        settings=LMSettings(max_iterations=8, mad="hist", min_rel_decrease=1e-3),
    )
    T_p, rmse_p, iters = pose_refine(
        T0, pts, brg, valid, max_iters=8, interpret=True
    )

    for T_est in (T_x, T_p):
        err = np.asarray(se3.log(T_est.compose(T_true.inverse())), np.float64)
        assert np.linalg.norm(err[:3]) < 5e-3, err
        assert np.linalg.norm(err[3:]) < 1e-3, err
    d = np.asarray(se3.log(T_p.compose(T_x.inverse())), np.float64)
    assert np.linalg.norm(d) < 2e-3, d
    assert int(iters) >= 2


def test_pose_refine_all_invalid(rng):
    pts, brg, valid, _ = _problem(rng)
    T0 = SE3.identity(dtype=jnp.float32)
    T_p, _, _ = pose_refine(
        T0, pts, brg, jnp.zeros_like(valid), max_iters=5, interpret=True
    )
    assert np.all(np.isfinite(np.asarray(T_p.translation)))
    np.testing.assert_allclose(np.asarray(T_p.translation), 0.0, atol=1e-5)

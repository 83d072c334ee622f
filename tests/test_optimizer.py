"""GN/LM engine + M-estimator tests: convergence on synthetic problems with
outliers, rollback behavior, parity of weight formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdvo_tpu.geometry import se3
from sdvo_tpu.geometry.se3 import SE3
from sdvo_tpu.optim.estimators import MESTIMATORS, compute_std, mestimator_weights
from sdvo_tpu.optim.optimizer import LMSettings, optimize_gn, optimize_lm, tukey_weights


def test_estimator_registry_complete():
    # same 15 methods as the reference's allMethods (src/estimator.cpp:8-23)
    expected = {
        "l2", "l1", "diff", "lp", "fair", "huber", "cauchy", "geman-mcclure",
        "welch", "tukey", "drummond", "andrew-wave", "ramsay", "trimmed-mean",
        "t-distro",
    }
    assert set(MESTIMATORS) == expected


def test_weights_shapes_and_mask(rng):
    r = jnp.asarray(rng.normal(size=64))
    mask = jnp.asarray(rng.uniform(size=64) > 0.3)
    for name in MESTIMATORS:
        w = mestimator_weights(r, name, mask)
        assert w.shape == r.shape
        assert np.all(np.asarray(w)[~np.asarray(mask)] == 0.0)
        assert np.all(np.isfinite(np.asarray(w)))


def test_huber_formula(rng):
    r = jnp.asarray(rng.normal(size=501))
    w = mestimator_weights(r, "huber")
    sigma = compute_std(r)
    c = 1.345 * float(sigma)
    a = np.abs(np.asarray(r))
    expected = np.where(a <= c, 1.0, c / a)
    np.testing.assert_allclose(w, expected, atol=1e-9)


def test_tukey_zero_beyond_cutoff(rng):
    r = jnp.asarray(np.concatenate([rng.normal(size=100) * 0.1, [50.0, -70.0]]))
    vis = jnp.ones(102, dtype=bool)
    w = tukey_weights(r, vis)
    assert float(w[-1]) == 0.0 and float(w[-2]) == 0.0
    assert float(w[0]) > 0.0


def _point_alignment_problem(rng, n=100, outliers=0, noise=0.0):
    """Estimate T from point pairs q = T p (+noise, + outliers)."""
    pts = jnp.asarray(rng.uniform(-5, 5, size=(n, 3)))
    tau_true = jnp.asarray([0.3, -0.2, 0.5, 0.05, -0.1, 0.08])
    T_true = se3.exp(tau_true)
    q = T_true.apply(pts)
    q = q + jnp.asarray(rng.normal(size=(n, 3))) * noise
    if outliers:
        q_np = np.array(q)
        q_np[:outliers] += rng.uniform(3, 6, size=(outliers, 3))
        q = jnp.asarray(q_np)

    def residual_fn(T):
        r = (T.apply(pts) - q).reshape(-1)  # (3n,)
        return r, jnp.ones_like(r, dtype=bool)

    def jacobian_fn(T):
        # d(T exp(xi) p)/dxi at xi=0 = R_T [I | -hat(p)]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=pts.dtype), (n, 3, 3))
        dp = jnp.concatenate([eye, -se3.hat(pts)], axis=-1)  # (n, 3, 6)
        J = jnp.einsum("ij,njk->nik", T.rotation, dp)
        return J.reshape(-1, 6)

    def update_fn(T, dx):
        return T.compose(se3.exp(dx))  # note +dx: residual dr/dxi = J

    return T_true, residual_fn, jacobian_fn, update_fn


def test_lm_converges_clean(rng):
    T_true, res, jac, upd = _point_alignment_problem(rng)
    # residual r = T p - q; minimizing 0.5 r^2 -> dx = -H^-1 g; our engine
    # solves H dx = g and the caller applies the sign in update_fn.
    upd_neg = lambda T, dx: T.compose(se3.exp(-dx))
    T_est, rmse, status = optimize_lm(SE3.identity(dtype=jnp.float64), res, jac, upd_neg, LMSettings())
    err = np.asarray(se3.log(T_est.compose(T_true.inverse())))
    np.testing.assert_allclose(err, 0.0, atol=1e-5)


def test_lm_robust_to_outliers(rng):
    T_true, res, jac, upd = _point_alignment_problem(rng, n=200, outliers=40, noise=0.005)
    upd_neg = lambda T, dx: T.compose(se3.exp(-dx))
    T_est, rmse, status = optimize_lm(
        SE3.identity(dtype=jnp.float64), res, jac, upd_neg, LMSettings(max_iterations=30)
    )
    err = np.linalg.norm(np.asarray(se3.log(T_est.compose(T_true.inverse()))))
    assert err < 0.01


def test_gn_converges(rng):
    T_true, res, jac, upd = _point_alignment_problem(rng)
    upd_neg = lambda T, dx: T.compose(se3.exp(-dx))
    T_est, rmse, _ = optimize_gn(
        SE3.identity(dtype=jnp.float64), res, jac, upd_neg, LMSettings(max_iterations=10, estimator="l2")
    )
    err = np.linalg.norm(np.asarray(se3.log(T_est.compose(T_true.inverse()))))
    assert err < 1e-8


def test_lm_jits(rng):
    T_true, res, jac, upd = _point_alignment_problem(rng)
    upd_neg = lambda T, dx: T.compose(se3.exp(-dx))

    @jax.jit
    def run(T0):
        return optimize_lm(T0, res, jac, upd_neg, LMSettings())

    T_est, rmse, status = run(SE3.identity(dtype=jnp.float64))
    err = np.linalg.norm(np.asarray(se3.log(T_est.compose(T_true.inverse()))))
    assert err < 1e-5


def test_lm_marquardt_method(rng):
    T_true, res, jac, upd = _point_alignment_problem(rng, noise=0.001)
    upd_neg = lambda T, dx: T.compose(se3.exp(-dx))
    T_est, rmse, _ = optimize_lm(
        SE3.identity(dtype=jnp.float64), res, jac, upd_neg, LMSettings(method="marquardt")
    )
    err = np.linalg.norm(np.asarray(se3.log(T_est.compose(T_true.inverse()))))
    assert err < 0.01


def test_lm_quadratic_method(rng):
    """The quadratic line-fit damping (reference include/optimizer.hpp:14-19,
    implemented from the commented algebra of src/optimizer.cpp:427-447) is a
    real third strategy, not an alias: it must converge on its own."""
    T_true, res, jac, upd = _point_alignment_problem(rng, noise=0.001)
    upd_neg = lambda T, dx: T.compose(se3.exp(-dx))
    T_est, rmse, _ = optimize_lm(
        SE3.identity(dtype=jnp.float64), res, jac, upd_neg,
        LMSettings(method="quadratic", max_iterations=30),
    )
    err = np.linalg.norm(np.asarray(se3.log(T_est.compose(T_true.inverse()))))
    assert err < 0.01


def test_hist_mad_matches_exact(rng):
    from sdvo_tpu.geometry.robust import masked_mad, masked_mad_hist

    x = jnp.asarray(rng.normal(0.0, 12.0, size=(6400,)))
    mask = jnp.asarray(rng.uniform(size=(6400,)) > 0.2)
    exact = float(masked_mad(x, mask))
    approx = float(masked_mad_hist(x, mask))
    # bin width = range/256 ≈ 0.35 here; interpolation gets much closer
    assert abs(approx - exact) < 0.15 * exact + 0.2


def test_unrolled_cholesky_solve(rng):
    from sdvo_tpu.optim.optimizer import _chol_solve_unrolled

    A = rng.normal(size=(6, 6))
    H = jnp.asarray(A @ A.T + 6 * np.eye(6))
    g = jnp.asarray(rng.normal(size=(6,)))
    dx, ok = _chol_solve_unrolled(H, g)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(dx), np.linalg.solve(np.asarray(H), np.asarray(g)), rtol=1e-6)
    # non-PD matrix flagged
    _, ok_bad = _chol_solve_unrolled(jnp.asarray(-np.eye(6)), g)
    assert not bool(ok_bad)


def test_lm_hist_mad_and_early_exit(rng):
    T_true, res, jac, upd = _point_alignment_problem(rng, n=200, outliers=40, noise=0.005)
    upd_neg = lambda T, dx: T.compose(se3.exp(-dx))
    T_est, rmse, status = optimize_lm(
        SE3.identity(dtype=jnp.float64), res, jac, upd_neg,
        LMSettings(max_iterations=30, mad="hist", min_rel_decrease=1e-3),
    )
    err = np.linalg.norm(np.asarray(se3.log(T_est.compose(T_true.inverse()))))
    assert err < 0.01

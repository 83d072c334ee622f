"""Generic batched IRLS Gauss-Newton / Levenberg-Marquardt engine.

From-scratch replacement for the reference's callback-driven ``Optimizer``
(src/optimizer.cpp:161-370): same structure — residual/jacobian/update
functors, Tukey IRLS with sigma = 1.4826·MAD, dense normal equations
``H = JᵀWJ``, LDLT solve, three damping strategies (Marquardt / Quadratic /
Nielsen, include/optimizer.hpp:14-19), rollback on a failed step, and the same
convergence gates (max 20 iters, step < 1e-16, lambda bounds, |dx| > 1e3 or NaN
abort, src/optimizer.cpp:13-27,314-334) — but as one ``lax.while_loop`` whose
body is a fixed-shape tensor program:

* residuals for ALL observations come from one batched functor (the
  reference's per-feature loops are the caller's vmap),
* the while-carry holds (params, previous params, residual state, lambda, nu),
  and rollback is a ``tree_map`` of ``jnp.where`` — no host control flow,
* the D×D solve uses ``cho_solve`` with a jitter fallback.

``params`` may be ANY pytree (SE3, (N,3) point blocks, per-feature 3-vectors);
the caller supplies ``update_fn(params, dx) -> params`` as the retraction — the
analog of the reference's explicit instantiations over SE3/SE2/Vec3/Point
(src/optimizer.cpp:602-630).
"""

from __future__ import annotations

import enum
from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sdvo_tpu.geometry.robust import masked_mad, masked_mad_hist


class LevenbergMethod(enum.Enum):
    MARQUARDT = "marquardt"  # H += lambda * diag(H); lambda /9 or *11
    # Quadratic line-fit damping: alpha = gᵀdx/(Δchi²/2 + 2gᵀdx) rescales the
    # accepted step; lambda /= (1+alpha) on success, += |Δchi²|/(2alpha) on
    # failure. The reference declares this strategy (include/optimizer.hpp:14-19)
    # but ships the branch commented out (src/optimizer.cpp:427-447); here it
    # is a real working implementation of that commented algebra.
    QUADRATIC = "quadratic"
    NIELSEN = "nielsen"  # H += lambda * I; Nielsen's nu schedule


class OptimizerStatus:
    """Bit-compatible with the reference's ``Optimizer::Status`` intent."""

    SUCCESS = 0
    NON_SUFF_POINTS = 1
    MAX_COFF_DX = 2
    NON_FINITE_DX = 3
    SMALL_STEP = 4
    LAMBDA_BOUND = 5
    FAILED = 6


class LMSettings(NamedTuple):
    max_iterations: int = 20
    min_chi2: float = 1e-1
    min_step: float = 1e-16
    max_dx: float = 1e3
    init_lambda: float = 1e-2
    lambda_min: float = 1e-14
    lambda_max: float = 1e14
    method: str = "nielsen"
    # robust weighting applied each residual pass ("tukey" matches the
    # reference's hard-coded tukeyWeighting; any MESTIMATORS key works)
    estimator: str = "tukey"
    # "exact": sort-based MAD (reference parity). "hist": histogram-CDF MAD —
    # O(N) reductions instead of two device sorts, the TPU hot-path choice.
    mad: str = "exact"
    # stop after an ACCEPTED step whose relative chi² decrease is below this
    # (0 disables — full reference behavior of running to max_iterations)
    min_rel_decrease: float = 0.0
    # compute the robust scale (MAD) ONCE from the initial residuals and keep
    # the Tukey cutoff fixed across the LM iterations of one solve. The scale
    # changes by a few percent within a level while the histogram MAD costs
    # several kernels per iteration; the reference recomputes per iteration
    # (src/optimizer.cpp:485-514) — the default keeps that behavior.
    freeze_sigma: bool = False
    # emit post-solve diagnostics (final residuals, weights, visibility mask,
    # JᵀWJ) to the sink installed with set_diagnostics_sink — the reference's
    # Optimizer::visualize flag (src/optimizer.cpp:516-599). Off the hot path:
    # one extra Jacobian/Hessian evaluation and a host callback per solve.
    visualize: bool = False
    viz_tag: str = ""


# --- optimizer diagnostics sink (Optimizer::visualize, the matplotlib-cpp
# bridge of the reference, src/optimizer.cpp:516-599 / visualization.cpp:
# 597-844). The sink runs on HOST via jax.debug.callback after the solve.
_DIAGNOSTICS_SINK = None


def set_diagnostics_sink(fn) -> None:
    """Install fn(tag, residuals, weights, visible, H) — np arrays — or None."""
    global _DIAGNOSTICS_SINK
    _DIAGNOSTICS_SINK = fn


def _dispatch_diagnostics(tag: str, r, w, vis, H) -> None:
    if _DIAGNOSTICS_SINK is not None:
        import numpy as _np

        _DIAGNOSTICS_SINK(
            tag, _np.asarray(r), _np.asarray(w), _np.asarray(vis), _np.asarray(H)
        )


def tukey_weights(
    residuals: jax.Array, visible: jax.Array, mad: str = "exact", sigma=None
) -> jax.Array:
    """The reference's ``Optimizer::tukeyWeighting`` (src/optimizer.cpp:485-514):
    sigma = 1.4826·MAD over visible residuals, c = 4.6851σ, zero outside."""
    if sigma is None:
        mad_fn = masked_mad_hist if mad == "hist" else masked_mad
        sigma = 1.4826 * mad_fn(residuals, visible)
    sigma = jnp.maximum(sigma, jnp.finfo(residuals.dtype).eps)
    c = 4.6851 * sigma
    w = (1.0 - (residuals * residuals) / (c * c)) ** 2
    w = jnp.where(jnp.abs(residuals) <= c, w, 0.0)
    return jnp.where(visible, w, 0.0)


def robust_sigma(residuals: jax.Array, visible: jax.Array, mad: str = "exact") -> jax.Array:
    mad_fn = masked_mad_hist if mad == "hist" else masked_mad
    return 1.4826 * mad_fn(residuals, visible)


def _weights_for(
    estimator: str, residuals: jax.Array, visible: jax.Array, mad: str = "exact",
    sigma=None,
) -> jax.Array:
    if estimator == "tukey":
        return tukey_weights(residuals, visible, mad, sigma)
    from sdvo_tpu.optim.estimators import mestimator_weights

    return mestimator_weights(residuals, estimator, visible)


def _chi2(residuals: jax.Array, weights: jax.Array, visible: jax.Array) -> jax.Array:
    r2 = residuals * residuals * weights
    return jnp.sum(jnp.where(visible, r2, 0.0))


_UNROLL_MAX_D = 8


def _chol_solve_unrolled(A: jax.Array, g: jax.Array):
    """Cholesky factor + solve fully unrolled in scalar ops for small static D.

    ``jnp.linalg.cholesky``/``cho_solve`` lower to LAPACK-style custom calls —
    separate kernel dispatches that dominate a 6×6 solve inside a while_loop.
    Unrolling emits ~D³/3 fused VPU scalar ops instead. Returns (dx, ok) where
    ok = all pivots strictly positive and dx finite.
    """
    D = A.shape[0]
    tiny = jnp.asarray(jnp.finfo(A.dtype).tiny, A.dtype)
    L = [[None] * D for _ in range(D)]
    ok = jnp.asarray(True)
    for i in range(D):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                ok = ok & (s > 0.0)
                L[i][j] = jnp.sqrt(jnp.maximum(s, tiny))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L y = g
    y = [None] * D
    for i in range(D):
        s = g[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # backward substitution Lᵀ x = y
    x = [None] * D
    for i in reversed(range(D)):
        s = y[i]
        for k in range(i + 1, D):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    dx = jnp.stack(x)
    return dx, ok & jnp.all(jnp.isfinite(dx))


def _solve_damped(H: jax.Array, g: jax.Array) -> jax.Array:
    """Solve H dx = g via Cholesky with diagonal-jitter fallback."""
    dtype = H.dtype
    eye = jnp.eye(H.shape[0], dtype=dtype)

    if H.shape[0] <= _UNROLL_MAX_D:
        # pre-jittered solve: a RELATIVE per-diagonal ridge (Marquardt-style,
        # 1e-7·diag) preserves the very different magnitudes of the
        # translation/rotation directions (an absolute trace-scaled ridge
        # swamps the small ones) and is negligible next to the LM damping
        # already in H. A genuinely indefinite system retries once with a
        # strong ridge instead of returning dx=0 — a zero step would trip the
        # small-step abort and END the whole solve, where the reference lets
        # lambda escalate and keeps iterating (src/optimizer.cpp:314-334;
        # ADVICE r3). This engine no longer sits in the device hot loop (the
        # pallas kernels do), so the extra unrolled chain is free.
        diagH = jnp.diagonal(H)
        ridge = 1e-7 * diagH + jnp.finfo(dtype).tiny
        dx0, ok0 = _chol_solve_unrolled(H + jnp.diag(ridge), g)
        strong = 1e-3 * jnp.max(jnp.abs(diagH)) + 1e-12
        dx1, ok1 = _chol_solve_unrolled(H + jnp.diag(ridge + strong), g)
        return jnp.where(ok0, dx0, jnp.where(ok1, dx1, 0.0))

    def try_solve(jitter):
        L, ok = _chol(H + jitter * eye)
        dx = jax.scipy.linalg.cho_solve((L, True), g)
        return dx, ok & jnp.all(jnp.isfinite(dx))

    dx0, ok0 = try_solve(jnp.asarray(0.0, dtype))
    dx1, _ = try_solve(jnp.asarray(1e-6, dtype) * jnp.trace(H))
    return jnp.where(ok0, dx0, dx1)


def _chol(A: jax.Array):
    L = jnp.linalg.cholesky(A)
    ok = jnp.all(jnp.isfinite(L))
    L = jnp.where(ok, L, jnp.eye(A.shape[0], dtype=A.dtype))
    return L, ok


class _LMState(NamedTuple):
    params: Any
    pre_params: Any
    residuals: jax.Array
    weights: jax.Array
    visible: jax.Array
    chi2: jax.Array
    pre_chi2: jax.Array
    lam: jax.Array
    nu: jax.Array
    iteration: jax.Array
    status: jax.Array
    done: jax.Array


def optimize_lm(
    params0: Any,
    residual_fn: Callable[[Any], Tuple[jax.Array, jax.Array]],
    jacobian_fn: Callable[[Any], jax.Array],
    update_fn: Callable[[Any, jax.Array], Any],
    settings: LMSettings = LMSettings(),
) -> Tuple[Any, jax.Array, jax.Array]:
    """Levenberg-Marquardt with IRLS robust weights.

    Args:
      params0: pytree of initial parameters.
      residual_fn: params -> (residuals (N,), visible (N,) bool). N static.
      jacobian_fn: params -> J (N, D). For inverse-compositional problems pass
        ``lambda p: J_const``.
      update_fn: (params, dx (D,)) -> params — the retraction, including sign
        convention (image alignment uses ``pose · exp(-dx)``,
        src/image_alignment.cpp:372-380).
      settings: LMSettings.

    Returns (params, rmse, status); on failed/aborted steps params roll back to
    the last accepted iterate, matching src/optimizer.cpp:352-360.
    """
    method = LevenbergMethod(settings.method) if not isinstance(settings.method, LevenbergMethod) else settings.method
    use_marquardt = method == LevenbergMethod.MARQUARDT
    use_quadratic = method == LevenbergMethod.QUADRATIC

    r0, vis0 = residual_fn(params0)
    dtype = r0.dtype
    sigma0 = (
        robust_sigma(r0, vis0, settings.mad)
        if (settings.freeze_sigma and settings.estimator == "tukey")
        else None
    )
    w0 = _weights_for(settings.estimator, r0, vis0, settings.mad, sigma0)
    chi0 = _chi2(r0, w0, vis0)

    # probe J once for shape/D
    J_probe = jacobian_fn(params0)
    D = J_probe.shape[-1]

    init = _LMState(
        params=params0,
        pre_params=params0,
        residuals=r0,
        weights=w0,
        visible=vis0,
        chi2=chi0,
        pre_chi2=chi0,
        lam=jnp.asarray(settings.init_lambda, dtype),
        nu=jnp.asarray(2.0, dtype),
        iteration=jnp.asarray(0, jnp.int32),
        status=jnp.asarray(OptimizerStatus.SUCCESS, jnp.int32),
        done=jnp.asarray(False),
    )

    def cond(s: _LMState):
        return (~s.done) & (s.iteration < settings.max_iterations)

    def body(s: _LMState) -> _LMState:
        J = jacobian_fn(s.params)  # (N, D)
        wv = jnp.where(s.visible, s.weights, 0.0)
        Jw = J * wv[:, None]
        H = J.T @ Jw  # (D, D) — JᵀWJ (src/optimizer.cpp:279)
        g = Jw.T @ s.residuals  # JᵀWr

        diagH = jnp.diagonal(H)
        # Nielsen: on the very first iteration scale lambda by max diag
        # (src/optimizer.cpp:296-302).
        lam = jnp.where(
            (~jnp.asarray(use_marquardt)) & (s.iteration == 0),
            s.lam * jnp.max(diagH),
            s.lam,
        )
        if use_marquardt:
            H_damped = H + jnp.diag(lam * diagH)
        else:
            H_damped = H + lam * jnp.eye(D, dtype=dtype)

        dx = _solve_damped(H_damped, g)

        # abort gates (src/optimizer.cpp:314-334)
        bad_dx = jnp.max(dx) > settings.max_dx
        nonfinite = ~jnp.all(jnp.isfinite(dx))
        step = jnp.sum(dx * dx)
        small_step = step < settings.min_step
        lam_bound = (lam >= settings.lambda_max) | (lam <= settings.lambda_min)

        new_params = update_fn(s.params, dx)
        r_new, vis_new = residual_fn(new_params)
        w_new = _weights_for(settings.estimator, r_new, vis_new, settings.mad, sigma0)
        chi_new = _chi2(r_new, w_new, vis_new)

        if use_quadratic:
            # quadratic line fit along dx (src/optimizer.cpp:427-447, the
            # reference's commented-out branch, implemented for real): the
            # model chi²(alpha·dx) ≈ chi² − alpha·gᵀdx + alpha²(gᵀdx + Δ/2)
            # is minimized at alpha = gᵀdx/(Δ/2 + 2gᵀdx); the ACCEPTED step
            # is rescaled by alpha and re-evaluated.
            gTdx = jnp.sum(g * dx)
            diff = s.chi2 - chi_new
            denom_a = 0.5 * diff + 2.0 * gTdx
            alpha = jnp.where(
                jnp.abs(denom_a) > jnp.finfo(dtype).tiny, gTdx / denom_a, 1.0
            )
            alpha = jnp.where(jnp.isfinite(alpha) & (alpha > 0.0), alpha, 1.0)
            new_params = update_fn(s.params, alpha * dx)
            r_new, vis_new = residual_fn(new_params)
            w_new = _weights_for(settings.estimator, r_new, vis_new, settings.mad, sigma0)
            chi_q = _chi2(r_new, w_new, vis_new)
            # acceptance is judged on the re-evaluated alpha step
            chi_new = chi_q

        # Gain ratio rho = actual decrease / predicted decrease. The reference
        # feeds the RAW chi2 difference into Nielsen's formula
        # (src/optimizer.cpp:441-455) — which only behaves when chi2 is large;
        # the proper normalized gain ratio (the formula in the reference's own
        # comment, :438) works at every residual scale, so we use it.
        pred = jnp.sum(dx * (lam * dx + g)) if not use_marquardt else jnp.sum(
            dx * (lam * diagH * dx + g)
        )
        rho = (s.chi2 - chi_new) / jnp.maximum(pred, jnp.finfo(dtype).tiny)
        success = (s.chi2 - chi_new) > 0.0

        # damping update (Optimizer::updateParameters, src/optimizer.cpp:405-468)
        if use_marquardt:
            lam_next = jnp.where(
                success,
                jnp.maximum(lam / 9.0, 1e-7),
                jnp.minimum(lam * 11.0, 1e7),
            )
            nu_next = s.nu
        elif use_quadratic:
            lam_next = jnp.where(
                success,
                jnp.maximum(lam / (1.0 + alpha), 1e-7),
                lam + jnp.abs(diff) / jnp.maximum(2.0 * alpha, jnp.finfo(dtype).tiny),
            )
            nu_next = s.nu
        else:
            lam_next = jnp.where(
                success,
                lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
                lam * s.nu,
            )
            nu_next = jnp.where(success, 2.0, s.nu * 2.0)

        abort = bad_dx | nonfinite | small_step | lam_bound
        accept = success & ~abort

        # converged: stop when progress is exhausted — either an ACCEPTED step
        # barely improved chi², or the PREDICTED decrease dxᵀ(λdx+g) is already
        # negligible relative to chi² (at the optimum g→0, so rejected steps
        # also terminate instead of burning the remaining iterations doubling
        # lambda). The reference only has the absolute min_chi2 gate
        # (src/optimizer.cpp:24); a relative gate works at every residual
        # scale. 0 disables.
        if settings.min_rel_decrease > 0.0:
            chi_ref = jnp.maximum(s.chi2, jnp.finfo(dtype).tiny)
            rel_dec = (s.chi2 - chi_new) / chi_ref
            rel_pred = pred / chi_ref
            abort = abort | (accept & (rel_dec < settings.min_rel_decrease)) | (
                rel_pred < 0.1 * settings.min_rel_decrease
            )

        def sel(new, old):
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, a, b), new, old
            )

        params_out = sel(new_params, s.params)
        status = jnp.where(bad_dx, OptimizerStatus.MAX_COFF_DX, s.status)
        status = jnp.where(nonfinite, OptimizerStatus.NON_FINITE_DX, status)
        status = jnp.where(small_step, OptimizerStatus.SMALL_STEP, status)
        status = jnp.where(lam_bound & ~small_step, OptimizerStatus.LAMBDA_BOUND, status)

        return _LMState(
            params=params_out,
            pre_params=s.params,
            residuals=jnp.where(accept, r_new, s.residuals),
            weights=jnp.where(accept, w_new, s.weights),
            visible=jnp.where(accept, vis_new, s.visible),
            chi2=jnp.where(accept, chi_new, s.chi2),
            pre_chi2=s.chi2,
            lam=lam_next,
            nu=nu_next,
            iteration=s.iteration + 1,
            status=status,
            done=abort,
        )

    final = jax.lax.while_loop(cond, body, init)
    n_vis = jnp.maximum(jnp.sum(final.visible.astype(dtype)), 1.0)
    rmse = jnp.sqrt(final.chi2 / n_vis)
    if settings.visualize:
        # post-solve diagnostics at the FINAL iterate (the reference calls
        # visualize() with the last residual/weight/Hessian state,
        # src/optimizer.cpp:516-599); off the hot path by construction —
        # callers enable it per solve via settings
        J_f = jacobian_fn(final.params)
        wv_f = jnp.where(final.visible, final.weights, 0.0)
        H_f = J_f.T @ (J_f * wv_f[:, None])
        jax.debug.callback(
            partial(_dispatch_diagnostics, settings.viz_tag),
            final.residuals, final.weights, final.visible, H_f,
        )
    return final.params, rmse, final.status


def optimize_gn(
    params0: Any,
    residual_fn: Callable[[Any], Tuple[jax.Array, jax.Array]],
    jacobian_fn: Callable[[Any], jax.Array],
    update_fn: Callable[[Any, jax.Array], Any],
    settings: LMSettings = LMSettings(),
) -> Tuple[Any, jax.Array, jax.Array]:
    """Plain Gauss-Newton (``Optimizer::optimizeGN``): fixed iterations, no
    damping, no rollback — every step accepted."""

    r0, vis0 = residual_fn(params0)
    dtype = r0.dtype

    def body(i, carry):
        params, _, _ = carry
        r, vis = residual_fn(params)
        w = _weights_for(settings.estimator, r, vis, settings.mad)
        J = jacobian_fn(params)
        wv = jnp.where(vis, w, 0.0)
        Jw = J * wv[:, None]
        H = J.T @ Jw
        g = Jw.T @ r
        dx = _solve_damped(H, g)
        params = update_fn(params, dx)
        return (params, _chi2(r, w, vis), jnp.sum(vis.astype(dtype)))

    params, chi2, nvis = jax.lax.fori_loop(
        0, settings.max_iterations, body, (params0, jnp.asarray(0.0, dtype), jnp.asarray(1.0, dtype))
    )
    rmse = jnp.sqrt(chi2 / jnp.maximum(nvis, 1.0))
    return params, rmse, jnp.asarray(OptimizerStatus.SUCCESS, jnp.int32)

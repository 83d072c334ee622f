"""Mixed Gaussian-Beta (Vogiatzis) inverse-depth filters, fully batched.

Replaces the reference's ``MixedGaussianFilter`` data struct
(src/mixed_gaussian_filter.cpp:7-24) and the ``DepthEstimator`` update path
(src/depth_estimator.cpp:192-357). The reference runs these in a background
``std::thread`` guarded by mutexes/condvars (SURVEY §2.4); batching the whole
filter bank into one tensor program makes the update cheap enough to run
inline in the per-frame step — the thread, its queue, and both mutexes
disappear (SURVEY §7 step 7).

State is a fixed-capacity SoA ``FilterBank``; dead filters are masked, not
erased. The Bayesian measurement fusion is the closed-form Gaussian×Beta
update of Vogiatzis & Hernández ("Video-based, real-time multi-view stereo"),
exactly mirroring ``DepthEstimator::updateFilter``
(src/depth_estimator.cpp:311-340); measurement uncertainty ``tau`` uses the
one-pixel law-of-sines construction of ``computeTau`` (:342-357).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sdvo_tpu.depth.epipolar import epipolar_search
from sdvo_tpu.geometry.robust import gaussian_pdf
from sdvo_tpu.geometry.se3 import SE3


class FilterBank(NamedTuple):
    """Fixed-capacity (F,) SoA of depth filters."""

    uv_ref: jax.Array  # (F, 2) feature pixel in the host keyframe
    bearing_ref: jax.Array  # (F, 3) unit bearing in the host keyframe
    ref_patch: jax.Array  # (F, P²) fixed reference patch (identity warp)
    kf_slot: jax.Array  # (F,) int32 arena slot of the host keyframe
    mu: jax.Array  # (F,) inverse-depth mean
    var: jax.Array  # (F,) inverse-depth variance
    a: jax.Array  # (F,) Beta inlier count
    b: jax.Array  # (F,) Beta outlier count
    max_inv_depth: jax.Array  # (F,) = 1/depth_min (the reference's m_maxDepth)
    born_kf: jax.Array  # (F,) keyframe counter at creation (staleness)
    valid: jax.Array  # (F,) bool

    @staticmethod
    def empty(capacity: int, patch_area: int, dtype=jnp.float32) -> "FilterBank":
        F = capacity
        return FilterBank(
            uv_ref=jnp.zeros((F, 2), dtype),
            bearing_ref=jnp.zeros((F, 3), dtype).at[:, 2].set(1.0),
            ref_patch=jnp.zeros((F, patch_area), dtype),
            kf_slot=jnp.zeros((F,), jnp.int32),
            mu=jnp.ones((F,), dtype),
            var=jnp.ones((F,), dtype),
            a=jnp.full((F,), 10.0, dtype),
            b=jnp.full((F,), 10.0, dtype),
            max_inv_depth=jnp.ones((F,), dtype),
            born_kf=jnp.zeros((F,), jnp.int32),
            valid=jnp.zeros((F,), bool),
        )


def init_filters(
    uv: jax.Array,  # (N, 2) new feature pixels
    bearing: jax.Array,  # (N, 3)
    ref_patch: jax.Array,  # (N, P²)
    kf_slot: int,
    depth_mean: jax.Array,
    depth_min: jax.Array,
    kf_counter: int,
    new_valid: jax.Array,  # (N,)
    dtype=jnp.float32,
):
    """Per-feature seeds (``MixedGaussianFilter`` ctor + initializeFilters,
    src/depth_estimator.cpp:175-190): Beta(10, 10), mu = 1/depth_mean,
    max_inv_depth = 1/depth_min, sigma = max_inv_depth/6."""
    N = uv.shape[0]
    mu = jnp.full((N,), 1.0, dtype) / jnp.maximum(depth_mean, 1e-9)
    max_inv = jnp.full((N,), 1.0, dtype) / jnp.maximum(depth_min, 1e-9)
    sigma = max_inv / 6.0
    return FilterBank(
        uv_ref=uv.astype(dtype),
        bearing_ref=bearing.astype(dtype),
        ref_patch=ref_patch.astype(dtype),
        kf_slot=jnp.full((N,), kf_slot, jnp.int32),
        mu=mu,
        var=sigma * sigma,
        a=jnp.full((N,), 10.0, dtype),
        b=jnp.full((N,), 10.0, dtype),
        max_inv_depth=max_inv,
        born_kf=jnp.full((N,), kf_counter, jnp.int32),
        valid=new_valid,
    )


def compute_tau(
    T_cur_ref: SE3, bearing: jax.Array, depth: jax.Array, px_error_angle: jax.Array
) -> jax.Array:
    """Depth uncertainty from a one-pixel angular error via the law of sines
    (``DepthEstimator::computeTau``, src/depth_estimator.cpp:342-357)."""
    t = jnp.broadcast_to(T_cur_ref.translation, bearing.shape)
    a = bearing * depth[..., None] - t
    t_norm = jnp.linalg.norm(t, axis=-1)
    a_norm = jnp.linalg.norm(a, axis=-1)
    alpha = jnp.arccos(jnp.clip(jnp.sum(bearing * t, axis=-1) / jnp.maximum(t_norm, 1e-12), -1.0, 1.0))
    beta = jnp.arccos(
        jnp.clip(jnp.sum(a * -t, axis=-1) / jnp.maximum(t_norm * a_norm, 1e-12), -1.0, 1.0)
    )
    beta_plus = beta + px_error_angle
    gamma = jnp.pi - alpha - beta_plus
    gamma = jnp.where(jnp.abs(jnp.sin(gamma)) < 1e-9, 1e-9, gamma)
    depth_plus = t_norm * jnp.sin(beta_plus) / jnp.sin(gamma)
    return depth_plus - depth


def vogiatzis_update(
    mu: jax.Array, var: jax.Array, a: jax.Array, b: jax.Array,
    x: jax.Array, tau2: jax.Array, max_inv_depth: jax.Array,
):
    """Closed-form Gaussian×Beta posterior update
    (``DepthEstimator::updateFilter``, src/depth_estimator.cpp:311-340).

    All inverse-depth units. Returns (mu', var', a', b').
    """
    norm_scale = jnp.sqrt(var + tau2)
    norm_scale = jnp.maximum(norm_scale, 1e-12)
    s2 = 1.0 / (1.0 / jnp.maximum(var, 1e-18) + 1.0 / jnp.maximum(tau2, 1e-18))
    m = s2 * (mu / jnp.maximum(var, 1e-18) + x / jnp.maximum(tau2, 1e-18))
    C1 = a / (a + b) * gaussian_pdf(mu, norm_scale, x)
    C2 = b / (a + b) * (1.0 / jnp.maximum(max_inv_depth, 1e-12))
    norm_const = jnp.maximum(C1 + C2, 1e-300 if mu.dtype == jnp.float64 else 1e-30)
    C1 = C1 / norm_const
    C2 = C2 / norm_const
    f = C1 * (a + 1.0) / (a + b + 1.0) + C2 * a / (a + b + 1.0)
    e = C1 * (a + 1.0) * (a + 2.0) / ((a + b + 1.0) * (a + b + 2.0)) + C2 * a * (a + 1.0) / (
        (a + b + 1.0) * (a + b + 2.0)
    )
    mu_new = C1 * m + C2 * mu
    var_new = C1 * (s2 + m * m) + C2 * (var + mu * mu) - mu_new * mu_new
    denom = jnp.where(jnp.abs(f - e / jnp.maximum(f, 1e-12)) < 1e-12, 1e-12, f - e / jnp.maximum(f, 1e-12))
    a_new = (e - f) / denom
    b_new = a_new * (1.0 - f) / jnp.maximum(f, 1e-12)
    return mu_new, jnp.maximum(var_new, 1e-18), a_new, b_new


def update_filters(
    bank: FilterBank,
    T_cur_kf: SE3,  # (F,) per-filter relative pose host-kf → current frame
    cur_image: jax.Array,
    fx, fy, cx, cy,
    kf_counter: jax.Array,  # scalar int: current keyframe count
    patch_size: int = 7,
    num_steps: int = 16,
    staleness: int = 5,
    convergence_factor: float = 10.0,
) -> Tuple[FilterBank, jax.Array]:
    """One batched filter-bank update against the current frame.

    Mirrors ``DepthEstimator::updateFilters`` (src/depth_estimator.cpp:192-309):
    staleness drop, visibility gate, epipolar ZSSD match within the ±σ
    inverse-depth band, tau + Bayesian fusion, convergence flagging.

    Returns (bank', converged (F,) bool) — converged filters are flagged for
    promotion to map candidates by the caller and invalidated in the bank.
    """
    dtype = bank.mu.dtype
    # staleness: born more than `staleness` keyframes ago → drop (:220-226)
    fresh = (kf_counter - bank.born_kf) <= staleness
    valid = bank.valid & fresh

    sigma = jnp.sqrt(bank.var)
    inv_min = bank.mu + sigma  # near bound (inverse depth)
    inv_max = jnp.maximum(bank.mu - sigma, 1e-7)  # far bound

    depth, matched, best_uv = epipolar_search(
        T_cur_kf, cur_image, bank.ref_patch, bank.bearing_ref,
        bank.mu, inv_min, inv_max, valid, fx, fy, cx, cy,
        patch_size=patch_size, num_steps=num_steps,
    )

    px_error_angle = jnp.arctan(1.0 / (2.0 * fx)) * 2.0  # (:201-205)
    tau = compute_tau(T_cur_kf, bank.bearing_ref, depth, px_error_angle)
    d_minus = jnp.maximum(depth - tau, 1e-7)
    inv_tau = 0.5 * (1.0 / d_minus - 1.0 / (depth + tau))
    x = 1.0 / jnp.maximum(depth, 1e-9)

    mu_n, var_n, a_n, b_n = vogiatzis_update(
        bank.mu, bank.var, bank.a, bank.b, x, inv_tau * inv_tau, bank.max_inv_depth
    )
    upd = valid & matched
    mu_out = jnp.where(upd, mu_n, bank.mu)
    var_out = jnp.where(upd, var_n, bank.var)
    a_out = jnp.where(upd, a_n, bank.a)
    # no-match → outlier evidence b+1 (:253-256)
    b_out = jnp.where(upd, b_n, jnp.where(valid & ~matched, bank.b + 1.0, bank.b))

    converged = upd & (jnp.sqrt(var_out) * convergence_factor < bank.max_inv_depth)
    finite = jnp.isfinite(mu_out) & jnp.isfinite(var_out)
    valid_out = valid & finite & ~converged

    bank_out = bank._replace(
        mu=mu_out.astype(dtype),
        var=var_out.astype(dtype),
        a=a_out.astype(dtype),
        b=b_out.astype(dtype),
        valid=valid_out,
    )
    return bank_out, converged

"""M-estimator weight-function zoo, vectorized over masked residual arrays.

Re-implements the reference's ``Estimator`` (src/estimator.cpp, 15 robust
weight functions with MAD-based sigma, :107-119) plus the Barron general robust
loss (:313-333). Each function maps residuals (N,) + valid mask (N,) → IRLS
weights (N,), entirely on device; masked entries get weight 0.

The tuning constants (1.345σ Huber, 4.6851σ Tukey, …) match the reference,
which takes them from "Parameter Estimation Techniques: A Tutorial with
Application to Conic Fitting" (Zhang).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from sdvo_tpu.geometry.robust import masked_median

_EPS = 1e-12


def compute_std(residuals: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """Robust sigma: 1.4826 * (1 + 5/(n-6)) * median(|r|)
    (``Estimator::computeSTD``, src/estimator.cpp:107-119)."""
    if mask is None:
        mask = jnp.ones_like(residuals, dtype=bool)
    med = masked_median(jnp.abs(residuals), mask)
    n = jnp.sum(mask.astype(residuals.dtype))
    n = jnp.clip(n, 7.0, None)  # guard the reference's n-6 pole
    return 1.4826 * (1.0 + 5.0 / (n - 6.0)) * med


def _sigma_floor(sigma: jax.Array) -> jax.Array:
    return jnp.maximum(sigma, _EPS)


def _l2(r, sigma):
    return jnp.ones_like(r)


def _l1(r, sigma):
    return 1.0 / jnp.maximum(jnp.abs(r), _EPS)


def _l1l2(r, sigma):  # "diff" in the reference registry
    return 1.0 / jnp.sqrt(1.0 + r * r / 2.0)


def _lp(r, sigma, p: float = 1.2):
    return 1.0 / jnp.maximum(jnp.abs(r), _EPS) ** p


def _fair(r, sigma):
    c = 1.3998 * sigma
    return 1.0 / (1.0 + jnp.abs(r) / c)


def _huber(r, sigma):
    c = 1.345 * sigma
    a = jnp.abs(r)
    return jnp.where(a <= c, 1.0, c / jnp.maximum(a, _EPS))


def _cauchy(r, sigma):
    c = 2.3849 * sigma
    return 1.0 / (1.0 + (r * r) / (c * c))


def _geman_mcclure(r, sigma):
    return 1.0 / (1.0 + r * r) ** 2


def _welch(r, sigma):
    c = 2.9846 * sigma
    return jnp.exp(-(r * r) / (c * c))


def _tukey(r, sigma):
    c = 4.6851 * sigma
    a = jnp.abs(r)
    w = (1.0 - (r * r) / (c * c)) ** 2
    return jnp.where(a <= c, w, 0.0)


def _drummond(r, sigma):
    return 1.0 / jnp.maximum(jnp.abs(r + sigma), _EPS)


def _andrew_wave(r, sigma):
    c = 1.3387 * sigma
    a = jnp.abs(r)
    x = r / c
    x_safe = jnp.where(jnp.abs(x) < _EPS, 1.0, x)
    w = jnp.where(jnp.abs(x) < _EPS, 1.0, jnp.sin(x_safe) / x_safe)
    return jnp.where(a <= c * jnp.pi, w, 0.0)


def _ramsay(r, sigma):
    return jnp.exp(-(r * sigma))


def _trimmed_mean(r, sigma):
    return jnp.where(jnp.abs(r) <= sigma, 1.0, 0.0)


def _t_distribution(r, sigma):
    return 6.0 / (5.0 + (r * r) / (sigma * sigma))


MESTIMATORS: Dict[str, Callable] = {
    # same registry keys as the reference's ``allMethods`` (src/estimator.cpp:8-23)
    "l2": _l2,
    "l1": _l1,
    "diff": _l1l2,
    "lp": _lp,
    "fair": _fair,
    "huber": _huber,
    "cauchy": _cauchy,
    "geman-mcclure": _geman_mcclure,
    "welch": _welch,
    "tukey": _tukey,
    "drummond": _drummond,
    "andrew-wave": _andrew_wave,
    "ramsay": _ramsay,
    "trimmed-mean": _trimmed_mean,
    "t-distro": _t_distribution,
}


def mestimator_weights(
    residuals: jax.Array, method: str = "tukey", mask: Optional[jax.Array] = None
) -> jax.Array:
    """Dispatch table entry point (``Estimator::MEstimator``)."""
    if method not in MESTIMATORS:
        raise KeyError(f"unknown M-estimator '{method}'; known: {sorted(MESTIMATORS)}")
    if mask is None:
        mask = jnp.ones_like(residuals, dtype=bool)
    sigma = _sigma_floor(compute_std(residuals, mask))
    w = MESTIMATORS[method](residuals, sigma)
    return jnp.where(mask, w, 0.0)


def barron_weights(residuals: jax.Array, alpha: float, mask: Optional[jax.Array] = None) -> jax.Array:
    """Barron's general robust loss IRLS weights
    (``Estimator::computeGeneralFunctionBarron``, src/estimator.cpp:313-333)."""
    if mask is None:
        mask = jnp.ones_like(residuals, dtype=bool)
    c = _sigma_floor(compute_std(residuals, mask))
    r2c2 = residuals * residuals / (c * c)
    if alpha == 0.0:
        w = 2.0 / (residuals * residuals + 2.0 * c * c)
    elif alpha == -jnp.inf:
        w = (1.0 / (c * c)) * jnp.exp(-0.5 * r2c2)
    else:
        z = max(1.0, 2.0 - alpha)
        w = (1.0 / (c * c)) * (r2c2 / z + 1.0) ** (alpha / 2.0 - 1.0)
    return jnp.where(mask, w, 0.0)

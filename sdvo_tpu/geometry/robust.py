"""Robust statistics on (masked) device arrays.

Replaces the reference's ``algorithm::computeMedian / computeMAD /
computeSigma`` (src/algorithm.cpp:813-872), which use ``std::nth_element`` on
host vectors. Here everything is fixed-shape: invalid (masked) entries are
pushed to +inf and the order statistic is indexed by the *valid count*, so the
same jitted program serves any number of live features.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# sigma = 1.4826 * MAD — consistent estimator for Gaussian noise
# (src/optimizer.cpp:487, src/estimator.cpp:107-119).
MAD_SCALE = 1.4826


def masked_median(x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """Median of valid entries of a 1-D array (lower median for even counts,
    matching ``nth_element`` at n/2 in the reference)."""
    x = x.reshape(-1)
    if mask is None:
        n = x.shape[0]
        s = jnp.sort(x)
        return s[(n - 1) // 2] if n % 2 == 1 else s[n // 2]
    mask = mask.reshape(-1)
    big = jnp.asarray(jnp.inf, x.dtype)
    s = jnp.sort(jnp.where(mask, x, big))
    count = jnp.sum(mask.astype(jnp.int32))
    idx = jnp.maximum(count // 2, 0)
    # count==0 -> returns +inf; callers gate on count.
    return s[jnp.minimum(idx, x.shape[0] - 1)]


def masked_mad(x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """Median absolute deviation (src/algorithm.cpp:846-858)."""
    med = masked_median(x, mask)
    return masked_median(jnp.abs(x - med), mask)


def masked_sigma(x: jax.Array, mask: Optional[jax.Array] = None, k: float = MAD_SCALE) -> jax.Array:
    """sigma = k * MAD (src/algorithm.cpp:860-872)."""
    return k * masked_mad(x, mask)


def gaussian_pdf(mean: jax.Array, sigma: jax.Array, x: jax.Array) -> jax.Array:
    """Normal density (src/algorithm.cpp:907-911)."""
    z = (x - mean) / sigma
    inv = 1.0 / (sigma * jnp.sqrt(jnp.asarray(2.0 * jnp.pi, x.dtype)))
    return inv * jnp.exp(-0.5 * z * z)

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


def _hist_median(x: jax.Array, mask: jax.Array, lo: jax.Array, hi: jax.Array, bins: int) -> jax.Array:
    """Approximate masked median via a histogram CDF with in-bin linear
    interpolation. One O(N·bins) reduction (MXU/VPU friendly) instead of a
    device sort — the sort is the single most expensive op inside the LM
    while_loop on TPU, so the hot paths use this.

    Max error ≈ bin_width, and in practice far less with the interpolation;
    Tukey weights (c = 4.685σ) are insensitive at that scale.
    """
    dtype = x.dtype
    width = jnp.maximum(hi - lo, jnp.asarray(1e-12, dtype))
    binw = width / bins
    b = jnp.clip(((x - lo) / binw).astype(jnp.int32), 0, bins - 1)
    onehot = (b[:, None] == jnp.arange(bins)[None, :]).astype(dtype)
    counts = jnp.sum(onehot * mask.astype(dtype)[:, None], axis=0)  # (bins,)
    total = jnp.sum(counts)
    cdf = jnp.cumsum(counts)
    target = 0.5 * total
    k = jnp.argmax(cdf >= target)  # first bin whose cdf reaches the median
    ck = cdf[k]
    nk = jnp.maximum(counts[k], 1.0)
    frac = (target - (ck - counts[k])) / nk
    return lo + (k.astype(dtype) + frac) * binw


def masked_mad_hist(x: jax.Array, mask: Optional[jax.Array] = None, bins: int = 256) -> jax.Array:
    """Histogram-approximate MAD — drop-in for :func:`masked_mad` on large
    arrays in jitted hot loops. Two histogram passes (median, then median of
    absolute deviations) over the dynamic range of the valid entries."""
    x = x.reshape(-1)
    if mask is None:
        mask = jnp.ones(x.shape, bool)
    else:
        mask = mask.reshape(-1)
    xz = jnp.where(mask, x, 0.0)
    lo = jnp.min(jnp.where(mask, x, jnp.inf))
    hi = jnp.max(jnp.where(mask, x, -jnp.inf))
    empty = ~jnp.any(mask)
    lo = jnp.where(empty, 0.0, lo)
    hi = jnp.where(empty, 1.0, hi)
    med = _hist_median(xz, mask, lo, hi, bins)
    dev = jnp.abs(xz - med)
    hi2 = jnp.max(jnp.where(mask, dev, -jnp.inf))
    hi2 = jnp.where(empty, 1.0, hi2)
    mad = _hist_median(dev, mask, jnp.asarray(0.0, x.dtype), hi2, bins)
    return jnp.where(empty, jnp.asarray(jnp.inf, x.dtype), mad)


def gaussian_pdf(mean: jax.Array, sigma: jax.Array, x: jax.Array) -> jax.Array:
    """Normal density (src/algorithm.cpp:907-911)."""
    z = (x - mean) / sigma
    inv = 1.0 / (sigma * jnp.sqrt(jnp.asarray(2.0 * jnp.pi, x.dtype)))
    return inv * jnp.exp(-0.5 * z * z)

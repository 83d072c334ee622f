"""Batched bilinear image sampling and patch extraction.

Replaces the reference's scalar ``algorithm::bilinearInterpolation{,Double}``
(src/algorithm.cpp:874-905), called per patch pixel inside per-feature loops
(src/image_alignment.cpp:171-189, :310-370). Here a single gather samples all
N×P² patch pixels at once — the shape the TPU wants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(image: jax.Array, uv: jax.Array, *, clamp: bool = True):
    """Sample ``image`` (H, W) at subpixel locations ``uv`` (..., 2) = (x, y).

    Returns (values, valid) where ``valid`` marks samples whose 2×2 support is
    fully inside the image (the reference requires the whole patch + 2px border
    inside, src/image_alignment.cpp:141-151; we expose the mask and let callers
    build their own visibility).
    """
    H, W = image.shape
    x = uv[..., 0]
    y = uv[..., 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f).astype(image.dtype)
    wy = (y - y0f).astype(image.dtype)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    valid = (x0 >= 0) & (y0 >= 0) & (x0 + 1 <= W - 1) & (y0 + 1 <= H - 1)
    if clamp:
        x0c = jnp.clip(x0, 0, W - 2)
        y0c = jnp.clip(y0, 0, H - 2)
    else:
        x0c, y0c = x0, y0
    # ONE fused gather for all four corners (4 separate advanced-indexing
    # gathers each pay kernel-launch overhead on TPU — the per-frame step
    # issues dozens of these, so fusing them is a 2-3× win on small batches).
    base = y0c * W + x0c  # (...,)
    flat = image.reshape(-1)
    idx4 = jnp.stack([base, base + 1, base + W, base + W + 1], axis=-1)  # (..., 4)
    v = jnp.take(flat, idx4, axis=0)  # (..., 4)
    w00 = (1.0 - wx) * (1.0 - wy)
    w01 = wx * (1.0 - wy)
    w10 = (1.0 - wx) * wy
    w11 = wx * wy
    out = v[..., 0] * w00 + v[..., 1] * w01 + v[..., 2] * w10 + v[..., 3] * w11
    return out, valid


def patch_offsets(patch_size: int, dtype=jnp.float32) -> jax.Array:
    """(P², 2) integer offsets centered on the patch: for P=5 → [-2..2]²,
    matching the reference's halfPatch loops (src/image_alignment.cpp:154-170).
    Row-major (dy outer, dx inner), offsets as (dx, dy)."""
    half = patch_size // 2
    r = jnp.arange(-half, patch_size - half, dtype=dtype)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([dx.ravel(), dy.ravel()], axis=-1)


def padded_patch_and_gradients(sample_fn, centers: jax.Array, patch_size: int):
    """Sample ONE (P+2)² bilinear patch per feature and derive the P² patch
    plus its central-difference gradients from it.

    ``0.5·(I(x+1) − I(x-1))`` of a bilinearly-interpolated image equals the
    central difference of the bilinear samples on the shifted grid — so one
    padded fetch replaces five separate sample passes (patch, ±x, ±y), cutting
    gathered volume ~3.5× in the alignment precompute.

    Args:
      sample_fn: uv (N, K², 2) -> (values (N, K²), ok) — e.g. a closure over
        bilinear_sample(image, ·) or the multi-host variant.
      centers: (N, 2).
    Returns (patch (N, P²), gx (N, P²), gy (N, P²), ok (N,)).
    """
    P = patch_size
    K = P + 2
    offs = patch_offsets(K, dtype=centers.dtype)  # (K², 2), spans ±(half+1)
    uv = centers[:, None, :] + offs[None, :, :]
    vals, ok = sample_fn(uv)
    big = vals.reshape(vals.shape[0], K, K)
    patch = big[:, 1:-1, 1:-1]
    gx = 0.5 * (big[:, 1:-1, 2:] - big[:, 1:-1, :-2])
    gy = 0.5 * (big[:, 2:, 1:-1] - big[:, :-2, 1:-1])
    N = vals.shape[0]
    return (
        patch.reshape(N, -1),
        gx.reshape(N, -1),
        gy.reshape(N, -1),
        jnp.all(ok, axis=-1),
    )


def extract_patches(image: jax.Array, centers: jax.Array, patch_size: int):
    """Extract N bilinear patches of ``patch_size``² around subpixel centers.

    Args:
      image: (H, W).
      centers: (N, 2) as (x, y).
    Returns:
      patches: (N, P²) intensities.
      valid: (N,) — True iff every pixel of the patch interpolates inside.
    """
    offs = patch_offsets(patch_size, dtype=centers.dtype)  # (P², 2)
    uv = centers[:, None, :] + offs[None, :, :]  # (N, P², 2)
    vals, ok = bilinear_sample(image, uv)
    return vals, jnp.all(ok, axis=-1)

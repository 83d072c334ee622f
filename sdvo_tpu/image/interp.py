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
    i00 = image[y0c, x0c]
    i01 = image[y0c, x0c + 1]
    i10 = image[y0c + 1, x0c]
    i11 = image[y0c + 1, x0c + 1]
    top = i00 * (1.0 - wx) + i01 * wx
    bot = i10 * (1.0 - wx) + i11 * wx
    return top * (1.0 - wy) + bot * wy, valid


def patch_offsets(patch_size: int, dtype=jnp.float32) -> jax.Array:
    """(P², 2) integer offsets centered on the patch: for P=5 → [-2..2]²,
    matching the reference's halfPatch loops (src/image_alignment.cpp:154-170).
    Row-major (dy outer, dx inner), offsets as (dx, dy)."""
    half = patch_size // 2
    r = jnp.arange(-half, patch_size - half, dtype=dtype)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([dx.ravel(), dy.ravel()], axis=-1)


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

"""Shifted patch stacks: gather-free patch sampling for TPU.

The framework's hot loops fetch thousands of small patches at sub-pixel
positions per frame (alignment residuals: src/image_alignment.cpp:310-370;
feature alignment: src/feature_alignment.cpp:99-155; epipolar search:
src/algorithm.cpp:412-551). A naive batched bilinear fetch gathers 4 scattered
corner elements per pixel — and XLA:TPU executes scattered element gathers at
~30 ns/element, which made sampling >80% of the per-frame device time.

The fix exploits that every sampler uses INTEGER patch offsets around a
sub-pixel center, so all P² pixels of a patch share one fractional offset:

1. ``build_patch_stack`` materializes ``stack[(y*W + x), k] = image[y+dy_k,
   x+dx_k]`` — P² shifted copies of the image (pads + slices, pure bandwidth,
   no gather). ~P²·H·W·4 bytes, built once per image per frame.
2. A bilinear patch fetch is then 4 gathers of CONTIGUOUS P²-element rows at
   flat indices {b, b+1, b+W, b+W+1} blended with one (wx, wy) pair — and
   row gathers move whole cache lines, running ~2 orders of magnitude faster
   than element gathers.
3. Patch gradients are central differences of bilinear samples, i.e. blends
   at b±1 and b±W — more row gathers from the SAME stack (no padded refetch).

Results are bit-identical to the element-gather formulation.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PatchStack(NamedTuple):
    """Pytree: shifted-copy stack of one image (or a multi-image batch).

    data: (H·W, P²) — or (K, H·W, P²) for K host images.
    width/height: scalar int32 (traced-safe).
    """

    data: jax.Array
    width: jax.Array
    height: jax.Array

    @property
    def patch_size(self) -> int:
        p2 = self.data.shape[-1]
        p = int(round(p2 ** 0.5))
        assert p * p == p2
        return p


def build_patch_stack(image: jax.Array, patch_size: int) -> PatchStack:
    """(H, W) image → stack of all P×P patches by top-left corner.

    Rows whose patch crosses the right/bottom edge contain zeros there;
    callers mask by border validity (they already do — the reference requires
    the whole patch + border inside, src/image_alignment.cpp:141-151).
    """
    H, W = image.shape
    P = int(patch_size)
    padded = jnp.pad(image, ((0, P), (0, P)))
    shifts = [
        padded[dy : dy + H, dx : dx + W] for dy in range(P) for dx in range(P)
    ]
    data = jnp.stack(shifts, axis=-1).reshape(H * W, P * P)
    return PatchStack(data, jnp.int32(W), jnp.int32(H))


def build_patch_stack_multi(images: jax.Array, patch_size: int) -> PatchStack:
    """(K, H, W) stacked host images → (K, H·W, P²) stack."""
    H, W = images.shape[-2:]
    ps = jax.vmap(lambda im: build_patch_stack(im, patch_size).data)(images)
    return PatchStack(ps, jnp.int32(W), jnp.int32(H))


def _base_and_weights(ps: PatchStack, centers: jax.Array):
    """Flat top-left index + bilinear weights for patch CENTERS (N, 2)."""
    P = ps.patch_size
    half = P // 2
    W = ps.width
    H = ps.height
    x0f = jnp.floor(centers[..., 0])
    y0f = jnp.floor(centers[..., 1])
    wx = (centers[..., 0] - x0f).astype(ps.data.dtype)
    wy = (centers[..., 1] - y0f).astype(ps.data.dtype)
    x0 = x0f.astype(jnp.int32) - half
    y0 = y0f.astype(jnp.int32) - half
    base = y0 * W + x0
    return base, wx, wy, x0, y0


def _take_rows(data: jax.Array, idx: jax.Array) -> jax.Array:
    # mode="clip" avoids jnp.take's default out-of-bounds fill select
    return jnp.take(data, idx, axis=-2, mode="clip")


def _blend(data: jax.Array, base: jax.Array, W, wx: jax.Array, wy: jax.Array) -> jax.Array:
    """Bilinear blend of 4 neighboring stack rows. base: (N,), out (N, P²)."""
    v00 = _take_rows(data, base)
    v01 = _take_rows(data, base + 1)
    v10 = _take_rows(data, base + W)
    v11 = _take_rows(data, base + W + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        (1.0 - wy) * ((1.0 - wx) * v00 + wx * v01)
        + wy * ((1.0 - wx) * v10 + wx * v11)
    )


def _inside(ps: PatchStack, x0: jax.Array, y0: jax.Array, margin: int) -> jax.Array:
    """Patch (+``margin`` px of bilinear/gradient support) fully inside."""
    P = ps.patch_size
    return (
        (x0 - margin >= 0)
        & (y0 - margin >= 0)
        & (x0 + P + margin <= ps.width)
        & (y0 + P + margin <= ps.height)
    )


def sample_patches(ps: PatchStack, centers: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Bilinear P×P patches at sub-pixel centers.

    centers: (..., 2) as (x, y). Returns (vals (..., P²), ok (...,)).
    Drop-in for ``interp.extract_patches`` at ~100× the gather speed.
    """
    shape = centers.shape[:-1]
    centers2 = centers.reshape(-1, 2)
    base, wx, wy, x0, y0 = _base_and_weights(ps, centers2)
    vals = _blend(ps.data, base, ps.width, wx, wy)
    ok = _inside(ps, x0, y0, 1)
    P2 = ps.data.shape[-1]
    return vals.reshape(*shape, P2), ok.reshape(shape)


def sample_patches_grad(ps: PatchStack, centers: jax.Array):
    """Patches + central-difference gradients at sub-pixel centers.

    Returns (patch, gx, gy, ok), each (..., P²) / (...,). Identical math to
    ``interp.padded_patch_and_gradients`` (gradient of a bilinear image =
    central difference of bilinear samples on shifted grids).
    """
    shape = centers.shape[:-1]
    centers2 = centers.reshape(-1, 2)
    base, wx, wy, x0, y0 = _base_and_weights(ps, centers2)
    W = ps.width
    patch = _blend(ps.data, base, W, wx, wy)
    gx = 0.5 * (_blend(ps.data, base + 1, W, wx, wy) - _blend(ps.data, base - 1, W, wx, wy))
    gy = 0.5 * (_blend(ps.data, base + W, W, wx, wy) - _blend(ps.data, base - W, W, wx, wy))
    ok = _inside(ps, x0, y0, 2)
    P2 = ps.data.shape[-1]
    return (
        patch.reshape(*shape, P2),
        gx.reshape(*shape, P2),
        gy.reshape(*shape, P2),
        ok.reshape(shape),
    )


def sample_patches_multi(
    ps: PatchStack, host_idx: jax.Array, centers: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Like :func:`sample_patches` but per-feature host selection from a
    (K, H·W, P²) multi-image stack (the align path samples from the ref frame
    AND its last keyframe, src/image_alignment.cpp:30-41).

    The K images are addressed as ONE flat (K·H·W, P²) row space: feature i's
    rows live at ``host_idx[i]·H·W + base`` — a single set of 4 row gathers
    regardless of K, instead of sampling every image and masking (which costs
    K× the gather traffic).
    """
    K, HW, P2 = ps.data.shape
    flat = ps.data.reshape(K * HW, P2)
    base, wx, wy, x0, y0 = _base_and_weights(ps, centers)
    base = base + host_idx.astype(jnp.int32) * HW
    vals = _blend(flat, base, ps.width, wx, wy)
    ok = _inside(ps, x0, y0, 1)
    return vals, ok


def sample_patches_grad_multi(ps: PatchStack, host_idx: jax.Array, centers: jax.Array):
    """Multi-host variant of :func:`sample_patches_grad` via the same flat
    (K·H·W, P²) row addressing as :func:`sample_patches_multi`."""
    K, HW, P2 = ps.data.shape
    flat = ps.data.reshape(K * HW, P2)
    base, wx, wy, x0, y0 = _base_and_weights(ps, centers)
    base = base + host_idx.astype(jnp.int32) * HW
    W = ps.width
    patch = _blend(flat, base, W, wx, wy)
    gx = 0.5 * (_blend(flat, base + 1, W, wx, wy) - _blend(flat, base - 1, W, wx, wy))
    gy = 0.5 * (_blend(flat, base + W, W, wx, wy) - _blend(flat, base - W, W, wx, wy))
    ok = _inside(ps, x0, y0, 2)
    return patch, gx, gy, ok

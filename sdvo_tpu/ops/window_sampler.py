"""Per-feature window extraction + gather-free separable patch sampling.

The alignment hot loops resample small patches at sub-pixel positions that
move a few pixels at most during one optimization (the LM basin). Instead of
building P²-shifted copies of the whole image per frame (sdvo_tpu.image.stack
— ~50-90 MB of HBM traffic at KITTI level 0) or issuing per-iteration
gathers, each feature gets ONE small window (e.g. 16×16) extracted around its
predicted position; every LM iteration then samples its patch from the window
with *separable linear-interpolation weight matrices*:

    patch[n, py, px] = Σ_h Σ_w  tri(yo[n]+py−h) · tri(xo[n]+px−w) · win[n,h,w]

with tri(d) = max(0, 1−|d|) — this is EXACTLY bilinear interpolation, written
as two tiny batched contractions (`einsum`) over the window axes. No gather,
no scatter: pure elementwise weight construction + reductions, which XLA fuses
and the VPU/MXU execute at full rate, and which ports directly into a Pallas
kernel (the whole LM level loop becomes one kernel, windows resident in VMEM).

Gradients come for free: the derivative of a bilinear sample is the central
difference of samples at ±1, i.e. the same contraction with shifted weights.

Reference scope: this replaces the 5-interpolation patch loops of
src/image_alignment.cpp:171-189 and the per-candidate resampling of
src/feature_alignment.cpp:64-110 with batched tensor programs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def extract_windows(image: jax.Array, origins: jax.Array, win: int) -> jax.Array:
    """Gather (N, win, win) windows at integer ``origins`` (N, 2) as (x, y).

    Origins are clamped to the image interior (XLA dynamic_slice semantics);
    callers mask features whose window would cross the border.
    """
    H, W = image.shape

    def one(o):
        return jax.lax.dynamic_slice(image, (o[1], o[0]), (win, win))

    return jax.vmap(one)(jnp.clip(origins, 0, jnp.asarray([W - win, H - win])))


def window_origins(uv: jax.Array, win: int, width, height) -> Tuple[jax.Array, jax.Array]:
    """Integer window origins centered on uv; ok = window fully inside."""
    half = win // 2
    ox = jnp.floor(uv[..., 0]).astype(jnp.int32) - half
    oy = jnp.floor(uv[..., 1]).astype(jnp.int32) - half
    ok = (ox >= 0) & (oy >= 0) & (ox + win <= width) & (oy + win <= height)
    return jnp.stack([ox, oy], axis=-1), ok


def window_gather(
    image: jax.Array,  # (H, W)
    uv: jax.Array,  # (N, 2) sub-pixel centers
    win_h: int = 16,
    block: int = 16,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Block-aligned window extraction via contiguous row gathers.

    A vmapped ``dynamic_slice`` lowers to an element-granularity XLA gather
    (~30 ns/element on TPU — measured ~2.4 ms/frame for 512×16×16 windows).
    Aligning window columns to ``block``-float boundaries turns extraction
    into the row-gather pattern the shifted-stack sampler already proved fast:
    reshape the (width-padded) image into (H·W/block, block) rows and ``take``
    two adjacent blocks per window row — every fetched row is a contiguous
    64-byte line.

    Returns (windows (N, win_h, 2·block), origin (N, 2) float — the window's
    (x, y) pixel origin, ok (N,) — uv's patch support inside the image).
    The horizontal center sits in [block/2, 3·block/2) of the window, so the
    usable motion slack is ±(block/2 − patch support).
    """
    H, W = image.shape
    nb = -(-W // block)  # ceil
    Wp = nb * block
    img_p = jnp.pad(image, ((0, 0), (0, Wp - W))) if Wp != W else image
    rows2d = img_p.reshape(H * nb, block)
    # overlapping 2-block layout: row i = blocks (i, i+1) side by side, so a
    # window row is ONE fetched row instead of two — the gather is
    # row-count-bound (~12 ns/row measured), and this halves the row count
    # for every caller (the depth-filter sweep alone fetches ~200k rows per
    # frame); building the layout is two cheap contiguous copies
    pad_row = jnp.zeros((1, block), img_p.dtype)
    r2 = jnp.concatenate([rows2d, pad_row])
    overlap = jnp.concatenate([r2[:-1], r2[1:]], axis=1)  # (H·nb, 2·block)

    half = win_h // 2
    oy = jnp.clip(jnp.floor(uv[..., 1]).astype(jnp.int32) - half, 0, H - win_h)
    bx = jnp.clip(
        (jnp.floor(uv[..., 0]).astype(jnp.int32) - block // 2) // block, 0, nb - 2
    )
    h = jnp.arange(win_h, dtype=jnp.int32)
    row_idx = (oy[:, None] + h[None, :]) * nb + bx[:, None]  # (N, win_h)
    rows = jnp.take(overlap, row_idx.reshape(-1), axis=0, mode="clip")
    windows = rows.reshape(uv.shape[0], win_h, 2 * block)
    origin = jnp.stack([(bx * block).astype(uv.dtype), oy.astype(uv.dtype)], axis=-1)
    ok = (
        (uv[..., 0] >= block // 2) & (uv[..., 0] < W - block // 2)
        & (uv[..., 1] >= half) & (uv[..., 1] < H - half)
    )
    return windows, origin, ok


def _tri_weights(center: jax.Array, patch: int, win: int, dtype) -> jax.Array:
    """(N, patch, win) linear-interp weights: w[n,p,h] = tri(center[n]+p−h)."""
    p = jnp.arange(patch, dtype=dtype)[None, :, None]
    h = jnp.arange(win, dtype=dtype)[None, None, :]
    d = center[:, None, None] + p - h
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _contract_h(V: jax.Array, windows: jax.Array) -> jax.Array:
    """(N,P,WH)×(N,WH,WW) → (N,P,WW), contracting the window-row axis.

    Written as broadcast-multiply + reduce, NOT einsum/dot: a batched (P×WH)
    @ (WH×WW) einsum lowers to N separate padded MXU matmuls (tile 128), which
    at N≈512 batches of 5×16 operands costs milliseconds; the reduce fusion
    runs on the VPU at full rate."""
    return jnp.sum(V[:, :, :, None] * windows[:, None, :, :], axis=2)


def _contract_w(tmp: jax.Array, V: jax.Array) -> jax.Array:
    """(N,P,WW)×(N,Q,WW) → (N,P,Q), contracting the window-column axis."""
    return jnp.sum(tmp[:, :, None, :] * V[:, None, :, :], axis=3)


def sample_windows(
    windows: jax.Array,  # (N, WH, WW)
    offs: jax.Array,  # (N, 2) patch CENTER in window coords (x, y), sub-pixel
    patch: int,
) -> Tuple[jax.Array, jax.Array]:
    """Bilinear P×P patches from per-feature windows. Returns (vals (N, P²),
    ok (N,)) — ok means the patch (+1 px bilinear support) is inside."""
    N, WH, WW = windows.shape
    dtype = windows.dtype
    half = patch // 2
    y0 = offs[..., 1] - half
    x0 = offs[..., 0] - half
    Vy = _tri_weights(y0, patch, WH, dtype)  # (N, P, WH)
    Vx = _tri_weights(x0, patch, WW, dtype)  # (N, P, WW)
    tmp = _contract_h(Vy, windows)
    out = _contract_w(tmp, Vx)
    ok = (x0 >= 1) & (y0 >= 1) & (x0 + patch <= WW - 1) & (y0 + patch <= WH - 1)
    return out.reshape(N, patch * patch), ok


def sample_windows_grad(
    windows: jax.Array, offs: jax.Array, patch: int
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Patches + central-difference gradients from windows.

    Returns (patch (N,P²), gx, gy, ok). Identical math to
    image.stack.sample_patches_grad (gradient of bilinear = central difference
    of bilinear at ±1)."""
    N, WH, WW = windows.shape
    dtype = windows.dtype
    half = patch // 2
    y0 = offs[..., 1] - half
    x0 = offs[..., 0] - half
    Vy = _tri_weights(y0, patch, WH, dtype)
    Vx = _tri_weights(x0, patch, WW, dtype)
    Vy_p = _tri_weights(y0 + 1.0, patch, WH, dtype)
    Vy_m = _tri_weights(y0 - 1.0, patch, WH, dtype)
    Vx_p = _tri_weights(x0 + 1.0, patch, WW, dtype)
    Vx_m = _tri_weights(x0 - 1.0, patch, WW, dtype)
    tmp = _contract_h(Vy, windows)
    val = _contract_w(tmp, Vx)
    gx = 0.5 * _contract_w(tmp, Vx_p - Vx_m)
    tmp_y = _contract_h(Vy_p - Vy_m, windows)
    gy = 0.5 * _contract_w(tmp_y, Vx)
    ok = (x0 >= 2) & (y0 >= 2) & (x0 + patch <= WW - 2) & (y0 + patch <= WH - 2)
    P2 = patch * patch
    return val.reshape(N, P2), gx.reshape(N, P2), gy.reshape(N, P2), ok

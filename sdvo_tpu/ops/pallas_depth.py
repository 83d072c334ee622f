"""Pallas fused kernel for the depth-filter epipolar scoring sweep.

Each frame scores 512 filters × 16 epipolar step positions: sample a 7×7
patch from each position's window and ZSSD it against the filter's warped
reference patch (``depth.epipolar.epipolar_search``). The XLA form issues
~15 kernels over (8192, 49) intermediates; this kernel runs the whole
sample→center→ZSSD sweep in one gridded ``pallas_call`` (blocks of
row-windows pipelined through VMEM). Epipolar geometry, the affine reference
warp, argmin/triangulation and the Vogiatzis update stay in XLA — they are
a handful of cheap elementwise ops.

Mosaic-safety: the grouped-lane separable sampler shared with
``ops.pallas_lm`` (128-lane aligned, no gathers/reshapes in-kernel).

Reference scope: the scoring loop of ``algorithm::matchEpipolarConstraint``
(src/algorithm.cpp:412-551, ``computeScore`` :396-410).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdvo_tpu.ops.pallas_lm import _sample_rows


def _depth_score_kernel(
    win_ref,  # (B, WH·WW) flat windows, one row per (filter, step)
    cref_ref,  # (B, P2) zero-meaned warped reference patch (repeated per step)
    offs_ref,  # (B, 2) patch center in window coords
    out_ref,  # (B, 4): score, ok, 0, 0
    *, patch: int, win_h: int, win_w: int,
):
    win = win_ref[...].astype(jnp.float32)  # windows may arrive bf16 (the
    # HBM→VMEM DMA then moves half the bytes; scoring stays f32 in-kernel)
    cref = cref_ref[...]
    ox = offs_ref[:, 0:1]
    oy = offs_ref[:, 1:2]
    B, P2 = cref.shape
    vals, ok = _sample_rows(win, ox, oy, patch, win_h, win_w)
    mean_v = jnp.sum(vals, axis=1, keepdims=True) / float(P2)
    score = jnp.sum(jnp.abs((vals - mean_v) - cref), axis=1, keepdims=True)
    ci = jax.lax.broadcasted_iota(jnp.int32, (B, 4), 1)
    out = jnp.where(ci == 0, score, 0.0) \
        + jnp.where(ci == 1, ok.astype(jnp.float32), 0.0)
    out_ref[...] = out


@functools.partial(
    jax.jit, static_argnames=("patch", "win_h", "win_w", "block", "interpret")
)
def depth_scores(
    windows_flat: jax.Array,  # (N, WH·WW) per-(filter, step) flat windows
    cref_rep: jax.Array,  # (N, P2) zero-meaned ref patches, step-repeated
    offs: jax.Array,  # (N, 2)
    patch: int = 7,
    win_h: int = 12,
    win_w: int = 32,
    block: int = 512,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """ZSSD scores for every (filter, step) row. Returns (score (N,),
    sample-support ok (N,) bool)."""
    f32 = jnp.float32
    N = windows_flat.shape[0]
    blk = min(block, N)
    grid = (pl.cdiv(N, blk),)
    out = pl.pallas_call(
        functools.partial(
            _depth_score_kernel, patch=patch, win_h=win_h, win_w=win_w
        ),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((N, 4), f32),
        in_specs=[
            pl.BlockSpec((blk, win_h * win_w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, patch * patch), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        windows_flat if windows_flat.dtype == jnp.bfloat16
        else windows_flat.astype(f32),
        cref_rep.astype(f32), offs.astype(f32),
    )
    return out[:, 0], out[:, 1] > 0.5

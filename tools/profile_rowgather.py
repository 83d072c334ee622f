#!/usr/bin/env python
"""Micro-bench: row-gather from a precomputed shifted patch stack vs element
gather. If gathering (M,) rows of P² contiguous elements is fast, every patch
sampler in the framework switches to this layout."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from tools.profile_frame import device_time, scanned

H, W = 376, 1241


def build_stack(image, P):
    """(H·W, P²) where row (y·W+x) holds the P×P patch at top-left (y, x).
    Built with P² cheap shifted copies (pad + slice), no gather."""
    pads = []
    for dy in range(P):
        for dx in range(P):
            shifted = jnp.pad(image, ((0, P), (0, P)))[dy:dy + H, dx:dx + W]
            pads.append(shifted)
    return jnp.stack(pads, axis=-1).reshape(H * W, P * P)


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)

    # --- build cost ---------------------------------------------------------
    for P in (5, 7):
        device_time(scanned(lambda im, _P=P: build_stack(im, _P)), (img,),
                    name=f"build stack P={P} f32")

    stack7 = build_stack(img, 7)
    stack5 = build_stack(img, 5)

    # --- row gather: epipolar shape (8192 positions, 49 px) -----------------
    idx8k = jnp.asarray(rng.integers(0, H * W - W * 8, (8192,)), jnp.int32)

    def row_gather(stk, idx):
        return jnp.take(stk, idx, axis=0)

    device_time(scanned(row_gather), (stack7, idx8k), name="row gather 8192x49 f32")

    stack7_bf16 = stack7.astype(jnp.bfloat16)
    device_time(scanned(row_gather), (stack7_bf16, idx8k), name="row gather 8192x49 bf16")

    # --- alignment residual shape: 256 feats, 4 corners, 25 px --------------
    idx1k = jnp.asarray(rng.integers(0, H * W - W * 8, (1024,)), jnp.int32)
    device_time(scanned(row_gather), (stack5, idx1k), name="row gather 1024x25 f32")

    # --- dynamic-slice variant (base idx is fused scalar) --------------------
    def ds_gather(stk, idx):
        return jax.vmap(lambda i: jax.lax.dynamic_slice(stk, (i, 0), (1, 49)))(idx)

    device_time(scanned(ds_gather), (stack7, idx8k), name="vmapped dyn-slice 8192x49")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Micro-bench: element-gather bilinear sampling vs block dynamic-slice
sampling for patch extraction on TPU."""

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
N = 256
P = 5
K = P + 2  # padded patch


def main():
    from sdvo_tpu.image.interp import bilinear_sample, patch_offsets

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    uv = jnp.asarray(rng.uniform(30, [W - 30, H - 30], (N, 2)), jnp.float32)

    offs = patch_offsets(K, jnp.float32)

    def elem_gather(img_, uv_):
        pts = uv_[:, None, :] + offs[None, :, :]
        v, _ = bilinear_sample(img_, pts)
        return v

    def block_slice(img_, uv_):
        half = K // 2
        x0 = jnp.floor(uv_[:, 0]).astype(jnp.int32) - half
        y0 = jnp.floor(uv_[:, 1]).astype(jnp.int32) - half
        wx = (uv_[:, 0] - jnp.floor(uv_[:, 0]))[:, None, None]
        wy = (uv_[:, 1] - jnp.floor(uv_[:, 1]))[:, None, None]
        x0c = jnp.clip(x0, 0, W - (K + 1))
        y0c = jnp.clip(y0, 0, H - (K + 1))
        blocks = jax.vmap(
            lambda y, x: jax.lax.dynamic_slice(img_, (y, x), (K + 1, K + 1))
        )(y0c, x0c)  # (N, K+1, K+1)
        v = (
            (1 - wy) * (1 - wx) * blocks[:, :-1, :-1]
            + (1 - wy) * wx * blocks[:, :-1, 1:]
            + wy * (1 - wx) * blocks[:, 1:, :-1]
            + wy * wx * blocks[:, 1:, 1:]
        )
        return v.reshape(N, -1)

    # correctness check (CPU-consistent: same device)
    a = np.asarray(elem_gather(img, uv)).reshape(N, K, K)
    b = np.asarray(block_slice(img, uv)).reshape(N, K, K)
    print("max abs diff:", np.abs(a - b).max())

    device_time(scanned(elem_gather), (img, uv), name=f"element gather ({N}x{K}²)")
    device_time(scanned(block_slice), (img, uv), name=f"block dynamic-slice ({N}x{K+1}²)")

    # also: the epipolar-search-sized gather (512 x 16 x 49 elements)
    F, S = 512, 16
    uv2 = jnp.asarray(rng.uniform(30, [W - 30, H - 30], (F, S, 2)), jnp.float32)
    offs7 = patch_offsets(7, jnp.float32)

    def epi_gather(img_, uv_):
        pts = uv_[:, :, None, :] + offs7[None, None, :, :]
        v, _ = bilinear_sample(img_, pts)
        return v

    device_time(scanned(epi_gather), (img, uv2), name=f"epipolar gather ({F}x{S}x49)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark: per-frame VO tracking throughput on the available accelerator.

Measures the device-side per-frame step at KITTI geometry (1241×376, 4-level
pyramid, 256 alignment features, 150 reprojection matches, 512 depth filters):
  pyramid build → coarse-to-fine sparse alignment → batched feature alignment
  → depth-filter bank update.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference (amin-abouee/semi-direct-visual-odometry) publishes
no numbers and its C++/OpenCV/g2o stack cannot be built in this image; we use
40 fps as the baseline figure — the ballpark of single-thread CPU SVO-class
trackers (SVO paper reports ~55 fps on a laptop CPU for a lighter config; this
reference adds per-frame reprojection alignment so 40 is a fair estimate).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

REFERENCE_FPS = 40.0

H, W = 376, 1241
LEVELS = 4
N_FEATS = 256
N_MATCHES = 150
N_FILTERS = 512
DTYPE = jnp.float32


def build_inputs(rng):
    from sdvo_tpu.align.image_alignment import AlignFeatures
    from sdvo_tpu.geometry.se3 import SE3

    img = jnp.asarray(rng.uniform(0, 255, (H, W)), DTYPE)
    uv = jnp.asarray(rng.uniform(30, [W - 30, H - 30], (N_FEATS, 2)), DTYPE)
    fx = fy = 721.5377
    cx, cy = 609.5593, 172.854
    x = (uv[:, 0] - cx) / fx
    y = (uv[:, 1] - cy) / fy
    depth = jnp.asarray(rng.uniform(5, 40, (N_FEATS,)), DTYPE)
    pts = jnp.stack([x * depth, y * depth, depth], axis=-1)
    feats = AlignFeatures(
        uv_host=uv,
        host_idx=jnp.asarray(rng.integers(0, 2, N_FEATS), jnp.int32),
        points_ref=pts,
        valid=jnp.ones((N_FEATS,), bool),
    )
    T0 = SE3.identity(dtype=DTYPE)
    return img, feats, T0, (fx, fy, cx, cy)


def main():
    from sdvo_tpu.align.feature_alignment import align_features_2d
    from sdvo_tpu.align.image_alignment import SparseImageAlign
    from sdvo_tpu.depth.filter import FilterBank, update_filters
    from sdvo_tpu.geometry.se3 import SE3
    from sdvo_tpu.image.pyramid import build_pyramid

    rng = np.random.default_rng(0)
    img, feats, T0, (fx, fy, cx, cy) = build_inputs(rng)
    aligner = SparseImageAlign(patch_size=5, min_level=0, max_level=3)

    pyramid_fn = jax.jit(lambda im: build_pyramid(im, LEVELS))
    featalign_fn = jax.jit(
        lambda rg, cg, ur, ui, v, hi: align_features_2d(rg, cg, ur, ui, v, 5, 10, hi)
    )
    filters = FilterBank.empty(N_FILTERS, 49, DTYPE)
    filters = filters._replace(
        uv_ref=jnp.asarray(rng.uniform(30, [W - 30, H - 30], (N_FILTERS, 2)), DTYPE),
        mu=jnp.asarray(rng.uniform(0.05, 0.3, N_FILTERS), DTYPE),
        var=jnp.full((N_FILTERS,), 0.01, DTYPE),
        max_inv_depth=jnp.full((N_FILTERS,), 0.5, DTYPE),
        valid=jnp.ones((N_FILTERS,), bool),
    )
    bearings = jnp.concatenate(
        [
            (filters.uv_ref[:, 0:1] - cx) / fx,
            (filters.uv_ref[:, 1:2] - cy) / fy,
            jnp.ones((N_FILTERS, 1), DTYPE),
        ],
        axis=-1,
    )
    bearings = bearings / jnp.linalg.norm(bearings, axis=-1, keepdims=True)
    filters = filters._replace(bearing_ref=bearings)
    T_rel = SE3(
        jnp.broadcast_to(jnp.eye(3, dtype=DTYPE), (N_FILTERS, 3, 3)),
        jnp.broadcast_to(jnp.asarray([0.3, 0.0, 0.5], DTYPE), (N_FILTERS, 3)),
    )
    filters_update_fn = jax.jit(
        lambda bank, T, im: update_filters(bank, T, im, fx, fy, cx, cy, jnp.asarray(1))
    )

    kf_grad_stub = None

    def frame_step(image):
        pyr = pyramid_fn(image)
        host_pyr = [jnp.stack([lvl, lvl]) for lvl in pyr.images]
        T_est, rmse, status = aligner.align(
            T0, host_pyr, pyr.images, feats, fx, fy, cx, cy
        )
        uv_m = feats.uv_host[:N_MATCHES]
        uv_out, err, conv = featalign_fn(
            pyr.base_gradient, pyr.base_gradient, uv_m, uv_m,
            jnp.ones((N_MATCHES,), bool), jnp.zeros((N_MATCHES,), jnp.int32),
        )
        bank, conv2 = filters_update_fn(filters, T_rel, pyr.base_image)
        return T_est, uv_out, bank.mu

    # warmup / compile
    out = frame_step(img)
    jax.block_until_ready(out)

    n_iter = 50
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = frame_step(img)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iter / dt

    print(
        json.dumps(
            {
                "metric": "kitti_frame_tracking_throughput",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / REFERENCE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

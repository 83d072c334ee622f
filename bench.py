#!/usr/bin/env python
"""Benchmark: per-frame VO tracking throughput on the available accelerator.

Measures the device-resident streaming tracker at KITTI geometry (1241×376,
4-level pyramid, 256 alignment features, 150 reprojection matches, 512 depth
filters): a chunk of F rendered frames is staged into HBM and one `lax.scan`
dispatch runs the FULL per-frame step for each —
  pyramid build → coarse-to-fine sparse alignment → batched feature alignment
  → depth-filter bank update —
carrying the pose chain frame-to-frame (sequential dependency preserved, as
in real VO). Per-frame throughput = F / chunk wall time. This is the
framework's production shape (sdvo_tpu.pipeline.streaming): the host link
round-trip is paid once per chunk, not once per frame.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference (amin-abouee/semi-direct-visual-odometry) publishes
no numbers and its C++ stack cannot be built in this image (Eigen3/Sophus/g2o/
nlohmann_json all absent, zero egress — see BASELINE.md "Measured baseline").
The baseline is instead MEASURED: tools/ref_proxy_bench.cpp reproduces the
reference's per-frame op mix (scalar per-feature loops, bilinear interps,
nth_element MAD, LM solves) single-threaded at identical capacities and
measures 49.9 fps on this machine (median of 3).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

REFERENCE_FPS = 49.9  # measured: tools/ref_proxy_bench.cpp (see BASELINE.md)

H, W = 376, 1241
LEVELS = 4
N_FEATS = 256
N_MATCHES = 150
N_FILTERS = 512
CHUNK = 32  # frames per device dispatch
DTYPE = jnp.float32


def _np_se3_exp(tau):
    """Numpy se(3) exp — input construction must not touch the accelerator
    (eager ops over a tunneled TPU cost seconds each)."""
    from scipy.linalg import expm

    up, om = tau[:3], tau[3:]
    xi = np.zeros((4, 4))
    xi[:3, :3] = [[0, -om[2], om[1]], [om[2], 0, -om[0]], [-om[1], om[0], 0]]
    xi[:3, 3] = up
    return expm(xi)


def build_inputs(rng):
    """Realistic workload: a rendered textured scene with a true camera
    trajectory, so the LM loops do representative work (random-noise images
    would let them exit immediately). All construction is numpy; arrays move
    to device once."""
    from types import SimpleNamespace

    from sdvo_tpu.align.image_alignment import AlignFeatures
    from sdvo_tpu.dataio.synthetic import render_plane, smooth_texture

    fx = fy = 721.5377
    cx, cy = 609.5593, 172.854
    tex = smooth_texture(rng, size=4096, blur=13)
    plane_z = 15.0
    # bounded oscillating trajectory: per-frame motion ~0.07 m (KITTI 10 Hz
    # urban scale) while the baseline to the reference keyframe stays within
    # a realistic inter-keyframe window (the reference re-keyframes every 3
    # frames, src/system.cpp:505-510 — a monotone 32-frame run against one
    # fixed keyframe would be an unrealistic workload and diverges)
    amp = np.asarray([0.35, 0.035, 0.22, 0.002, 0.006, 0.0015])

    cam = SimpleNamespace(fx=fx, fy=fy, cx=cx, cy=cy, width=W, height=H)

    class _NpPose:
        def __init__(self, T):
            self.rotation = T[:3, :3]
            self.translation = T[:3, 3]

    img_ref = render_plane(tex, cam, _NpPose(np.eye(4)), plane_z, supersample=1)
    frames, T_true = [], []
    for i in range(1, CHUNK + 1):
        T44 = _np_se3_exp(amp * np.sin(2.0 * np.pi * i / CHUNK))
        T_true.append(T44)
        frames.append(render_plane(tex, cam, _NpPose(T44), plane_z, supersample=1))
    images = jnp.asarray(np.stack(frames), DTYPE)

    uv = rng.uniform(30, [W - 30, H - 30], (N_FEATS, 2))
    x = (uv[:, 0] - cx) / fx
    y = (uv[:, 1] - cy) / fy
    b = np.stack([x, y, np.ones_like(x)], axis=-1)
    pts = b * plane_z
    feats = AlignFeatures(
        uv_host=jnp.asarray(uv, DTYPE),
        host_idx=jnp.zeros((N_FEATS,), jnp.int32),
        points_ref=jnp.asarray(pts, DTYPE),
        valid=jnp.ones((N_FEATS,), bool),
    )
    img_ref = jnp.asarray(img_ref, DTYPE)
    return img_ref, images, T_true, feats, (fx, fy, cx, cy)


def main():
    from sdvo_tpu.align.image_alignment import SparseImageAlign
    from sdvo_tpu.depth.filter import FilterBank
    from sdvo_tpu.geometry.se3 import SE3
    from sdvo_tpu.image.pyramid import build_pyramid
    from sdvo_tpu.pipeline.streaming import StreamingTracker

    rng = np.random.default_rng(0)
    img_ref, images, T_true, feats, (fx, fy, cx, cy) = build_inputs(rng)

    ref_pyr = jax.block_until_ready(jax.jit(lambda im: build_pyramid(im, LEVELS))(img_ref))
    host_pyr = tuple(r[None] for r in ref_pyr.images)

    filters = FilterBank.empty(N_FILTERS, 49, DTYPE)
    filters = filters._replace(
        uv_ref=jnp.asarray(rng.uniform(30, [W - 30, H - 30], (N_FILTERS, 2)), DTYPE),
        mu=jnp.asarray(rng.uniform(0.05, 0.3, N_FILTERS), DTYPE),
        var=jnp.full((N_FILTERS,), 0.01, DTYPE),
        max_inv_depth=jnp.full((N_FILTERS,), 0.5, DTYPE),
        valid=jnp.ones((N_FILTERS,), bool),
    )
    b = np.stack(
        [
            (np.asarray(filters.uv_ref[:, 0]) - cx) / fx,
            (np.asarray(filters.uv_ref[:, 1]) - cy) / fy,
            np.ones(N_FILTERS),
        ],
        axis=-1,
    )
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    filters = filters._replace(bearing_ref=jnp.asarray(b, DTYPE))

    aligner = SparseImageAlign(patch_size=5, min_level=0, max_level=3)
    tracker = StreamingTracker(aligner, levels=LEVELS)

    args = (
        images, host_pyr, ref_pyr.base_gradient, feats,
        feats.uv_host[:N_MATCHES], jnp.ones((N_MATCHES,), bool),
        SE3.identity(dtype=DTYPE), SE3.identity(dtype=DTYPE),
        filters, fx, fy, cx, cy, 1,
    )

    # warmup / compile
    carry, outs = tracker.track_chunk(*args)
    jax.block_until_ready(outs)

    # sanity: the tracker must actually follow the rendered trajectory
    t_est = np.asarray(outs.translations[-1])
    t_gt = T_true[-1][:3, 3]
    err = float(np.linalg.norm(t_est - t_gt))
    assert err < 0.1, f"final-frame translation error {err} m — bench workload broken"
    assert float(np.max(np.asarray(outs.rmse))) < 40.0, "alignment diverged"

    # synchronous chunk timing: one dispatch tracks CHUNK frames in sequence
    n_rep = 20
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        carry, outs = tracker.track_chunk(*args)
        jax.block_until_ready(outs)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / CHUNK
    fps = 1.0 / dt

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

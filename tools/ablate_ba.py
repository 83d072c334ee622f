#!/usr/bin/env python
"""ATE-vs-settings ablation of the windowed device BA on a long sequence.

VERDICT r4 #5: quantify what the device path's BA shortcuts (iteration
budget, landmark cap, structure pre-solve) cost in drift. Runs the
long-sequence synthetic scenario (tests/test_long_sequence.py geometry,
no blackout) on the CPU backend for each BA variant and reports drift as a
fraction of path length. Results go into PERF.md.

Usage: python tools/ablate_ba.py [--frames 150]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from sdvo_tpu.config import load_config
from sdvo_tpu.dataio.evaluate import ate_rmse
from sdvo_tpu.geometry import se3
from sdvo_tpu.geometry.camera import PinholeCamera
from sdvo_tpu.pipeline.device_system import DeviceSystem
from synthetic import render_ridge, smooth_texture

CAM = dict(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320, height=240)


def render(rng, n):
    cam = PinholeCamera.create(**CAM, dtype=jnp.float64)
    tex = smooth_texture(rng, size=3072, blur=13)
    images, poses = [], []
    for i in range(n):
        tau = np.asarray([
            0.5 * np.sin(2 * np.pi * i / 120.0),
            0.05 * np.sin(2 * np.pi * i / 80.0),
            0.4 * np.sin(2 * np.pi * i / 150.0),
            0.002 * np.sin(2 * np.pi * i / 120.0),
            0.01 * np.sin(2 * np.pi * i / 100.0),
            0.0,
        ])
        T = se3.exp(jnp.asarray(tau))
        poses.append(np.asarray(T.as_matrix()))
        images.append(np.asarray(render_ridge(tex, cam, T, z_near=8.0,
                                              z_far=14.0, split_x=1.0,
                                              supersample=1)))
    return cam, images, poses


def run_variant(cam, images, poses, *, ba_iterations, ba_points, ba_presolve):
    config = load_config(overrides={
        "camera": {"img_width": CAM["width"], "img_height": CAM["height"]},
        "initialization": {
            "min_detected_points": 60, "desired_detected_points": 150,
            "threshold_gradient_magnitude": 20, "disparity_threshold": 2,
        },
        "algorithm": {
            "cell_pixel_size": 24, "min_tracked_features": 20,
            "max_dropped_features": 150, "max_reprojection_matches": 96,
            "max_features_per_frame": 160, "max_points": 1024,
            "max_filters": 256, "keyframe_every_n": 3,
        },
    })
    ds = DeviceSystem(config, camera=cam, supersteps_per_chunk=4,
                      max_promote=32, ba_points=ba_points,
                      ba_iterations=ba_iterations, ba_presolve=ba_presolve)
    t0 = time.perf_counter()
    for i, img in enumerate(images):
        ds.add_image(np.asarray(img, np.float64), float(i))
    ds.finish()
    wall = time.perf_counter() - t0
    est, gt = [], []
    for T, Tg in zip(ds.trajectory, poses):
        if T is None:
            continue
        est.append(-T[:3, :3].T @ T[:3, 3])
        gt.append(-Tg[:3, :3].T @ Tg[:3, 3])
    est, gt = np.asarray(est), np.asarray(gt)
    ate = ate_rmse(est, gt, with_scale=True)
    path = float(np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=-1)))
    return {"ba_iterations": ba_iterations, "ba_points": ba_points,
            "ba_presolve": ba_presolve, "ate_m": round(float(ate), 4),
            "drift_pct": round(100.0 * float(ate) / path, 3),
            "frames_tracked": int(len(est)), "wall_s": round(wall, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150)
    args = ap.parse_args()
    rng = np.random.default_rng(11)
    cam, images, poses = render(rng, args.frames)
    variants = [
        dict(ba_iterations=3, ba_points=256, ba_presolve=0),  # product default shape
        dict(ba_iterations=3, ba_points=256, ba_presolve=2),
        dict(ba_iterations=2, ba_points=256, ba_presolve=0),
        dict(ba_iterations=4, ba_points=256, ba_presolve=0),
        dict(ba_iterations=3, ba_points=128, ba_presolve=0),
        dict(ba_iterations=3, ba_points=512, ba_presolve=0),
    ]
    rows = []
    for v in variants:
        r = run_variant(cam, images, poses, **v)
        rows.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"ablation": "device windowed BA", "frames": args.frames,
                      "rows": rows}))


if __name__ == "__main__":
    main()

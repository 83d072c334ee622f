"""Long-sequence robustness: 300 frames through the device-resident System.

The reference's entire purpose is 1000+-frame KITTI sequences
(src/main.cpp:94-130); short e2e tests never exercise keyframe eviction
(src/system.cpp:436-442), map churn, filter-bank saturation, or the
relocalization path (src/system.cpp:448-457). This test drives all of them:

* 300 frames ⇒ ~100 keyframes through a 7-keyframe window ⇒ dozens of
  evictions and point-removal cascades;
* the 256-slot filter bank saturates and recycles every few keyframes;
* a 9-frame textureless blackout forces FAILED → host relocalization →
  recovery → re-entry into the device path;
* drift stays bounded relative to path length (the metric KITTI ATE
  stresses), both before the blackout and over the full run.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sdvo_tpu.config import load_config
from sdvo_tpu.dataio.evaluate import ate_rmse
from sdvo_tpu.geometry import se3
from sdvo_tpu.geometry.camera import PinholeCamera
from sdvo_tpu.pipeline.device_system import DeviceSystem

from synthetic import render_ridge, smooth_texture

pytestmark = pytest.mark.slow  # full e2e — excluded from `pytest -m 'not slow'`

CAM = dict(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320, height=240)
N_FRAMES = 300
BLACKOUT = range(150, 159)


def _render_long(rng):
    cam = PinholeCamera.create(**CAM, dtype=jnp.float64)
    tex = smooth_texture(rng, size=3072, blur=13)
    black = np.zeros((CAM["height"], CAM["width"]))
    images, poses = [], []
    for i in range(N_FRAMES):
        # slow figure-sweep with turns; period long enough that the 9-frame
        # blackout displaces the camera by only a few pixels (reloc basin)
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
        if i in BLACKOUT:
            images.append(black)
        else:
            images.append(
                np.asarray(render_ridge(tex, cam, T, z_near=8.0, z_far=14.0,
                                        split_x=1.0, supersample=1))
            )
    return cam, images, poses


@pytest.fixture(scope="module")
def long_run():
    rng = np.random.default_rng(11)
    cam, images, poses = _render_long(rng)
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
                      max_promote=32, ba_points=256, ba_iterations=4)
    for i, img in enumerate(images):
        ds.add_image(np.asarray(img, np.float64), float(i))
    ds.finish()
    return ds, poses


def _centers(trajectory, poses):
    est, gt, idx = [], [], []
    for i, (T, Tg) in enumerate(zip(trajectory, poses)):
        if T is None:
            continue
        est.append(-T[:3, :3].T @ T[:3, 3])
        gt.append(-Tg[:3, :3].T @ Tg[:3, 3])
        idx.append(i)
    return np.asarray(est), np.asarray(gt), np.asarray(idx)


def test_long_run_tracks(long_run):
    ds, poses = long_run
    assert len(ds.trajectory) == N_FRAMES
    est, gt, idx = _centers(ds.trajectory, poses)
    # everything before the blackout tracks (the two-view bootstrap may skip
    # the first frame or two while disparity accumulates)
    pre = idx < BLACKOUT.start
    assert pre.sum() >= BLACKOUT.start - 3
    # bounded drift before the blackout, relative to path length
    path = float(np.sum(np.linalg.norm(np.diff(gt[pre], axis=0), axis=-1)))
    ate_pre = ate_rmse(est[pre], gt[pre], with_scale=True)
    # monocular drift on this low-res (320×240) f32 run measures ~4.3% of
    # path (was ~5-8% before host-keyframe promotion anchoring, r4); the gate
    # documents the current envelope and catches regressions
    assert ate_pre / path < 0.06, (ate_pre, path)


def test_blackout_fails_then_recovers(long_run):
    ds, poses = long_run
    results = [m["result"] for m in ds.metrics]
    fail_window = results[BLACKOUT.start : BLACKOUT.stop + 3]
    assert "FAILED" in fail_window, fail_window
    # relocalization engaged (covers the host rmse<80 / >=30-match gates,
    # pipeline/system.py _relocalize_frame) and tracking resumed
    assert ds.n_relocalizations >= 1
    post = results[BLACKOUT.stop + 5 :]
    frac_ok = np.mean([r != "FAILED" for r in post])
    assert frac_ok > 0.9, f"only {frac_ok:.0%} of post-blackout frames tracked"
    # the device path re-engaged after recovery
    assert ds.bootstrapped


def test_eviction_and_churn(long_run):
    ds, poses = long_run
    # ~100 keyframes were created through a 7-slot window ⇒ many evictions
    if ds.state is not None:
        n_live = int(np.asarray(ds.state.map.kf_valid).sum())
        n_ever = int(np.asarray(ds.state.map.kf_counter))
    else:
        n_live = ds.host.arena.num_keyframes()
        n_ever = ds.host.arena.kf_counter
    assert n_live <= ds.config.algorithm.max_keyframes + 1
    assert n_ever >= 60, n_ever
    assert n_ever - n_live >= 40, "eviction never fired"
    # filter bank saturated and recycled without overflowing
    caps = [m["n_filters"] for m in ds.metrics if "n_filters" in m]
    assert max(caps) <= ds.config.algorithm.max_filters
    assert caps[-1] > 0


def test_full_run_drift_bounded(long_run):
    ds, poses = long_run
    est, gt, idx = _centers(ds.trajectory, poses)
    post = idx >= BLACKOUT.stop
    # after recovery the map keeps the pre-blackout frame, so the WHOLE
    # trajectory (minus failed frames) stays consistent under one alignment
    path = float(np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=-1)))
    ate = ate_rmse(est, gt, with_scale=True)
    assert ate / path < 0.12, (ate, path)
    assert post.sum() > 100

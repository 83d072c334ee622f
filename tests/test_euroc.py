"""EuRoC ASL-format loader + the 5-level-pyramid preset (BASELINE config 2).

The loader is unit-tested against a synthesized ASL directory tree; the
5-level pipeline runs on synthetic EuRoC-like geometry (752×480, pinhole)
and must track while depth filters converge — the configuration the
reference never shipped a loader for (resource/*.yaml covers KITTI/denso
only, src/system.cpp:612-633).
"""

import json
import os

import numpy as np
import pytest

from sdvo_tpu.dataio.datasets import load_euroc_sequence


def _write_asl(root, n=4):
    cam = os.path.join(root, "mav0", "cam0")
    data = os.path.join(cam, "data")
    os.makedirs(data)
    from PIL import Image

    rows = []
    for i in range(n):
        ts = 1403636579763555584 + i * 50_000_000
        fname = f"{ts}.png"
        Image.fromarray(
            (np.random.default_rng(i).uniform(0, 255, (480, 752))).astype(np.uint8)
        ).save(os.path.join(data, fname))
        rows.append(f"{ts},{fname}")
    with open(os.path.join(cam, "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n" + "\n".join(rows) + "\n")
    with open(os.path.join(cam, "sensor.yaml"), "w") as f:
        f.write(
            "sensor_type: camera\n"
            "camera_model: pinhole\n"
            "intrinsics: [458.654, 457.296, 367.215, 248.375]\n"
            "distortion_model: radial-tangential\n"
            "distortion_coefficients: [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05]\n"
            "resolution: [752, 480]\n"
        )
    return os.path.join(root, "mav0")


def test_euroc_loader(tmp_path):
    seq = _write_asl(str(tmp_path))
    paths, stamps, calib = load_euroc_sequence(seq)
    assert len(paths) == 4
    assert np.all(np.diff(stamps) > 0)
    assert abs(stamps[1] - stamps[0] - 0.05) < 1e-6  # 20 Hz cam
    np.testing.assert_allclose(calib["K"][0, 0], 458.654)
    np.testing.assert_allclose(calib["K"][1, 2], 248.375)
    assert calib["dist"].shape == (5,)
    np.testing.assert_allclose(calib["dist"][0], -0.28340811)
    assert calib["dist"][4] == 0.0  # k3 padded
    assert (calib["width"], calib["height"]) == (752, 480)


def test_euroc_loader_no_csv(tmp_path):
    seq = _write_asl(str(tmp_path))
    os.remove(os.path.join(seq, "cam0", "data.csv"))
    paths, stamps, calib = load_euroc_sequence(seq)
    assert len(paths) == 4
    assert np.all(np.diff(stamps) > 0)


def test_euroc_preset_schema():
    cfg_path = os.path.join(os.path.dirname(__file__), "..", "config", "euroc.json")
    from sdvo_tpu.config import load_config

    cfg = load_config(cfg_path)
    assert cfg.algorithm.max_level_image_pyramid == 4  # 5 pyramid levels
    assert cfg.camera.img_width == 752
    assert cfg.camera.img_height == 480


@pytest.mark.slow
def test_euroc_5level_pipeline_tracks_and_converges(rng):
    """5-level coarse-to-fine on EuRoC geometry: the system must track a
    synthetic sequence and the depth-filter bank must converge seeds into
    map points (filter-convergence tracking at 5 levels)."""
    import jax.numpy as jnp

    from sdvo_tpu.config import load_config
    from sdvo_tpu.geometry.camera import PinholeCamera
    from sdvo_tpu.pipeline.system import System

    from test_pipeline_e2e import make_sequence

    CAM = dict(fx=458.0, fy=457.0, cx=376.0, cy=240.0, width=752, height=480)
    cam = PinholeCamera.create(**CAM, dtype=jnp.float64)
    cfg = load_config(overrides={
        "camera": {"img_width": 752, "img_height": 480},
        "initialization": {
            "min_detected_points": 60,
            "desired_detected_points": 150,
            "threshold_gradient_magnitude": 20,
            "disparity_threshold": 2,
        },
        "algorithm": {
            "max_level_image_pyramid": 4,  # 5 levels
            "min_tracked_features": 20,
            "max_features_per_frame": 160,
            "max_reprojection_matches": 96,
            "max_points": 1024,
            "max_filters": 256,
        },
    })
    rng2 = np.random.default_rng(11)
    cam_out, images, poses = make_sequence(rng2, n_frames=10, cam_override=CAM)
    sys_ = System(cfg, camera=cam)
    n_conv_points = 0
    for i, img in enumerate(images):
        sys_.add_image(img.astype(np.float64), float(i))
    ok = [m for m in sys_.metrics if m.get("result") in ("SUCCESS", "KEYFRAME")]
    assert len(ok) >= 8, sys_.metrics
    # depth filters converged into map points beyond the bootstrap set
    n_pts = sys_.metrics[-1].get("n_points", 0)
    assert n_pts > sys_.metrics[1].get("n_points", 0), sys_.metrics[-1]

"""Infrastructure tests: config loading, logging, viz, IO, checkpointing,
path helpers — the reference's L0 layer (config.cpp / utils.cpp /
visualization.cpp)."""

import json
import logging
import os

import numpy as np
import pytest

from sdvo_tpu.config import Config, load_config
from sdvo_tpu.dataio.datasets import load_camera_yaml
from sdvo_tpu.dataio.evaluate import ate_rmse, rpe, umeyama_alignment
from sdvo_tpu.utils.io import find_absolute_path, read_debug_dump, repo_root, write_debug_dump
from sdvo_tpu.utils.logging import MODULES, configure_logging, get_logger
from sdvo_tpu.viz.overlays import (
    colormap_depth,
    draw_feature_points,
    draw_image_grid,
    get_color_image,
    patch_mosaic,
    stack_vertically,
)


def test_config_defaults():
    c = load_config(None)
    # canonical defaults from the reference config/config.json:18-33
    assert c.initialization.threshold_gradient_magnitude == 50
    assert c.initialization.min_detected_points == 100
    assert c.initialization.desired_detected_points == 200
    assert c.initialization.map_scale_factor == 1.0
    assert c.initialization.disparity_threshold == 5
    assert c.algorithm.cell_pixel_size == 30
    assert c.algorithm.patch_size_image_alignment == 5
    assert c.algorithm.min_level_image_pyramid == 0
    assert c.algorithm.max_level_image_pyramid == 3
    assert c.algorithm.max_keyframes == 7
    assert c.algorithm.keyframe_every_n == 3


def test_config_repo_json():
    path = os.path.join(repo_root(), "config", "config.json")
    c = load_config(path)
    assert c.camera.img_width == 1241
    assert c.camera.img_height == 376
    assert c.file_paths.camera_calibration_file.endswith("kitti.yaml")


def test_config_json_roundtrip(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"camera": {"img_width": 640, "img_height": 480}, "unknown": 1}))
    c = load_config(str(p))
    assert c.camera.img_width == 640
    assert c.algorithm.cell_pixel_size == 30  # default preserved


def test_camera_yaml_parser():
    K, d = load_camera_yaml(os.path.join(repo_root(), "resource", "kitti.yaml"))
    assert abs(K[0, 0] - 721.5377) < 1e-6
    assert abs(K[0, 2] - 609.5593) < 1e-6
    assert np.allclose(d, 0.0)
    K2, d2 = load_camera_yaml(os.path.join(repo_root(), "resource", "denso.yaml"))
    assert abs(K2[0, 0] - 420.5097) < 1e-6


def test_logging_modules():
    configure_logging(level=logging.WARNING)
    for m in MODULES:
        lg = get_logger(m)
        assert lg.name == f"sdvo.{m}"
    assert len(MODULES) == 11  # same count as the reference's log.conf sections


def test_viz_overlays(tmp_path):
    img = get_color_image(np.random.default_rng(0).uniform(0, 255, (60, 80)))
    assert img.shape == (60, 80, 3) and img.dtype == np.uint8
    out = draw_feature_points(img, [[10, 10], [40, 30]], color="pink", shape="rect")
    assert out.shape == img.shape
    out2 = draw_image_grid(img, 20)
    assert out2.shape == img.shape
    colors = colormap_depth(np.array([1.0, 5.0, 10.0]))
    assert colors.shape == (3, 3)
    mosaic = patch_mosaic(np.random.default_rng(0).normal(size=(7, 25)), 5)
    assert mosaic.ndim == 3
    stacked = stack_vertically(img, out2)
    assert stacked.shape[0] == 2 * 60 + 8


def test_viz_extended_suite(tmp_path, rng):
    """The remaining visualization.cpp surface: candidates by type, epipole,
    obs-vs-projection overlay, depth-filter projection, F-matrix epipolar
    lines, residual mosaics, HSV magnitude, horizontal stacking."""
    from sdvo_tpu.viz.overlays import (
        draw_candidates, draw_epipole, draw_epipolar_lines_fundamental,
        draw_points_and_projections, generate_color, get_color_image,
        get_gray_image, hsv_image_with_magnitude, project_depth_filters,
        residual_patch_mosaic, stack_horizontally,
    )

    img = get_color_image(rng.uniform(0, 255, (120, 160)))
    uv = rng.uniform(10, 100, (8, 2))
    types = np.asarray([0, 1, 2, 3, 0, 1, 2, 3])
    out = draw_candidates(img, uv, types)
    out = draw_epipole(out, np.asarray([80.0, 60.0]))
    out = draw_points_and_projections(out, uv, uv + rng.normal(0, 2, uv.shape))
    out = project_depth_filters(out, uv, rng.uniform(0.05, 0.2, 8), rng.uniform(0.001, 0.05, 8))
    F = rng.normal(size=(3, 3))
    out = draw_epipolar_lines_fundamental(out, uv[:3], F)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert get_gray_image(out).shape == (120, 160)
    assert hsv_image_with_magnitude(rng.uniform(0, 50, (60, 80))).shape == (60, 80, 3)
    m = residual_patch_mosaic(rng.uniform(0, 255, (6, 25)), rng.uniform(0, 255, (6, 25)), 5)
    assert m.size > 0 and m.shape[0] >= 5
    s2 = stack_horizontally(img, img[:80])
    assert s2.shape[1] == 2 * 160 + 8
    c = generate_color(0.5, 0.0, 1.0)
    assert len(c) == 3 and all(0 <= v <= 255 for v in c)


def test_plots(tmp_path):
    from sdvo_tpu.viz.plots import draw_histogram, hessian_heatmap

    draw_histogram(np.random.default_rng(0).normal(size=500), str(tmp_path / "h.png"))
    hessian_heatmap(np.eye(6), str(tmp_path / "H.png"))
    assert (tmp_path / "h.png").exists() and (tmp_path / "H.png").exists()


def test_debug_dump_roundtrip(tmp_path):
    pose = np.eye(4)
    pose[:3, 3] = [1, 2, 3]
    uv = np.asarray([[10.5, 20.5], [30.0, 40.0]])
    pts = np.asarray([[1.0, 2.0, 5.0], [-1.0, 0.5, 8.0]])
    p = str(tmp_path / "dump.txt")
    write_debug_dump(p, pose, uv, pts)
    pose2, uv2, pts2 = read_debug_dump(p)
    np.testing.assert_allclose(pose2, pose)
    np.testing.assert_allclose(uv2, uv)
    np.testing.assert_allclose(pts2, pts)


def test_reference_format_dumps_roundtrip(tmp_path, rng):
    """The reference's exact two-frame debug rows (utils.cpp:54-117)."""
    from sdvo_tpu.utils.io import (
        read_all_from_file, read_features_from_file,
        write_all_info_file, write_features_info_file,
    )
    ref = rng.uniform(0, 100, (5, 2))
    cur = rng.uniform(0, 100, (5, 2))
    pts = rng.uniform(-5, 5, (5, 3))
    p1 = str(tmp_path / "all.txt")
    write_all_info_file(p1, ref, cur, pts)
    r2, c2, p2 = read_all_from_file(p1)
    np.testing.assert_allclose(r2, ref, rtol=1e-5)
    np.testing.assert_allclose(p2, pts, rtol=1e-5)
    p3 = str(tmp_path / "feats.txt")
    write_features_info_file(p3, ref, cur)
    r3, c3 = read_features_from_file(p3)
    np.testing.assert_allclose(c3, cur, rtol=1e-5)


def test_umeyama_recovers_similarity(rng):
    x = rng.normal(size=(50, 3))
    from scipy.spatial.transform import Rotation

    R_true = Rotation.from_rotvec([0.2, -0.1, 0.4]).as_matrix()
    y = 2.5 * (x @ R_true.T) + np.array([1.0, -2.0, 0.5])
    s, R, t = umeyama_alignment(x, y)
    assert abs(s - 2.5) < 1e-9
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    assert ate_rmse(x, y) < 1e-9


def test_rpe_zero_for_identical(rng):
    poses = np.stack([np.eye(4)] * 5)
    for i in range(5):
        poses[i][:3, 3] = [i, 0, 0]
    t_err, r_err = rpe(poses, poses)
    assert t_err < 1e-12 and r_err < 1e-9


def test_tools_run():
    import subprocess, sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo_root(), "tools", "symbolic_jacobians.py")],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert r.returncode == 0, r.stderr

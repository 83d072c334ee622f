"""Distortion at ingest + per-stage visualization gating (VERDICT r2 #4).

The reference precomputes undistortion remap grids and applies them to every
image when the first distortion coefficient is non-zero
(src/pinhole_camera.cpp:25-27,178-184 — the Denso config path), and gates
per-stage overlay dumps on config.visualization
(src/system.cpp:90-106,324-342)."""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from sdvo_tpu.config import load_config
from sdvo_tpu.geometry.camera import PinholeCamera
from sdvo_tpu.pipeline.system import System

from test_pipeline_e2e import CAM, make_sequence


def _distort_image(clean: np.ndarray, cam_d: PinholeCamera) -> np.ndarray:
    """Synthesize the distorted image a lens described by cam_d would produce
    from a pinhole-clean view: distorted[u_d] = clean[pinhole(undistort(u_d))]."""
    from scipy.ndimage import map_coordinates

    H, W = clean.shape
    vv, uu = np.meshgrid(np.arange(H, dtype=np.float64), np.arange(W, dtype=np.float64), indexing="ij")
    x = (uu - float(cam_d.cx)) / float(cam_d.fx)
    y = (vv - float(cam_d.cy)) / float(cam_d.fy)
    xy_u = np.asarray(cam_d.undistort_normalized(jnp.asarray(np.stack([x, y], -1))))
    src_u = xy_u[..., 0] * float(cam_d.fx) + float(cam_d.cx)
    src_v = xy_u[..., 1] * float(cam_d.fy) + float(cam_d.cy)
    return map_coordinates(clean.astype(np.float32), [src_v, src_u], order=1, mode="nearest")


def test_system_undistorts_at_ingest(rng):
    """A System built with a distorting camera must recover the pinhole image
    from lens-distorted input before any tracking math sees it."""
    cam, images, poses = make_sequence(rng, n_frames=2)
    clean = images[0].astype(np.float32)
    cam_d = PinholeCamera.create(
        **CAM, dist=[-0.28, 0.07, 1e-4, -1e-4, 0.0], dtype=jnp.float64
    )
    distorted = _distort_image(clean, cam_d)
    # sanity: the lens actually moved pixels
    assert np.abs(distorted - clean)[40:-40, 40:-40].max() > 5.0

    config = load_config(overrides={
        "camera": {"img_width": CAM["width"], "img_height": CAM["height"]},
    })
    sys_ = System(config, camera=cam_d)
    assert sys_._undistort_maps is not None  # distortion auto-enabled
    recovered = sys_.preprocess_image(distorted)
    interior = (slice(40, -40), slice(40, -40))
    err = np.abs(recovered[interior] - clean[interior])
    assert np.median(err) < 1.5, float(np.median(err))

    # zero-distortion camera (kitti/denso yaml ship d=0) skips the remap
    cam_0 = PinholeCamera.create(**CAM, dtype=jnp.float64)
    sys0 = System(config, camera=cam_0)
    assert sys0._undistort_maps is None
    np.testing.assert_array_equal(sys0.preprocess_image(clean), clean)


@pytest.mark.slow  # interpret-mode kernel / full viz run — minutes on CPU
def test_visualization_gated_dumps(rng, tmp_path):
    """enable_visualization + File saving writes per-stage overlays; the
    default config writes nothing."""
    cam, images, poses = make_sequence(rng, n_frames=6)
    over = {
        "camera": {"img_width": CAM["width"], "img_height": CAM["height"]},
        "initialization": {
            "min_detected_points": 60, "desired_detected_points": 150,
            "threshold_gradient_magnitude": 20, "disparity_threshold": 2,
        },
        "algorithm": {"min_tracked_features": 20, "max_dropped_features": 150},
    }
    config = load_config(overrides=over)
    config = config.replace(
        visualization=config.visualization.__class__(
            enable_visualization=True, saving_type="File"),
        file_paths=config.file_paths.__class__(output_dir=str(tmp_path)),
    )
    sys_ = System(config, camera=cam)
    for i, img in enumerate(images):
        sys_.add_image(np.asarray(img, np.float64), float(i))
    pngs = sorted(glob.glob(os.path.join(str(tmp_path), "images", "*.png")))
    stages = {os.path.basename(p).split("_", 1)[1] for p in pngs}
    assert "detect.png" in stages and "reproject.png" in stages, pngs

    # optimizer-wired diagnostics (Optimizer::visualize,
    # /root/reference/src/optimizer.cpp:516-599): every alignment solve
    # dumps residual/weight histograms + the Hessian heatmap
    diags = sorted(glob.glob(os.path.join(str(tmp_path), "diagnostics", "*.png")))
    kinds = {os.path.basename(p).rsplit("_", 1)[1] for p in diags}
    assert {"residuals.png", "weights.png", "hessian.png"} <= kinds, diags
    assert any("image_alignment" in os.path.basename(p) for p in diags)
    from sdvo_tpu.optim.optimizer import set_diagnostics_sink

    set_diagnostics_sink(None)  # don't leak the sink into other tests

    # default config: no dumps
    config_off = load_config(overrides=over)
    sys_off = System(config_off, camera=cam)
    sys_off.add_image(np.asarray(images[0], np.float64), 0.0)
    assert not os.path.exists(os.path.join("output", "images"))

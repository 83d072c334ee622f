"""Validation against REAL image pixels — the reference's own fixtures.

Everything else in the suite runs on rendered synthetic textures; these tests
pin the front-end to natural-image statistics using the photos the reference
ships (``/root/reference/tests/test_data/``) at REFERENCE-DEFAULT thresholds:

* undistortion golden pair (``tests/test_camera.cpp:105-130``: undistort
  ``camera/undistort_input.png`` and diff against ``camera/undistort_ref.png``
  — the reference demands bit-equality against its own OpenCV output; ours is
  an independent bilinear remap, so the gate is sub-gray-level agreement,
  dominated by cv::remap's fixed-point interpolation tables);
* feature detection on ``images/image_1.png`` at the default gradient
  threshold 50 (``resource/kitti.yaml`` default) — natural images must yield
  a full detection budget without lowering thresholds;
* pyramid + sparse image alignment on a warped copy of the same photo —
  the tracker must recover a known camera rotation from real texture.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF_DATA = "/root/reference/tests/test_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixtures not present"
)


def _load_gray(path):
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), np.float64)


@pytest.fixture(scope="module")
def photo():
    """The reference's real test photo, grayscale float (1080, 1920)."""
    return _load_gray(os.path.join(REF_DATA, "images", "image_1.png"))


def test_undistortion_matches_reference_golden():
    """tests/test_camera.cpp:105-130 with the same calibration + fixtures."""
    from sdvo_tpu.geometry.camera import PinholeCamera, undistort_image

    inp = _load_gray(os.path.join(REF_DATA, "camera", "undistort_input.png"))
    ref = _load_gray(os.path.join(REF_DATA, "camera", "undistort_ref.png"))
    dist = np.array([
        -2.32951777e-01, 6.17256346e-02, -1.83274571e-05, 3.39255772e-05,
        -7.54987702e-03,
    ])
    cam = PinholeCamera.create(
        560.33468243, 561.37973145, 651.26269237, 499.06652492,
        1280, 960, dist=dist, dtype=jnp.float64,
    )
    out = undistort_image(inp, cam)
    d = np.abs(out - ref)
    # measured: mean 0.062, p99 0.53, max 2.2 gray levels — the residue of
    # cv::remap's 5-bit fixed-point bilinear weights, not of the distortion
    # model; anything beyond a few gray levels means wrong geometry
    assert d.mean() < 0.2, d.mean()
    assert np.percentile(d, 99) < 1.5
    assert d.max() < 8.0


def test_detection_on_real_photo_at_default_threshold(photo):
    """Natural gradients must fill the feature budget at the reference's
    default gradient threshold (resource/kitti.yaml: 50) — the synthetic
    scenes lower it to 20; a real photo must not need that."""
    from sdvo_tpu.config import load_config
    from sdvo_tpu.features.detection import gradient_magnitude_with_ssc
    from sdvo_tpu.image.pyramid import build_pyramid

    img = jnp.asarray(photo[:512, :1024], jnp.float32)
    pyr = build_pyramid(img, 4)
    config = load_config()
    thr = int(config.initialization.threshold_gradient_magnitude)
    assert thr == 50, "default config no longer at the reference threshold"
    feats, occ = gradient_magnitude_with_ssc(
        np.asarray(pyr.gradients[0]), thr, num_candidates=256, cell_size=30
    )
    n = len(feats.uv)
    assert n >= 200, f"only {n}/256 features on a real photo at threshold 50"
    # detections must actually sit on strong gradient magnitude
    mags = np.asarray(pyr.gradients[0])[
        feats.uv[:, 1].astype(int), feats.uv[:, 0].astype(int)
    ]
    assert np.median(mags) > thr


def test_device_detector_on_real_photo_at_default_threshold(photo):
    """The device max-per-cell detector (keyframe path) also fills its grid
    at threshold 50 on natural texture."""
    from sdvo_tpu.features.detection import detect_gradient_by_value
    from sdvo_tpu.image.pyramid import build_pyramid

    img = jnp.asarray(photo[:512, :1024], jnp.float32)
    pyr = build_pyramid(img, 4)
    uv, resp, valid = jax.jit(detect_gradient_by_value, static_argnums=(2,))(
        pyr.gradients[0], 50.0, 30
    )
    # a real photo has genuinely smooth cells (sky, walls) — the gate is that
    # ENOUGH cells yield features for tracking (measured 47% on this crop;
    # ~270 features on a 512×1024 crop, well past any tracking budget), and
    # that every reported feature really clears the threshold
    n = int(jnp.sum(valid))
    assert n >= 150, f"only {n} device-detector features at threshold 50"
    assert float(jnp.min(jnp.where(valid, resp, jnp.inf))) > 50.0


def test_sparse_alignment_recovers_rotation_on_real_photo(photo):
    """Pure-rotation warp of the real photo: a rotation about the camera
    center is EXACTLY a homography, so no depth knowledge is needed — the
    sparse image aligner must recover it from natural texture at default
    settings."""
    from scipy.ndimage import map_coordinates

    from sdvo_tpu.align.image_alignment import AlignFeatures, SparseImageAlign
    from sdvo_tpu.features.detection import gradient_magnitude_with_ssc
    from sdvo_tpu.geometry import se3
    from sdvo_tpu.geometry.se3 import SE3
    from sdvo_tpu.image.pyramid import build_pyramid

    H, W = 480, 640
    img0 = photo[200 : 200 + H, 400 : 400 + W].astype(np.float64)
    fx = fy = 500.0
    cx, cy = W / 2.0, H / 2.0

    # ground-truth rotation: ~0.5° yaw + 0.3° pitch (≈ 5 px image motion)
    tau = np.array([0.0, 0.0, 0.0, 0.005, 0.008, 0.002])
    T_gt = se3.exp(jnp.asarray(tau))
    R = np.asarray(T_gt.rotation)

    # warp: for each pixel of the NEW image, sample the old at K R⁻¹ K⁻¹ u
    vv, uu = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    rays = np.stack([(uu - cx) / fx, (vv - cy) / fy, np.ones_like(uu)], -1)
    rays0 = rays @ R  # R⁻¹ applied to rows (R orthonormal)
    u0 = fx * rays0[..., 0] / rays0[..., 2] + cx
    v0 = fy * rays0[..., 1] / rays0[..., 2] + cy
    img1 = map_coordinates(img0, [v0, u0], order=3, mode="nearest")

    pyr0 = build_pyramid(jnp.asarray(img0, jnp.float32), 4)
    pyr1 = build_pyramid(jnp.asarray(img1, jnp.float32), 4)

    # reference-default detection threshold on the real texture
    det, _ = gradient_magnitude_with_ssc(
        np.asarray(pyr0.gradients[0]), 50, num_candidates=128, cell_size=30
    )
    n = len(det.uv)
    assert n >= 80, f"detection too sparse for alignment test ({n})"
    uv = jnp.asarray(det.uv[:128], jnp.float32)
    n = uv.shape[0]

    # pure rotation: any depth is consistent; give all features depth 10
    depth = 10.0
    x = (uv[:, 0] - cx) / fx
    y = (uv[:, 1] - cy) / fy
    pts = jnp.stack([x * depth, y * depth, jnp.full_like(x, depth)], -1)
    feats = AlignFeatures(
        uv_host=uv,
        host_idx=jnp.zeros((n,), jnp.int32),
        points_ref=pts.astype(jnp.float32),
        valid=jnp.ones((n,), bool),
    )
    aligner = SparseImageAlign(patch_size=5, min_level=0, max_level=3)
    host_pyr = tuple(l[None] for l in pyr0.images)
    T_est, rmse, status = aligner.align(
        SE3.identity(dtype=jnp.float32), host_pyr, pyr1.images, feats,
        jnp.float32(fx), jnp.float32(fy), jnp.float32(cx), jnp.float32(cy),
    )
    err = np.asarray(se3.log(T_est.compose(SE3(T_gt.rotation.astype(jnp.float32),
                                               T_gt.translation.astype(jnp.float32)).inverse())))
    rot_err_deg = np.degrees(np.linalg.norm(err[3:]))
    assert rot_err_deg < 0.05, f"rotation error {rot_err_deg:.4f}° (est {err})"
    assert float(rmse) < 20.0


def test_pyramid_preserves_real_image_statistics(photo):
    """Downsampling must neither blur away nor alias natural texture: each
    level keeps a meaningful fraction of the parent's gradient energy."""
    from sdvo_tpu.image.pyramid import build_pyramid

    img = jnp.asarray(photo[:512, :512], jnp.float32)
    pyr = build_pyramid(img, 4)
    energies = []
    for lv in pyr.images:
        gx = jnp.diff(lv, axis=1)
        energies.append(float(jnp.sqrt(jnp.mean(gx * gx))))
    for a, b in zip(energies, energies[1:]):
        assert b > 0.5 * a, energies  # no catastrophic smoothing
        assert b < 4.0 * a, energies  # no aliasing blow-up

"""Device-resident System tests: the scanned superstep (tracking + keyframe
work + BA + eviction fully on device) must track a known synthetic trajectory
and keep its map arena consistent — the automatic version of the reference's
manual KITTI integration run (src/main.cpp:100-121), at the production shape
(one dispatch per chunk of keyframe periods)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdvo_tpu.config import load_config
from sdvo_tpu.dataio.evaluate import ate_rmse
from sdvo_tpu.pipeline.device_system import DeviceSystem
from sdvo_tpu.pipeline.system import SystemStatus

from test_pipeline_e2e import CAM, make_sequence

pytestmark = pytest.mark.slow  # full e2e — excluded from `pytest -m 'not slow'`


def _make(n_chunk_supersteps=2):
    config = load_config(
        overrides={
            "camera": {"img_width": CAM["width"], "img_height": CAM["height"]},
            "initialization": {
                "min_detected_points": 60,
                "desired_detected_points": 150,
                "threshold_gradient_magnitude": 20,
                "disparity_threshold": 2,
            },
            "algorithm": {
                "cell_pixel_size": 24,
                "min_tracked_features": 20,
                "max_dropped_features": 150,
                "max_reprojection_matches": 96,
                "max_features_per_frame": 160,
                "max_points": 1024,
                "max_filters": 256,
                "keyframe_every_n": 3,
            },
        }
    )
    from sdvo_tpu.geometry.camera import PinholeCamera

    cam = PinholeCamera.create(**CAM, dtype=jnp.float64)
    ds = DeviceSystem(
        config, camera=cam, supersteps_per_chunk=n_chunk_supersteps,
        max_promote=32, ba_points=256, ba_iterations=4,
    )
    return ds


@pytest.fixture(scope="module")
def tracked():
    rng = np.random.default_rng(7)
    cam, images, poses = make_sequence(rng, n_frames=14)
    ds = _make()
    for i, img in enumerate(images):
        ds.add_image(img.astype(np.float64), float(i))
    ds.finish()
    return ds, poses


def test_bootstrap_then_device(tracked):
    ds, poses = tracked
    assert ds.bootstrapped
    assert len(ds.trajectory) == len(poses)
    assert all(T is not None for T in ds.trajectory), "tracking lost"


def test_trajectory_accuracy(tracked):
    ds, poses = tracked
    est_c, gt_c = [], []
    for T_est, T_gt in zip(ds.trajectory, poses):
        if T_est is None:
            continue
        est_c.append(-T_est[:3, :3].T @ T_est[:3, 3])
        gt_c.append(-T_gt[:3, :3].T @ T_gt[:3, 3])
    ate = ate_rmse(np.asarray(est_c), np.asarray(gt_c), with_scale=True)
    assert ate < 0.05, f"device-System ATE {ate}"


def test_keyframes_and_map(tracked):
    ds, _ = tracked
    st = ds.state
    n_kf = int(np.asarray(st.map.kf_valid).sum())
    assert 3 <= n_kf <= ds.config.algorithm.max_keyframes + 1
    assert int(np.asarray(st.map.pt_valid).sum()) > 30
    assert int(np.asarray(st.filt.bank.valid).sum()) > 20
    # per-frame metrics recorded for every frame
    assert len(ds.metrics) == len(ds.trajectory)
    kf_frames = [m for m in ds.metrics if m["result"] == "KEYFRAME"]
    assert len(kf_frames) >= 3


def test_to_host_roundtrip(tracked, tmp_path):
    ds, _ = tracked
    sys = ds.to_host()
    assert sys.status == SystemStatus.PROCESS_NEW_FRAME
    assert sys.arena.num_keyframes() == int(np.asarray(ds.state.map.kf_valid).sum())
    # checkpoint through the host surface
    path = str(tmp_path / "ckpt.npz")
    ds.save_checkpoint(path)
    from sdvo_tpu.pipeline.system import System

    fresh = System(ds.config, camera=ds.host.camera)
    fresh.load_checkpoint(path)
    assert fresh.arena.num_keyframes() == sys.arena.num_keyframes()
    assert fresh.status == SystemStatus.PROCESS_NEW_FRAME


def test_failure_flag_on_blackout():
    """A textureless blackout must trip the tracking-quality gate
    (src/system.cpp:459-472) and freeze the pose instead of diverging."""
    rng = np.random.default_rng(7)
    cam, images, poses = make_sequence(rng, n_frames=8)
    ds = _make(n_chunk_supersteps=2)
    black = np.zeros_like(images[0])
    seq = images[:5] + [black] * 3  # blackout aligned to a full superstep
    for i, img in enumerate(seq):
        ds.add_image(np.asarray(img, np.float64), float(i))
    ds.finish()
    failed = [m for m in ds.metrics if m["result"] == "FAILED"]
    assert len(failed) >= 1
    # host fallback engaged for relocalization
    assert ds.n_relocalizations >= 1
    assert ds.state is None

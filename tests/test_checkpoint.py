"""Checkpoint/resume: serialize mid-sequence, restore into a fresh System,
verify state equality (SURVEY §5 aux-subsystem plan — the reference has no
checkpointing)."""

import numpy as np
import pytest

from sdvo_tpu.pipeline.system import System, SystemStatus

from test_pipeline_e2e import _make_system, make_sequence

pytestmark = pytest.mark.slow  # full e2e — excluded from `pytest -m 'not slow'`


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    cam, images, poses_gt = make_sequence(rng, n_frames=6)
    sys_a = _make_system(cam)
    for i, img in enumerate(images):
        sys_a.add_image(img, float(i))
    ckpt = str(tmp_path / "state.npz")
    sys_a.save_checkpoint(ckpt)

    sys_b = _make_system(cam)
    sys_b.load_checkpoint(ckpt)

    assert sys_b.status == sys_a.status
    assert sys_b.frame_count == sys_a.frame_count
    # prev_rel is re-seeded on load as (last tracked pose) · (newest KF pose)⁻¹
    # unless the newest KF is the last tracked frame (then it round-trips)
    if sys_b.ref_frame is not None and sys_b.ref_frame.frame_id == sys_b.frame_count - 1:
        np.testing.assert_allclose(sys_b.prev_rel, sys_a.prev_rel)
    else:
        last_T = next(T for T in reversed(sys_b.trajectory) if T is not None)
        np.testing.assert_allclose(
            sys_b.prev_rel, last_T @ np.linalg.inv(sys_b.ref_frame.pose_wc)
        )
    np.testing.assert_array_equal(sys_b.arena.kf_valid, sys_a.arena.kf_valid)
    np.testing.assert_allclose(sys_b.arena.kf_pose, sys_a.arena.kf_pose)
    np.testing.assert_allclose(sys_b.arena.pt_pos, sys_a.arena.pt_pos)
    np.testing.assert_array_equal(sys_b.arena.pt_valid, sys_a.arena.pt_valid)
    np.testing.assert_allclose(
        np.asarray(sys_b.filters.mu), np.asarray(sys_a.filters.mu)
    )
    assert len(sys_b.trajectory) == len(sys_a.trajectory)
    for Ta, Tb in zip(sys_a.trajectory, sys_b.trajectory):
        if Ta is None:
            assert Tb is None
        else:
            np.testing.assert_allclose(Ta, Tb)
    # summary renders on the restored system
    assert "keyframes" in sys_b.report_summary()


def test_checkpoint_resume_continues_tracking(tmp_path):
    """Resume must actually TRACK (VERDICT r1 weak #3): run half the sequence,
    checkpoint, restore into a fresh System, feed the remaining frames, and
    demand poses keep coming with accuracy comparable to the uninterrupted
    run."""
    from sdvo_tpu.dataio.evaluate import ate_rmse
    from sdvo_tpu.pipeline.system import FrameResult

    rng = np.random.default_rng(11)
    cam, images, poses_gt = make_sequence(rng, n_frames=12)

    # uninterrupted run
    sys_full = _make_system(cam)
    for i, img in enumerate(images):
        sys_full.add_image(img, float(i))

    # interrupted run: checkpoint at frame 7, resume in a fresh System
    sys_a = _make_system(cam)
    for i, img in enumerate(images[:7]):
        sys_a.add_image(img, float(i))
    ckpt = str(tmp_path / "state.npz")
    sys_a.save_checkpoint(ckpt)

    sys_b = _make_system(cam)
    sys_b.load_checkpoint(ckpt)
    assert sys_b.ref_frame is not None  # tracking is re-armed
    results = [sys_b.add_image(img, float(7 + i)) for i, img in enumerate(images[7:])]
    assert all(r != FrameResult.FAILED for r in results), [r.name for r in results]
    assert len(sys_b.trajectory) == len(images)

    def centers(traj, gt):
        est, g = [], []
        for T_est, T_gt in zip(traj, gt):
            if T_est is None:
                continue
            est.append(-T_est[:3, :3].T @ T_est[:3, 3])
            g.append(-T_gt[:3, :3].T @ T_gt[:3, 3])
        return np.asarray(est), np.asarray(g)

    est_f, gt_f = centers(sys_full.trajectory, poses_gt)
    est_b, gt_b = centers(sys_b.trajectory, poses_gt)
    ate_full = ate_rmse(est_f, gt_f, with_scale=True)
    ate_resumed = ate_rmse(est_b, gt_b, with_scale=True)
    # resumed accuracy within a small delta of the uninterrupted run
    assert ate_resumed < max(2.0 * ate_full, 0.05), (ate_resumed, ate_full)

"""Checkpoint/resume: serialize mid-sequence, restore into a fresh System,
verify state equality (SURVEY §5 aux-subsystem plan — the reference has no
checkpointing)."""

import numpy as np

from sdvo_tpu.pipeline.system import System, SystemStatus

from test_pipeline_e2e import _make_system, make_sequence


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
    np.testing.assert_allclose(sys_b.prev_rel, sys_a.prev_rel)
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

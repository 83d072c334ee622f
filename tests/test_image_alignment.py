"""Sparse image alignment: recover a known camera motion on a synthetic
textured plane (the TPU analog of the reference's manual alignment checks,
python/test_image_alignment.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdvo_tpu.align.image_alignment import AlignFeatures, SparseImageAlign
from sdvo_tpu.geometry import se3
from sdvo_tpu.geometry.se3 import SE3
from sdvo_tpu.geometry.camera import PinholeCamera
from sdvo_tpu.image.pyramid import build_pyramid
from sdvo_tpu.optim.optimizer import LMSettings

from synthetic import render_plane, smooth_texture

CAM = dict(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320, height=240)
PLANE_Z = 10.0


def _make_pair(rng, tau_rel):
    cam = PinholeCamera.create(**CAM, dtype=jnp.float64)
    tex = smooth_texture(rng, size=2048, blur=15)
    T_ref = SE3.identity(dtype=jnp.float64)
    T_cur = se3.exp(jnp.asarray(tau_rel))  # world->cur, world == ref cam
    img_ref = render_plane(tex, cam, T_ref, PLANE_Z)
    img_cur = render_plane(tex, cam, T_cur, PLANE_Z)
    return cam, img_ref, img_cur, T_cur


def _grid_features(cam, n=12, m=9, depth=PLANE_Z, dtype=jnp.float64):
    us = np.linspace(30, cam.width - 30, n)
    vs = np.linspace(30, cam.height - 30, m)
    uu, vv = np.meshgrid(us, vs)
    uv = jnp.asarray(np.stack([uu.ravel(), vv.ravel()], axis=-1), dtype)
    bearing = cam.backproject(uv)
    # plane at z = depth: point along bearing with z = depth
    pts_ref = bearing * (depth / bearing[:, 2:3])
    N = uv.shape[0]
    return AlignFeatures(
        uv_host=uv,
        host_idx=jnp.zeros((N,), jnp.int32),
        points_ref=pts_ref,
        valid=jnp.ones((N,), bool),
    )


@pytest.mark.parametrize(
    "tau_rel",
    [
        [0.05, 0.02, -0.03, 0.0, 0.0, 0.0],  # translation only
        [0.0, 0.0, 0.0, 0.004, -0.006, 0.01],  # rotation only
        [0.08, -0.04, 0.05, 0.005, 0.008, -0.01],  # general motion
    ],
)
def test_align_recovers_pose(rng, tau_rel):
    cam, img_ref, img_cur, T_cur = _make_pair(rng, tau_rel)
    pyr_ref = build_pyramid(img_ref, 4)
    pyr_cur = build_pyramid(img_cur, 4)
    feats = _grid_features(cam)

    aligner = SparseImageAlign(patch_size=5, min_level=0, max_level=3)
    host_pyr = [img[None] for img in pyr_ref.images]  # single host
    T0 = SE3.identity(dtype=jnp.float64)  # no motion prior
    T_est, rmse, status = aligner.align(
        T0, host_pyr, pyr_cur.images, feats, cam.fx, cam.fy, cam.cx, cam.cy
    )
    # T_cur_ref ground truth == T_cur (ref = world)
    err = np.asarray(se3.log(T_est.compose(T_cur.inverse())))
    # sub-millimeter translation, sub-0.01deg rotation
    assert np.linalg.norm(err[:3]) < 1e-2, (err, float(rmse))
    assert np.linalg.norm(err[3:]) < 1e-3, (err, float(rmse))


def test_align_two_hosts(rng):
    """Features split across two host frames (ref + last keyframe)."""
    tau = [0.06, 0.0, 0.04, 0.0, 0.004, 0.0]
    cam, img_ref, img_cur, T_cur = _make_pair(rng, tau)
    pyr_ref = build_pyramid(img_ref, 4)
    pyr_cur = build_pyramid(img_cur, 4)
    feats0 = _grid_features(cam)
    N = feats0.uv_host.shape[0]
    host_idx = jnp.asarray(np.arange(N) % 2, jnp.int32)  # alternate hosts
    feats = feats0._replace(host_idx=host_idx)
    # both hosts share the same image here (kf == ref) — exercises the
    # stacked-host gather path
    host_pyr = [jnp.stack([img, img]) for img in pyr_ref.images]
    aligner = SparseImageAlign(patch_size=5, min_level=0, max_level=3)
    T_est, rmse, _ = aligner.align(
        SE3.identity(dtype=jnp.float64), host_pyr, pyr_cur.images, feats,
        cam.fx, cam.fy, cam.cx, cam.cy,
    )
    err = np.asarray(se3.log(T_est.compose(T_cur.inverse())))
    assert np.linalg.norm(err) < 1e-2


def test_align_with_motion_prior_large_motion(rng):
    """Coarse-to-fine + prior handles a larger baseline."""
    tau = [0.25, 0.1, -0.15, 0.01, 0.02, -0.01]
    cam, img_ref, img_cur, T_cur = _make_pair(rng, tau)
    pyr_ref = build_pyramid(img_ref, 4)
    pyr_cur = build_pyramid(img_cur, 4)
    feats = _grid_features(cam)
    host_pyr = [img[None] for img in pyr_ref.images]
    aligner = SparseImageAlign(patch_size=5, min_level=0, max_level=3)
    T0 = se3.exp(jnp.asarray(tau) * 0.7)  # imperfect constant-velocity prior
    T_est, rmse, _ = aligner.align(
        T0, host_pyr, pyr_cur.images, feats, cam.fx, cam.fy, cam.cx, cam.cy
    )
    err = np.asarray(se3.log(T_est.compose(T_cur.inverse())))
    assert np.linalg.norm(err) < 1.2e-2


def test_align_invalid_features_ignored(rng):
    tau = [0.05, 0.0, 0.0, 0.0, 0.0, 0.0]
    cam, img_ref, img_cur, T_cur = _make_pair(rng, tau)
    pyr_ref = build_pyramid(img_ref, 4)
    pyr_cur = build_pyramid(img_cur, 4)
    feats0 = _grid_features(cam)
    N = feats0.uv_host.shape[0]
    # poison half the features with garbage but mark them invalid
    bad = np.zeros(N, dtype=bool)
    bad[::2] = True
    pts = np.array(feats0.points_ref)
    pts[bad] = [[1e6, 1e6, -5.0]]
    feats = feats0._replace(
        points_ref=jnp.asarray(pts), valid=jnp.asarray(~bad)
    )
    host_pyr = [img[None] for img in pyr_ref.images]
    aligner = SparseImageAlign(patch_size=5, min_level=0, max_level=3)
    T_est, rmse, _ = aligner.align(
        SE3.identity(dtype=jnp.float64), host_pyr, pyr_cur.images, feats,
        cam.fx, cam.fy, cam.cx, cam.cy,
    )
    err = np.asarray(se3.log(T_est.compose(T_cur.inverse())))
    assert np.linalg.norm(err) < 1e-2

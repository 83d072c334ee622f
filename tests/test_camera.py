"""Camera tests — pattern follows the reference's tests/test_camera.cpp:
project→inverse-project round trip (:83-103), boundary/containment tests incl.
pyramid levels (:132-174), undistortion golden check (:105-130)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdvo_tpu.geometry.camera import (
    PinholeCamera,
    pose_projection_jacobian,
    projection_jacobian,
    undistort_image,
)
from sdvo_tpu.geometry import se3

KITTI = dict(fx=721.5377, fy=721.5377, cx=609.5593, cy=172.854, width=1241, height=376)


def make_cam(dist=None):
    return PinholeCamera.create(**KITTI, dist=dist, dtype=jnp.float64)


def test_project_backproject_roundtrip(rng):
    cam = make_cam()
    pts = jnp.asarray(rng.uniform(low=[-5, -2, 4], high=[5, 2, 40], size=(100, 3)))
    uv = cam.project(pts)
    bearing = cam.backproject(uv)
    # bearing is unit and parallel to the point
    np.testing.assert_allclose(jnp.linalg.norm(bearing, axis=-1), 1.0, atol=1e-12)
    cos = jnp.sum(bearing * pts, axis=-1) / jnp.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-12)


def test_distortion_roundtrip(rng):
    cam = make_cam(dist=[-0.28, 0.07, 1e-4, -2e-4, 0.0])
    xy = jnp.asarray(rng.uniform(-0.3, 0.3, size=(50, 2)))
    xyd = cam.distort_normalized(xy)
    back = cam.undistort_normalized(xyd, iters=20)
    np.testing.assert_allclose(back, xy, atol=1e-8)


def test_is_in_frame_levels():
    cam = make_cam()
    uv = jnp.array([[0.0, 0.0], [1240.9, 375.9], [-1.0, 10.0], [620.0, 188.0], [1241.0, 100.0]])
    inside = cam.is_in_frame(uv)
    np.testing.assert_array_equal(inside, [True, True, False, True, False])
    # at level 2 with boundary: near-border points fall out
    inside2 = cam.is_in_frame(uv, boundary=2.0, level=2)
    np.testing.assert_array_equal(inside2, [False, False, False, True, False])


def test_projection_jacobian_vs_autodiff(rng):
    cam = make_cam()
    pts = jnp.asarray(rng.uniform(low=[-5, -2, 4], high=[5, 2, 40], size=(20, 3)))
    J = projection_jacobian(cam, pts)
    Jad = jax.vmap(jax.jacobian(lambda p: cam.project(p)))(pts)
    np.testing.assert_allclose(J, Jad, atol=1e-9)


def test_pose_projection_jacobian_vs_autodiff(rng):
    cam = make_cam()
    pts = jnp.asarray(rng.uniform(low=[-5, -2, 4], high=[5, 2, 40], size=(20, 3)))

    def f(tau, p):
        return cam.project(se3.exp(tau).apply(p))

    J = pose_projection_jacobian(cam, pts)
    Jad = jax.vmap(lambda p: jax.jacobian(f)(jnp.zeros(6, dtype=p.dtype), p))(pts)
    np.testing.assert_allclose(J, Jad, atol=1e-8)


def test_scaled_intrinsics_project_consistency(rng):
    cam = make_cam()
    pts = jnp.asarray(rng.uniform(low=[-5, -2, 4], high=[5, 2, 40], size=(10, 3)))
    uv0 = cam.project(pts)
    uv2 = cam.scaled(2).project(pts)
    np.testing.assert_allclose(uv2, uv0 / 4.0, atol=1e-10)


def test_undistort_image_identity():
    cam = make_cam()  # zero distortion -> identity remap
    img = np.random.default_rng(0).uniform(0, 255, size=(cam.height, cam.width)).astype(np.float32)
    out = undistort_image(img, cam)
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_K_invK():
    cam = make_cam()
    np.testing.assert_allclose(cam.K() @ cam.invK(), np.eye(3), atol=1e-12)

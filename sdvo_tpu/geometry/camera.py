"""Batched pinhole camera with 5-coefficient radial/tangential distortion.

From-scratch replacement for the reference's ``PinholeCamera``
(``src/pinhole_camera.cpp``): project (``:50-79``), inverse-project to the
normalized plane (``:81-106``), frame-containment tests incl. per-pyramid-level
(``:163-176``), and image undistortion via precomputed remap grids
(``:25-26,178-184``). All point ops are batched over arbitrary leading dims.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PinholeCamera(NamedTuple):
    fx: jax.Array  # scalars (0-d arrays) so the camera is a jit-friendly pytree
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    # OpenCV order (k1, k2, p1, p2, k3); zeros disable distortion — the
    # reference auto-disables when d0 ≈ 0 (src/pinhole_camera.cpp:27).
    dist: jax.Array  # (5,)
    width: int
    height: int

    @staticmethod
    def create(fx, fy, cx, cy, width, height, dist=None, dtype=jnp.float32) -> "PinholeCamera":
        d = jnp.zeros((5,), dtype) if dist is None else jnp.asarray(dist, dtype)
        return PinholeCamera(
            jnp.asarray(fx, dtype), jnp.asarray(fy, dtype),
            jnp.asarray(cx, dtype), jnp.asarray(cy, dtype), d, int(width), int(height),
        )

    @property
    def has_distortion(self) -> bool:
        # static check only valid for concrete arrays; in jit assume distortion
        return bool(np.any(np.abs(np.asarray(self.dist)) > 1e-12))

    def K(self) -> jax.Array:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx]),
                jnp.stack([z, self.fy, self.cy]),
                jnp.stack([z, z, o]),
            ]
        )

    def invK(self) -> jax.Array:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([1.0 / self.fx, z, -self.cx / self.fx]),
                jnp.stack([z, 1.0 / self.fy, -self.cy / self.fy]),
                jnp.stack([z, z, o]),
            ]
        )

    # -- distortion ---------------------------------------------------------
    def distort_normalized(self, xy: jax.Array) -> jax.Array:
        """Apply distortion on the normalized plane (..., 2) -> (..., 2)."""
        k1, k2, p1, p2, k3 = (self.dist[i] for i in range(5))
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return jnp.stack([xd, yd], axis=-1)

    def undistort_normalized(self, xy: jax.Array, iters: int = 8) -> jax.Array:
        """Invert distortion by fixed-point iteration (matches cv::undistortPoints)."""
        out = xy
        for _ in range(iters):
            k1, k2, p1, p2, k3 = (self.dist[i] for i in range(5))
            x, y = out[..., 0], out[..., 1]
            r2 = x * x + y * y
            radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
            dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
            dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
            out = jnp.stack([(xy[..., 0] - dx) / radial, (xy[..., 1] - dy) / radial], axis=-1)
        return out

    # -- projection ---------------------------------------------------------
    def project(self, pts_cam: jax.Array, with_distortion: bool = False) -> jax.Array:
        """Camera-frame 3D points (..., 3) -> pixel coords (..., 2).

        Reference ``PinholeCamera::project2d`` (src/pinhole_camera.cpp:50-79).
        """
        z = pts_cam[..., 2:3]
        xy = pts_cam[..., :2] / z
        if with_distortion:
            xy = self.distort_normalized(xy)
        u = self.fx * xy[..., 0] + self.cx
        v = self.fy * xy[..., 1] + self.cy
        return jnp.stack([u, v], axis=-1)

    def backproject(self, uv: jax.Array, with_distortion: bool = False) -> jax.Array:
        """Pixels (..., 2) -> unit bearing vectors (..., 3).

        Reference ``PinholeCamera::inverseProject2d`` (src/pinhole_camera.cpp:81-106)
        + the unit-normalization done in ``Feature`` (src/feature.cpp:14,33).
        """
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        xy = jnp.stack([x, y], axis=-1)
        if with_distortion:
            xy = self.undistort_normalized(xy)
        ones = jnp.ones_like(xy[..., :1])
        bearing = jnp.concatenate([xy, ones], axis=-1)
        return bearing / jnp.linalg.norm(bearing, axis=-1, keepdims=True)

    def normalized(self, uv: jax.Array) -> jax.Array:
        """Pixels -> normalized-plane homogeneous coords (..., 3) with z=1."""
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)

    # -- containment --------------------------------------------------------
    def is_in_frame(self, uv: jax.Array, boundary: float = 0.0, level: int = 0) -> jax.Array:
        """Boundary test, optionally at a coarser pyramid level where the image
        is ``2**level`` smaller (src/pinhole_camera.cpp:163-176)."""
        scale = 1.0 / (2.0**level)
        w = self.width * scale
        h = self.height * scale
        u, v = uv[..., 0] * scale, uv[..., 1] * scale
        return (u >= boundary) & (v >= boundary) & (u < w - boundary) & (v < h - boundary)

    def scaled(self, level: int) -> "PinholeCamera":
        """Intrinsics at pyramid level (coordinates divided by 2**level)."""
        s = 1.0 / (2.0**level)
        return PinholeCamera(
            self.fx * s, self.fy * s, self.cx * s, self.cy * s, self.dist,
            self.width >> level, self.height >> level,
        )


def projection_jacobian(cam: PinholeCamera, pts_cam: jax.Array) -> jax.Array:
    """Analytic d(uv)/d(p_cam) for the undistorted pinhole model: (..., 2, 3).

    The reference derives this symbolically (python/symbol.py) and hard-codes
    it in ``ImageAlignment::computeImageJac`` (src/image_alignment.cpp:194-248).
    """
    x, y, z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
    iz = 1.0 / z
    iz2 = iz * iz
    zeros = jnp.zeros_like(x)
    row_u = jnp.stack([cam.fx * iz, zeros, -cam.fx * x * iz2], axis=-1)
    row_v = jnp.stack([zeros, cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def pose_projection_jacobian(cam: PinholeCamera, pts_cam: jax.Array) -> jax.Array:
    """d(uv)/d(xi) for a right-perturbation T·exp(xi) of the world→camera pose,
    evaluated at the camera-frame point: (..., 2, 6), xi = [upsilon, omega].

    dp/dxi = [I | -p^] composed with the projection Jacobian — the 2×6 block the
    reference builds per patch pixel (src/image_alignment.cpp:171-189).
    """
    from sdvo_tpu.geometry.se3 import hat

    Jproj = projection_jacobian(cam, pts_cam)  # (..., 2, 3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pts_cam.dtype), pts_cam.shape[:-1] + (3, 3))
    dp = jnp.concatenate([eye, -hat(pts_cam)], axis=-1)  # (..., 3, 6)
    return Jproj @ dp


def build_undistort_maps(cam: PinholeCamera) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side precomputed remap grids (map_u, map_v), each (H, W), mapping
    undistorted pixel -> source pixel in the distorted image
    (reference precomputes cv::initUndistortRectifyMap, src/pinhole_camera.cpp:25-26).
    """
    H, W = cam.height, cam.width
    vv, uu = np.meshgrid(np.arange(H, dtype=np.float64), np.arange(W, dtype=np.float64), indexing="ij")
    uv = jnp.asarray(np.stack([uu, vv], axis=-1))
    xy = jnp.stack([(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1)
    xyd = cam.distort_normalized(xy)
    map_u = np.asarray(cam.fx * xyd[..., 0] + cam.cx)
    map_v = np.asarray(cam.fy * xyd[..., 1] + cam.cy)
    return map_u, map_v


def undistort_image(image: np.ndarray, cam: PinholeCamera) -> np.ndarray:
    """Host-side undistortion via bilinear remap (``PinholeCamera::undistortImage``,
    src/pinhole_camera.cpp:178-184)."""
    from scipy.ndimage import map_coordinates

    map_u, map_v = build_undistort_maps(cam)
    return map_coordinates(image.astype(np.float32), [map_v, map_u], order=1, mode="nearest")

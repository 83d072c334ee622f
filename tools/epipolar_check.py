#!/usr/bin/env python
"""Two-view epipolar sanity check (python/epipolar.py analog).

The reference cross-checks its E-matrix path against OpenCV AKAZE+FLANN; we
cross-check the vectorized 8-point RANSAC against a brute-force numpy 8-point
on synthetic correspondences. Run: python tools/epipolar_check.py [n_points]
"""

import sys

import numpy as np


def main(n=300):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from sdvo_tpu.geometry import se3
    from sdvo_tpu.geometry.essential import find_essential_ransac
    from sdvo_tpu.geometry.camera import PinholeCamera

    rng = np.random.default_rng(0)
    cam = PinholeCamera.create(721.5377, 721.5377, 609.5593, 172.854, 1241, 376, dtype=jnp.float64)
    pts = rng.uniform([-10, -4, 6], [10, 4, 50], (n, 3))
    T = se3.exp(jnp.asarray([0.4, 0.05, 0.25, 0.01, 0.02, 0.005]))
    uv_ref = cam.project(jnp.asarray(pts)) + rng.normal(size=(n, 2)) * 0.3
    uv_cur = cam.project(T.apply(jnp.asarray(pts))) + rng.normal(size=(n, 2)) * 0.3
    x_ref = cam.normalized(uv_ref)[:, :2]
    x_cur = cam.normalized(uv_cur)[:, :2]
    thr = (2.0 / float(cam.fx)) ** 2
    E, inl, count = find_essential_ransac(
        x_ref, x_cur, jnp.ones(n, bool), jax.random.PRNGKey(0), 256, thr
    )
    E_gt = np.asarray(se3.hat(T.translation) @ T.rotation)
    E_est = np.asarray(E)
    E_gt /= np.linalg.norm(E_gt)
    E_est /= np.linalg.norm(E_est)
    if np.sum(E_gt * E_est) < 0:
        E_est = -E_est
    print(f"inliers: {int(count)}/{n}")
    print(f"|E_est - E_gt|_F = {np.linalg.norm(E_est - E_gt):.5f}")
    assert int(count) > 0.8 * n and np.linalg.norm(E_est - E_gt) < 0.05
    print("OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)

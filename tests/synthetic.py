"""Synthetic scene rendering helpers shared by alignment/pipeline tests.

A textured plane at constant world depth is rendered into any camera pose by
ray-plane intersection + bilinear texture lookup — giving photometrically
consistent image pairs with exact ground-truth geometry (the role the
reference's real test images play, tests/test_data/images/)."""

import numpy as np
import jax.numpy as jnp

from sdvo_tpu.geometry.se3 import SE3
from sdvo_tpu.image.interp import bilinear_sample


def smooth_texture(rng, size=2048, blur=9):
    """Smooth random texture in [0, 255]."""
    tex = rng.uniform(0.0, 255.0, size=(size, size))
    k = np.hanning(blur)
    k /= k.sum()
    for axis in (0, 1):
        tex = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), axis, tex)
    # renormalize contrast
    tex = (tex - tex.min()) / (tex.max() - tex.min()) * 255.0
    return tex


def render_plane(texture, cam, T_wc: SE3, plane_z: float = 10.0, tex_scale: float = 40.0,
                 supersample: int = 2):
    """Render the plane z_w = plane_z textured by ``texture``.

    Texture coords: (x_w, y_w) * tex_scale + center. T_wc maps world→camera.
    Rendered with ``supersample``× oversampling + Gaussian pyrDown so image
    pairs are band-limited and photometrically consistent (pure bilinear
    lookup acts as a pose-dependent blur that biases alignment tests).
    Returns (H, W) jnp image.
    """
    from sdvo_tpu.image.pyramid import pyr_down

    s = int(supersample)
    H, W = cam.height * s, cam.width * s
    vv, uu = np.meshgrid(np.arange(H, dtype=np.float64), np.arange(W, dtype=np.float64), indexing="ij")
    # supersampled pixel grid maps to original pixel coords (u+0.?)/s
    uv = jnp.asarray(np.stack([uu, vv], axis=-1)).reshape(-1, 2) / s
    bearing_c = cam.backproject(uv)  # (HW, 3) unit, camera frame
    T_cw = T_wc.inverse()
    C = T_cw.translation  # camera center in world
    dirs_w = T_cw.rotate(bearing_c)  # ray directions in world
    lam = (plane_z - C[2]) / dirs_w[:, 2]
    pts_w = C[None, :] + lam[:, None] * dirs_w
    tex_c = texture.shape[0] / 2.0
    tex_uv = jnp.stack([pts_w[:, 0] * tex_scale + tex_c, pts_w[:, 1] * tex_scale + tex_c], axis=-1)
    vals, _ = bilinear_sample(jnp.asarray(texture), tex_uv)
    img = vals.reshape(H, W)
    for _ in range(max(s.bit_length() - 1, 0)):
        img = pyr_down(img)
    return img


def render_ridge(texture, cam, T_wc: SE3, z_near: float = 8.0, z_far: float = 14.0,
                 split_x: float = 0.0, tex_scale: float = 40.0, supersample: int = 2):
    """Render a two-depth scene: plane z=z_near for world x < split_x, plane
    z=z_far otherwise. Non-planar structure avoids the planar degeneracy of
    essential-matrix bootstrapping (a single plane makes E ill-posed)."""
    from sdvo_tpu.image.pyramid import pyr_down

    s = int(supersample)
    H, W = cam.height * s, cam.width * s
    vv, uu = np.meshgrid(np.arange(H, dtype=np.float64), np.arange(W, dtype=np.float64), indexing="ij")
    uv = jnp.asarray(np.stack([uu, vv], axis=-1)).reshape(-1, 2) / s
    bearing_c = cam.backproject(uv)
    T_cw = T_wc.inverse()
    C = T_cw.translation
    dirs_w = T_cw.rotate(bearing_c)
    lam_near = (z_near - C[2]) / dirs_w[:, 2]
    lam_far = (z_far - C[2]) / dirs_w[:, 2]
    p_near = C[None, :] + lam_near[:, None] * dirs_w
    p_far = C[None, :] + lam_far[:, None] * dirs_w
    use_near = p_near[:, 0] < split_x
    pts_w = jnp.where(use_near[:, None], p_near, p_far)
    tex_c = texture.shape[0] / 2.0
    tex_uv = jnp.stack([pts_w[:, 0] * tex_scale + tex_c, pts_w[:, 1] * tex_scale + tex_c], axis=-1)
    vals, _ = bilinear_sample(jnp.asarray(texture), tex_uv)
    img = vals.reshape(H, W)
    for _ in range(max(s.bit_length() - 1, 0)):
        img = pyr_down(img)
    return img

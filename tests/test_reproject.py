"""Close-view observation selection in map reprojection.

The reference picks, for each landmark, the keyframe observation whose viewing
ray makes the smallest angle with the current frame's ray, and refuses
observations at >= 60 deg (Point::getCloseViewObs, src/point.cpp:118-181).
These tests build a two-keyframe arena where the *most recent* observation is
a bad warp reference (40 deg away, wrong texture) and the older one is nearly
frontal, and assert the reprojector aligns off the frontal patch.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sdvo_tpu.geometry.se3 import SE3
from sdvo_tpu.mapping.arena import MapArena, PointType
from sdvo_tpu.mapping.reproject import reproject_map

H = W = 64
FX = FY = 50.0
CX = CY = 32.0
POINT_W = np.array([0.0, 0.0, 5.0])


def blob(u, v, sigma=2.0):
    yy, xx = np.mgrid[0:H, 0:W]
    return 100.0 * np.exp(-((xx - u) ** 2 + (yy - v) ** 2) / (2 * sigma**2))


def look_at_pose(center_w, target_w):
    """world→cam pose with the camera z-axis pointing at ``target_w``."""
    z = target_w - center_w
    z = z / np.linalg.norm(z)
    x = np.cross(np.array([0.0, 1.0, 0.0]), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])  # rows = camera axes in world coords
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = -R @ center_w
    return T


def make_arena():
    arena = MapArena(max_keyframes=2, max_points=8, max_features_per_kf=8)
    arena.intrinsics = (FX, FY, CX, CY)
    return arena


def project(T, p_w):
    p_c = T[:3, :3] @ p_w + T[:3, 3]
    return np.array([FX * p_c[0] / p_c[2] + CX, FY * p_c[1] / p_c[2] + CY])


def add_obs(arena, slot, img, uv, pt):
    """Add an observation with its cached reference patch (as System does)."""
    from sdvo_tpu.image.interp import bilinear_sample, padded_patch_and_gradients

    patch, gx, gy, ok = padded_patch_and_gradients(
        lambda q: bilinear_sample(jnp.asarray(img), q), jnp.asarray(uv[None]), 5
    )
    arena.add_features(
        slot, uv[None], np.array([pt]),
        np.asarray(patch), np.asarray(gx), np.asarray(gy), np.asarray(ok),
    )


def test_close_view_observation_wins_over_most_recent():
    arena = make_arena()
    # KF A (older, frame_id 0): nearly frontal view, correct blob texture
    T_a = np.eye(4)
    T_a[:3, 3] = np.array([-0.25, 0.0, 0.0])  # camera at (0.25, 0, 0)
    uv_a = project(T_a, POINT_W)
    slot_a = arena.add_keyframe(0, T_a, None)
    # KF B (newer, frame_id 1): 40 deg off, texture that would mislead
    ang = np.deg2rad(40.0)
    center_b = np.array([5 * np.sin(ang), 0.0, 5 - 5 * np.cos(ang)])
    T_b = look_at_pose(center_b, POINT_W)
    uv_b = project(T_b, POINT_W)
    slot_b = arena.add_keyframe(1, T_b, None)

    pt = arena.add_point(POINT_W, PointType.GOOD, observer_center_w=np.array([0.25, 0.0, 0.0]))

    # textures: A carries the blob at its observation; B carries a decoy blob
    # 3px away from its observation (a bad warp reference)
    img_a = blob(uv_a[0], uv_a[1])
    img_b = blob(uv_b[0] + 3.0, uv_b[1])
    cur = blob(CX, CY)  # current frame: identity pose, point projects to center
    add_obs(arena, slot_a, img_a, uv_a, pt)
    add_obs(arena, slot_b, img_b, uv_b, pt)

    T_cur = SE3(jnp.eye(3, dtype=jnp.float64), jnp.zeros(3, dtype=jnp.float64))
    res = reproject_map(T_cur, jnp.asarray(cur), arena, cell_size=30)

    assert res.n_trials == 1
    assert len(res.pt_slot) == 1 and res.pt_slot[0] == pt
    # converged onto the true projection — only possible off KF A's patch
    assert np.linalg.norm(res.uv[0] - np.array([CX, CY])) < 0.5


def test_observation_beyond_60_degrees_is_dropped():
    arena = make_arena()
    ang = np.deg2rad(70.0)
    center = np.array([5 * np.sin(ang), 0.0, 5 - 5 * np.cos(ang)])
    T = look_at_pose(center, POINT_W)
    slot = arena.add_keyframe(0, T, None)
    pt = arena.add_point(POINT_W, PointType.GOOD, observer_center_w=center)

    img = blob(CX, CY)
    add_obs(arena, slot, img, project(T, POINT_W), pt)
    T_cur = SE3(jnp.eye(3, dtype=jnp.float64), jnp.zeros(3, dtype=jnp.float64))
    res = reproject_map(T_cur, jnp.asarray(img), arena, cell_size=30)
    assert res.n_trials == 0


def test_point_normal_set_on_creation():
    arena = make_arena()
    c = np.array([0.0, 0.0, -1.0])
    pt = arena.add_point(POINT_W, PointType.CANDIDATE, observer_center_w=c)
    expect = (c - POINT_W) / np.linalg.norm(c - POINT_W)
    np.testing.assert_allclose(arena.pt_normal[pt], expect, atol=1e-12)

"""Shared profiling workload: rendered KITTI-geometry tracking inputs.

The per-stage profilers (profile_frame, profile_align_iters) time individual
kernels outside the System, so they build a standalone workload here — a
textured plane under a bounded trajectory with alignment features and ground
truth (formerly bench.build_inputs; bench.py now measures the full
DeviceSystem product path instead)."""

import numpy as np

H, W = 376, 1241
LEVELS = 4
N_FEATS = 256
N_MATCHES = 150
N_FILTERS = 512
CHUNK = 32

import jax.numpy as jnp  # noqa: E402

DTYPE = jnp.float32


def _np_se3_exp(tau):
    from scipy.linalg import expm

    up, om = tau[:3], tau[3:]
    xi = np.zeros((4, 4))
    xi[:3, :3] = [[0, -om[2], om[1]], [om[2], 0, -om[0]], [-om[1], om[0], 0]]
    xi[:3, 3] = up
    return expm(xi)


def build_inputs(rng):
    """Rendered textured-plane scene with a true camera trajectory so the LM
    loops do representative work. All construction is numpy; arrays move to
    device once."""
    from types import SimpleNamespace

    from sdvo_tpu.align.image_alignment import AlignFeatures
    from sdvo_tpu.dataio.synthetic import render_plane, smooth_texture

    fx = fy = 721.5377
    cx, cy = 609.5593, 172.854
    tex = smooth_texture(rng, size=4096, blur=13)
    plane_z = 15.0
    amp = np.asarray([0.35, 0.035, 0.22, 0.002, 0.006, 0.0015])

    cam = SimpleNamespace(fx=fx, fy=fy, cx=cx, cy=cy, width=W, height=H)

    class _NpPose:
        def __init__(self, T):
            self.rotation = T[:3, :3]
            self.translation = T[:3, 3]

    img_ref = render_plane(tex, cam, _NpPose(np.eye(4)), plane_z, supersample=1)
    frames, T_true = [], []
    for i in range(1, CHUNK + 1):
        T44 = _np_se3_exp(amp * np.sin(2.0 * np.pi * i / CHUNK))
        T_true.append(T44)
        frames.append(render_plane(tex, cam, _NpPose(T44), plane_z, supersample=1))
    images = jnp.asarray(np.stack(frames), DTYPE)

    uv = rng.uniform(30, [W - 30, H - 30], (N_FEATS, 2))
    x = (uv[:, 0] - cx) / fx
    y = (uv[:, 1] - cy) / fy
    b = np.stack([x, y, np.ones_like(x)], axis=-1)
    pts = b * plane_z
    feats = AlignFeatures(
        uv_host=jnp.asarray(uv, DTYPE),
        host_idx=jnp.zeros((N_FEATS,), jnp.int32),
        points_ref=jnp.asarray(pts, DTYPE),
        valid=jnp.ones((N_FEATS,), bool),
    )
    img_ref = jnp.asarray(img_ref, DTYPE)
    return img_ref, images, T_true, feats, (fx, fy, cx, cy)

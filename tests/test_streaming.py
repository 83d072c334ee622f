"""Device-resident streaming tracker: lax.scan over a chunk of frames."""

import numpy as np
import pytest
import jax.numpy as jnp

from tests.synthetic import *  # noqa: F401,F403  (fixtures if any)

pytestmark = pytest.mark.slow  # full e2e — excluded from `pytest -m 'not slow'`


def _np_se3_exp(tau):
    from scipy.linalg import expm

    up, om = np.asarray(tau[:3]), np.asarray(tau[3:])
    xi = np.zeros((4, 4))
    xi[:3, :3] = [[0, -om[2], om[1]], [om[2], 0, -om[0]], [-om[1], om[0], 0]]
    xi[:3, 3] = up
    return expm(xi)


def test_streaming_chunk_tracks_trajectory(rng):
    from types import SimpleNamespace

    import jax

    from sdvo_tpu.align.image_alignment import AlignFeatures, SparseImageAlign
    from sdvo_tpu.dataio.synthetic import render_plane, smooth_texture
    from sdvo_tpu.depth.filter import FilterBank
    from sdvo_tpu.geometry.se3 import SE3
    from sdvo_tpu.image.pyramid import build_pyramid
    from sdvo_tpu.pipeline.streaming import StreamingTracker

    H, W = 120, 160
    fx = fy = 120.0
    cx, cy = W / 2.0, H / 2.0
    plane_z = 10.0
    F = 5
    dtau = np.asarray([0.08, 0.01, 0.05, 0.001, 0.004, 0.0008])

    cam = SimpleNamespace(fx=fx, fy=fy, cx=cx, cy=cy, width=W, height=H)

    class _P:
        def __init__(self, T):
            self.rotation = T[:3, :3]
            self.translation = T[:3, 3]

    tex = smooth_texture(rng, size=1024, blur=9)
    ref_img = render_plane(tex, cam, _P(np.eye(4)), plane_z)
    frames = []
    T_true = []
    for i in range(1, F + 1):
        T44 = _np_se3_exp(dtau * i)
        T_true.append(T44)
        frames.append(render_plane(tex, cam, _P(T44), plane_z))
    images = jnp.asarray(np.stack(frames), jnp.float32)

    n_feats = 64
    uv = rng.uniform([20, 20], [W - 20, H - 20], (n_feats, 2))
    x = (uv[:, 0] - cx) / fx
    y = (uv[:, 1] - cy) / fy
    b = np.stack([x, y, np.ones_like(x)], axis=-1)
    pts = b * plane_z  # plane at z = plane_z in the ref camera frame
    feats = AlignFeatures(
        uv_host=jnp.asarray(uv, jnp.float32),
        host_idx=jnp.zeros((n_feats,), jnp.int32),
        points_ref=jnp.asarray(pts, jnp.float32),
        valid=jnp.ones((n_feats,), bool),
    )

    levels = 3
    ref_pyr = build_pyramid(jnp.asarray(ref_img, jnp.float32), levels)
    host_pyr = tuple(im[None] for im in ref_pyr.images)

    aligner = SparseImageAlign(patch_size=5, min_level=0, max_level=2)
    tracker = StreamingTracker(aligner, levels=levels)

    M = 32
    filters = FilterBank.empty(16, 49, jnp.float32)
    carry, outs = tracker.track_chunk(
        images, host_pyr, ref_pyr.base_gradient, feats,
        feats.uv_host[:M], jnp.ones((M,), bool),
        SE3.identity(dtype=jnp.float32), SE3.identity(dtype=jnp.float32),
        filters, fx, fy, cx, cy, 0,
    )
    jax.block_until_ready(outs)

    # every frame's estimated pose must match the ground-truth trajectory
    for i in range(F):
        t_est = np.asarray(outs.translations[i])
        t_gt = T_true[i][:3, 3]
        err = np.linalg.norm(t_est - t_gt)
        assert err < 0.06, f"frame {i}: |t_err| = {err}"
        R_est = np.asarray(outs.rotations[i])
        ang = np.arccos(np.clip((np.trace(R_est.T @ T_true[i][:3, :3]) - 1) / 2, -1, 1))
        assert ang < 0.01, f"frame {i}: rot err {ang}"

    # the final carry must equal the last frame's outputs (pose chain intact)
    np.testing.assert_allclose(
        np.asarray(carry.T_cur_ref.translation), np.asarray(outs.translations[-1])
    )

"""Multi-device tests on the virtual 8-device CPU mesh: seq-sharded batched
alignment and landmark-sharded distributed BA (psum Schur reduction) —
SURVEY §4's multi-host CI pattern."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdvo_tpu.align.image_alignment import AlignFeatures, SparseImageAlign
from sdvo_tpu.ba.bundle_adjustment import BAObservations, BASettings, build_point_table, local_ba
from sdvo_tpu.geometry import se3
from sdvo_tpu.geometry.se3 import SE3
from sdvo_tpu.geometry.camera import PinholeCamera
from sdvo_tpu.image.pyramid import build_pyramid
from sdvo_tpu.parallel.batched_vo import batched_align_step
from sdvo_tpu.parallel.dist_ba import distributed_local_ba, shard_observations
from sdvo_tpu.parallel.mesh import make_vo_mesh

from synthetic import render_plane, smooth_texture
from test_bundle_adjustment import _window_problem, _pose_err, FX, FY, CX, CY

pytestmark = pytest.mark.slow  # full e2e — excluded from `pytest -m 'not slow'`


def test_mesh_axes():
    mesh = make_vo_mesh(num_seq=4, num_shard=2)
    assert mesh.axis_names == ("seq", "shard")
    assert mesh.devices.shape == (4, 2)


def test_distributed_ba_matches_single_device(rng):
    poses_true, pts_true, poses_init, pts_init, obs, table = _window_problem(
        rng, noise_px=0.1, pose_noise=0.05, pt_noise=0.1
    )
    K, P = 5, 120
    fixed_cam = jnp.zeros((K,), bool).at[0].set(True).at[1].set(True)

    # single-device result
    poses_ref, pts_ref, _, chi_ref = local_ba(
        poses_init, pts_init, obs, table, fixed_cam, jnp.zeros((P,), bool),
        FX, FY, CX, CY, settings=BASettings(iterations=8), num_cams=K,
    )

    # sharded over 4 devices
    mesh = make_vo_mesh(num_seq=2, num_shard=4)
    cam_idx = np.asarray(obs.cam_idx)
    pt_idx = np.asarray(obs.pt_idx)
    uv = np.asarray(obs.uv)
    valid = np.asarray(obs.valid)
    s_cam, s_pt, s_uv, s_valid, s_table, s_points = shard_observations(
        cam_idx, pt_idx, uv, valid, P, 4, max_obs_per_point=K
    )
    pts_sharded = np.zeros((4, s_points.shape[1], 3))
    for s in range(4):
        for lp, p in enumerate(s_points[s]):
            if p >= 0:
                pts_sharded[s, lp] = np.asarray(pts_init)[p]

    poses_out, pts_out, chi, S_red = distributed_local_ba(
        poses_init, jnp.asarray(pts_sharded),
        jnp.asarray(s_cam), jnp.asarray(s_pt), jnp.asarray(s_uv),
        jnp.asarray(s_valid), jnp.asarray(s_table), fixed_cam,
        FX, FY, CX, CY, mesh=mesh, num_cams=K, iterations=8,
    )

    # distributed solution should land close to the single-device one
    for k in range(2, K):
        e = _pose_err(poses_out, poses_true, k)
        e_ref = _pose_err(poses_ref, poses_true, k)
        assert e < max(2.5 * e_ref, 5e-3), (k, e, e_ref)
    # sharded points map back and match
    pts_back = np.zeros((P, 3))
    for s in range(4):
        for lp, p in enumerate(s_points[s]):
            if p >= 0:
                pts_back[p] = np.asarray(pts_out)[s, lp]
    err = np.linalg.norm(pts_back - np.asarray(pts_ref), axis=-1)
    assert np.median(err) < 0.05, np.median(err)


def test_batched_alignment_over_sequences(rng):
    cam = PinholeCamera.create(320.0, 320.0, 160.0, 120.0, 320, 240, dtype=jnp.float64)
    mesh = make_vo_mesh(num_seq=8, num_shard=1)
    aligner = SparseImageAlign(patch_size=5, min_level=1, max_level=2)
    S = 8

    taus = [np.array([0.05, 0.01, -0.02, 0.002, -0.003, 0.001]) * (1 + 0.2 * s) for s in range(S)]
    host_stack = [[] for _ in range(3)]
    cur_stack = [[] for _ in range(3)]
    feats_list = []
    for s in range(S):
        tex = smooth_texture(np.random.default_rng(s), size=1024, blur=15)
        T_cur = se3.exp(jnp.asarray(taus[s]))
        img_ref = render_plane(tex, cam, SE3.identity(dtype=jnp.float64), 10.0, supersample=1)
        img_cur = render_plane(tex, cam, T_cur, 10.0, supersample=1)
        pyr_ref = build_pyramid(img_ref, 3)
        pyr_cur = build_pyramid(img_cur, 3)
        for l in range(3):
            host_stack[l].append(pyr_ref.images[l][None])
            cur_stack[l].append(pyr_cur.images[l])
        us = np.linspace(40, 280, 8)
        vs = np.linspace(40, 200, 6)
        uu, vv = np.meshgrid(us, vs)
        uv = jnp.asarray(np.stack([uu.ravel(), vv.ravel()], -1))
        bearing = cam.backproject(uv)
        pts = bearing * (10.0 / bearing[:, 2:3])
        feats_list.append(
            AlignFeatures(uv, jnp.zeros((48,), jnp.int32), pts, jnp.ones((48,), bool))
        )

    host_pyrs = tuple(jnp.stack(h) for h in host_stack)
    cur_pyrs = tuple(jnp.stack(c) for c in cur_stack)
    feats = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *feats_list)
    T0 = SE3.identity((S,), dtype=jnp.float64)

    step = batched_align_step(aligner, mesh, 3)
    T_out, rmse, status = step(
        step.place(T0), step.place(host_pyrs), step.place(cur_pyrs), step.place(feats),
        cam.fx, cam.fy, cam.cx, cam.cy,
    )
    for s in range(S):
        T_est = SE3(T_out.rotation[s], T_out.translation[s])
        T_gt = se3.exp(jnp.asarray(taus[s]))
        err = np.linalg.norm(np.asarray(se3.log(T_est.compose(T_gt.inverse()))))
        assert err < 0.05, (s, err)

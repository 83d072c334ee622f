"""Depth-filter tests: Vogiatzis update convergence, tau geometry, batched
epipolar search on the synthetic plane, full filter-bank loop."""

import jax
import jax.numpy as jnp
import numpy as np

from sdvo_tpu.depth.epipolar import affine_warp_matrix, epipolar_search
from sdvo_tpu.depth.filter import (
    FilterBank,
    compute_tau,
    init_filters,
    update_filters,
    vogiatzis_update,
)
from sdvo_tpu.geometry import se3
from sdvo_tpu.geometry.se3 import SE3
from sdvo_tpu.geometry.camera import PinholeCamera
from sdvo_tpu.image.interp import extract_patches

from synthetic import render_plane, smooth_texture

CAM = dict(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320, height=240)
PLANE_Z = 10.0


def test_vogiatzis_converges_with_consistent_measurements(rng):
    mu = jnp.asarray([0.2])  # inverse depth (true depth 5)
    var = jnp.asarray([0.05])
    a = jnp.asarray([10.0])
    b = jnp.asarray([10.0])
    max_inv = jnp.asarray([1.0])
    true_x = 0.25
    for _ in range(40):
        x = jnp.asarray([true_x + rng.normal() * 0.002])
        mu, var, a, b = vogiatzis_update(mu, var, a, b, x, jnp.asarray([0.002**2]), max_inv)
    assert abs(float(mu[0]) - true_x) < 0.005
    assert float(var[0]) < 1e-4
    # inlier ratio a/(a+b) grows
    assert float(a[0] / (a[0] + b[0])) > 0.7


def test_vogiatzis_outliers_raise_b(rng):
    mu = jnp.asarray([0.2])
    var = jnp.asarray([0.0001])
    a = jnp.asarray([10.0])
    b = jnp.asarray([10.0])
    max_inv = jnp.asarray([1.0])
    ratio0 = float(a[0] / (a[0] + b[0]))
    for _ in range(20):
        x = jnp.asarray([rng.uniform(0.0, 1.0)])  # uniform junk
        mu, var, a, b = vogiatzis_update(mu, var, a, b, x, jnp.asarray([0.001**2]), max_inv)
    ratio = float(a[0] / (a[0] + b[0]))
    assert ratio < ratio0  # outlier evidence accumulates


def test_compute_tau_geometry():
    # larger baseline -> smaller tau (better triangulation)
    bearing = jnp.asarray([[0.0, 0.0, 1.0]])
    depth = jnp.asarray([10.0])
    angle = jnp.arctan(1.0 / (2.0 * 320.0)) * 2.0
    taus = []
    for baseline in [0.1, 0.5, 2.0]:
        T = SE3(jnp.eye(3), jnp.asarray([baseline, 0.0, 0.0]))
        taus.append(abs(float(compute_tau(T, bearing, depth, angle)[0])))
    assert taus[0] > taus[1] > taus[2]


def _plane_setup(rng, tau_rel):
    cam = PinholeCamera.create(**CAM, dtype=jnp.float64)
    tex = smooth_texture(rng, size=2048, blur=15)
    T_ref = SE3.identity(dtype=jnp.float64)
    T_cur = se3.exp(jnp.asarray(tau_rel))
    img_ref = render_plane(tex, cam, T_ref, PLANE_Z)
    img_cur = render_plane(tex, cam, T_cur, PLANE_Z)
    return cam, img_ref, img_cur, T_cur


def test_epipolar_search_finds_true_depth(rng):
    cam, img_ref, img_cur, T_cur = _plane_setup(rng, [0.4, 0.0, 0.0, 0.0, 0.0, 0.0])
    n = 30
    uv = jnp.asarray(rng.uniform(60, [260, 180], size=(n, 2)))
    bearing = cam.backproject(uv)
    depth_true = PLANE_Z / bearing[:, 2]
    patches, _ = extract_patches(img_ref, uv, 7)

    F = n
    Tb = SE3(jnp.broadcast_to(T_cur.rotation, (F, 3, 3)), jnp.broadcast_to(T_cur.translation, (F, 3)))
    mu = 1.0 / (depth_true * rng.uniform(0.8, 1.2, size=n))  # imperfect prior
    band = 0.35 * mu
    depth_est, matched, best_uv = epipolar_search(
        Tb, img_cur, patches, bearing, mu, mu + band, jnp.maximum(mu - band, 1e-7),
        jnp.ones((n,), bool), cam.fx, cam.fy, cam.cx, cam.cy,
        patch_size=7, num_steps=64,
    )
    m = np.asarray(matched)
    assert m.mean() > 0.8
    rel_err = np.abs(np.asarray(depth_est) - np.asarray(depth_true)) / np.asarray(depth_true)
    assert np.median(rel_err[m]) < 0.02


def test_filter_bank_converges_over_frames(rng):
    cam = PinholeCamera.create(**CAM, dtype=jnp.float64)
    tex = smooth_texture(rng, size=2048, blur=15)
    T_ref = SE3.identity(dtype=jnp.float64)
    img_ref = render_plane(tex, cam, T_ref, PLANE_Z)

    n = 40
    uv = jnp.asarray(rng.uniform(60, [260, 180], size=(n, 2)))
    bearing = cam.backproject(uv)
    depth_true = np.asarray(PLANE_Z / bearing[:, 2])
    patches, _ = extract_patches(img_ref, uv, 7)

    bank = init_filters(
        uv, bearing, patches, kf_slot=0,
        depth_mean=jnp.asarray(12.0), depth_min=jnp.asarray(2.0),
        kf_counter=0, new_valid=jnp.ones((n,), bool), dtype=jnp.float64,
    )

    conv_mask = np.zeros(n, bool)
    mu_at_conv = np.zeros(n)
    for i, bx in enumerate([0.15, 0.3, 0.45, 0.6, 0.75]):
        tau = [bx, 0.0, 0.0, 0.0, 0.0, 0.0]
        T_cur = se3.exp(jnp.asarray(tau))
        img_cur = render_plane(tex, cam, T_cur, PLANE_Z)
        F = n
        Tb = SE3(jnp.broadcast_to(T_cur.rotation, (F, 3, 3)), jnp.broadcast_to(T_cur.translation, (F, 3)))
        bank, converged = update_filters(
            bank, Tb, img_cur, cam.fx, cam.fy, cam.cx, cam.cy,
            kf_counter=jnp.asarray(0), patch_size=7, num_steps=64,
        )
        c = np.asarray(converged)
        mu_at_conv[c & ~conv_mask] = np.asarray(bank.mu)[c & ~conv_mask]
        conv_mask |= c
    assert conv_mask.mean() > 0.5, conv_mask.mean()
    depth_est = 1.0 / mu_at_conv[conv_mask]
    rel = np.abs(depth_est - depth_true[conv_mask]) / depth_true[conv_mask]
    assert np.median(rel) < 0.05, np.median(rel)


def test_staleness_invalidates():
    bank = FilterBank.empty(8, 49, jnp.float64)
    bank = bank._replace(valid=jnp.ones((8,), bool))
    T = SE3.identity(dtype=jnp.float64)
    Tb = SE3(jnp.broadcast_to(T.rotation, (8, 3, 3)), jnp.broadcast_to(T.translation, (8, 3)))
    img = jnp.zeros((64, 64), jnp.float64)
    bank2, conv = update_filters(
        bank, Tb, img, 100.0, 100.0, 32.0, 32.0, kf_counter=jnp.asarray(10), staleness=5
    )
    assert not bool(jnp.any(bank2.valid))

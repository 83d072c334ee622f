"""Shifted patch stacks must reproduce the element-gather sampler bit-for-bit
(modulo float association) — they are the hot-path replacement for it."""

import numpy as np
import jax.numpy as jnp

from tests.synthetic import *  # noqa: F401,F403


def test_stack_matches_extract_patches(rng):
    from sdvo_tpu.image.interp import extract_patches
    from sdvo_tpu.image.stack import build_patch_stack, sample_patches

    H, W, P, N = 120, 160, 5, 64
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    uv = jnp.asarray(rng.uniform(10, [W - 10, H - 10], (N, 2)), jnp.float32)

    ref, ok_ref = extract_patches(img, uv, P)
    ps = build_patch_stack(img, P)
    got, ok = sample_patches(ps, uv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3)
    assert bool(jnp.all(ok))


def test_stack_gradients_match_padded_fetch(rng):
    from sdvo_tpu.image.interp import bilinear_sample, padded_patch_and_gradients
    from sdvo_tpu.image.stack import build_patch_stack, sample_patches_grad

    H, W, P, N = 120, 160, 5, 64
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    uv = jnp.asarray(rng.uniform(10, [W - 10, H - 10], (N, 2)), jnp.float32)

    ref_p, ref_gx, ref_gy, _ = padded_patch_and_gradients(
        lambda q: bilinear_sample(img, q), uv, P
    )
    ps = build_patch_stack(img, P)
    p, gx, gy, ok = sample_patches_grad(ps, uv)
    np.testing.assert_allclose(np.asarray(p), np.asarray(ref_p), atol=5e-3)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ref_gx), atol=5e-3)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(ref_gy), atol=5e-3)
    assert bool(jnp.all(ok))


def test_stack_multi_host_selection(rng):
    from sdvo_tpu.image.stack import build_patch_stack_multi, sample_patches_multi

    H, W, P, N = 60, 80, 5, 32
    imgs = jnp.asarray(rng.uniform(0, 255, (2, H, W)), jnp.float32)
    uv = jnp.asarray(rng.uniform(10, [W - 10, H - 10], (N, 2)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 2, (N,)), jnp.int32)

    ps = build_patch_stack_multi(imgs, P)
    vals, ok = sample_patches_multi(ps, idx, uv)

    from sdvo_tpu.image.interp import extract_patches

    v0, _ = extract_patches(imgs[0], uv, P)
    v1, _ = extract_patches(imgs[1], uv, P)
    expect = jnp.where((idx == 0)[:, None], v0, v1)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(expect), atol=5e-3)


def test_warp_ref_patch_identity(rng):
    from sdvo_tpu.depth.epipolar import warp_ref_patches

    F, P = 16, 7
    patches = jnp.asarray(rng.uniform(0, 255, (F, P * P)), jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (F, 2, 2))
    out = warp_ref_patches(patches, eye, P)
    np.testing.assert_allclose(np.asarray(out), np.asarray(patches), atol=5e-3)


def test_warp_ref_patch_shift(rng):
    """A pure scaling A⁻¹ = 0.5·I shrinks the sampling grid: the warped patch
    equals the patch bilinearly sampled at half-offsets."""
    from sdvo_tpu.depth.epipolar import warp_ref_patches

    P = 5
    grid = np.arange(P * P, dtype=np.float32).reshape(P, P)
    patches = jnp.asarray(grid.reshape(1, -1))
    A_inv = jnp.asarray([[[0.5, 0.0], [0.0, 0.5]]], jnp.float32)
    out = np.asarray(warp_ref_patches(patches, A_inv, P)).reshape(P, P)
    # center pixel unchanged
    assert abs(out[P // 2, P // 2] - grid[P // 2, P // 2]) < 1e-4
    # corner: sampled at offset (-1, -1) from center instead of (-2, -2)
    assert abs(out[0, 0] - grid[1, 1]) < 1e-4

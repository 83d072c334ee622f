"""Window sampler must reproduce the shifted-patch-stack sampler bit-for-bit
(both implement exact bilinear interpolation + central-difference gradients)."""

import jax.numpy as jnp
import numpy as np

from sdvo_tpu.image.stack import build_patch_stack, sample_patches, sample_patches_grad
from sdvo_tpu.ops.window_sampler import (
    extract_windows,
    sample_windows,
    sample_windows_grad,
    window_origins,
)

P = 5
WIN = 16


def _setup(rng):
    img = jnp.asarray(rng.uniform(0, 255, (120, 160)), jnp.float32)
    uv = jnp.asarray(rng.uniform(12, [160 - 12, 120 - 12], (64, 2)), jnp.float32)
    origins, ok = window_origins(uv, WIN, 160, 120)
    assert bool(jnp.all(ok))
    windows = extract_windows(img, origins, WIN)
    offs = uv - origins.astype(jnp.float32)
    return img, uv, windows, offs


def test_sample_matches_stack(rng):
    img, uv, windows, offs = _setup(rng)
    stack = build_patch_stack(img, P)
    vals_stack, ok_s = sample_patches(stack, uv)
    vals_win, ok_w = sample_windows(windows, offs, P)
    np.testing.assert_allclose(np.asarray(vals_win), np.asarray(vals_stack), atol=1e-3)
    assert bool(jnp.all(ok_w))


def test_grad_matches_stack(rng):
    img, uv, windows, offs = _setup(rng)
    stack = build_patch_stack(img, P)
    v_s, gx_s, gy_s, _ = sample_patches_grad(stack, uv)
    v_w, gx_w, gy_w, ok = sample_windows_grad(windows, offs, P)
    np.testing.assert_allclose(np.asarray(v_w), np.asarray(v_s), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gx_w), np.asarray(gx_s), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gy_w), np.asarray(gy_s), atol=1e-3)
    assert bool(jnp.all(ok))


def test_out_of_window_flagged(rng):
    img, uv, windows, offs = _setup(rng)
    far = offs + jnp.asarray([WIN, 0.0], jnp.float32)
    _, ok = sample_windows(windows, far, P)
    assert not bool(jnp.any(ok))


def test_window_gather_matches_stack(rng):
    """Block-aligned row-gather extraction must sample identically."""
    from sdvo_tpu.ops.window_sampler import window_gather

    img = jnp.asarray(rng.uniform(0, 255, (120, 165)), jnp.float32)  # W%16 != 0
    uv = jnp.asarray(rng.uniform(14, [165 - 14, 120 - 14], (64, 2)), jnp.float32)
    windows, origin, ok = window_gather(img, uv, win_h=WIN)
    assert bool(jnp.all(ok))
    offs = uv - origin
    v_w, gx_w, gy_w, ok_s = sample_windows_grad(windows, offs, P)
    stack = build_patch_stack(img, P)
    v_s, gx_s, gy_s, _ = sample_patches_grad(stack, uv)
    assert bool(jnp.all(ok_s))
    np.testing.assert_allclose(np.asarray(v_w), np.asarray(v_s), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gx_w), np.asarray(gx_s), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gy_w), np.asarray(gy_s), atol=1e-3)

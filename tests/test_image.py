"""Image pyramid + interpolation tests (reference pattern:
tests/test_image_pyramid.cpp; pyrDown golden vs scipy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdvo_tpu.image.pyramid import abs_gradient_saturated_sum, build_pyramid, pyr_down
from sdvo_tpu.image.interp import bilinear_sample, extract_patches, patch_offsets


def test_abs_gradient(rng):
    img = jnp.asarray(rng.integers(0, 255, size=(32, 40)).astype(np.float64))
    g = abs_gradient_saturated_sum(img)
    i = np.asarray(img)
    expected = np.zeros_like(i)
    expected[1:-1, 1:-1] = np.minimum(
        np.abs(i[1:-1, 2:] - i[1:-1, :-2]) + np.abs(i[2:, 1:-1] - i[:-2, 1:-1]), 255.0
    )
    np.testing.assert_allclose(np.asarray(g)[1:-1, 1:-1], expected[1:-1, 1:-1], atol=1e-9)
    # borders are zero
    assert float(jnp.max(g[0])) == 0.0 and float(jnp.max(g[:, -1])) == 0.0


def test_pyrdown_matches_scipy_gaussian(rng):
    from scipy.ndimage import correlate1d

    img = rng.uniform(0, 255, size=(64, 80))
    k = np.array([1, 4, 6, 4, 1]) / 16.0
    blurred = correlate1d(correlate1d(img, k, axis=0, mode="mirror"), k, axis=1, mode="mirror")
    expected = blurred[::2, ::2]
    got = np.asarray(pyr_down(jnp.asarray(img)))
    np.testing.assert_allclose(got, expected, atol=1e-9)


def test_pyrdown_odd_size(rng):
    img = jnp.asarray(rng.uniform(0, 255, size=(37, 41)))
    out = pyr_down(img)
    assert out.shape == (19, 21)  # ceil(n/2), as cv::pyrDown


def test_build_pyramid_shapes(rng):
    img = jnp.asarray(rng.uniform(0, 255, size=(376, 1241)))
    pyr = build_pyramid(img, 4)
    assert pyr.num_levels == 4
    assert pyr.image_at(0).shape == (376, 1241)
    assert pyr.image_at(1).shape == (188, 621)
    assert pyr.image_at(3).shape == (47, 156)
    assert pyr.gradient_at(2).shape == pyr.image_at(2).shape


def test_bilinear_exact_on_linear_ramp():
    H, W = 16, 20
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = jnp.asarray(2.0 * xx + 3.0 * yy + 1.0)
    uv = jnp.asarray([[3.25, 4.75], [0.5, 0.5], [18.9, 14.1]])
    vals, ok = bilinear_sample(img, uv)
    expected = 2.0 * uv[:, 0] + 3.0 * uv[:, 1] + 1.0
    np.testing.assert_allclose(vals, expected, atol=1e-9)
    assert bool(jnp.all(ok))


def test_bilinear_out_of_bounds():
    img = jnp.ones((8, 8))
    uv = jnp.asarray([[-0.5, 3.0], [7.5, 3.0], [3.0, 7.0], [6.99, 6.99]])
    _, ok = bilinear_sample(img, uv)
    np.testing.assert_array_equal(np.asarray(ok), [False, False, False, True])


def test_patch_offsets_center():
    offs = np.asarray(patch_offsets(5))
    assert offs.shape == (25, 2)
    assert offs.min() == -2 and offs.max() == 2
    assert tuple(offs[12]) == (0.0, 0.0)  # center pixel at the middle index


def test_extract_patches_integer_centers(rng):
    img = jnp.asarray(rng.uniform(0, 255, size=(32, 32)))
    centers = jnp.asarray([[10.0, 12.0], [5.0, 5.0]])
    patches, ok = extract_patches(img, centers, 5)
    assert patches.shape == (2, 25)
    assert bool(jnp.all(ok))
    expected = np.asarray(img)[10:15, 8:13].ravel()
    np.testing.assert_allclose(patches[0], expected, atol=1e-9)

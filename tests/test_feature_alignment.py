"""Batched 2D feature alignment: recover known per-feature shifts on gradient
images (the role FeatureAlignment plays inside Map::reprojectCell)."""

import jax.numpy as jnp
import numpy as np

from sdvo_tpu.align.feature_alignment import align_features_2d
from sdvo_tpu.image.pyramid import abs_gradient_saturated_sum
from sdvo_tpu.image.interp import bilinear_sample

from synthetic import smooth_texture


def _shifted_pair(rng, shift, size=240):
    tex = smooth_texture(rng, size=512, blur=11)
    ref = jnp.asarray(tex[100 : 100 + size, 100 : 100 + size])
    yy, xx = np.meshgrid(np.arange(size, dtype=np.float64), np.arange(size, dtype=np.float64), indexing="ij")
    uv = jnp.asarray(np.stack([xx + shift[0], yy + shift[1]], axis=-1)).reshape(-1, 2)
    cur, _ = bilinear_sample(jnp.asarray(tex), uv + jnp.asarray([100.0, 100.0]))
    cur = cur.reshape(size, size)
    return ref, cur


def test_recover_translation(rng):
    # ~1px initial offset, as reprojection provides in the pipeline
    shift = (1.2, -0.8)
    ref, cur = _shifted_pair(rng, shift)
    gref = abs_gradient_saturated_sum(ref)
    gcur = abs_gradient_saturated_sum(cur)
    n = 40
    uv_ref = jnp.asarray(rng.uniform(30, 210, size=(n, 2)))
    uv_init = uv_ref  # start at the unshifted position
    valid = jnp.ones((n,), bool)
    uv_out, err, conv = align_features_2d(gref, gcur, uv_ref, uv_init, valid)
    # cur(u) = ref(u + s): a feature at uv in ref appears at uv - s in cur.
    expected = np.asarray(uv_ref) - np.asarray(shift)
    d = np.linalg.norm(np.asarray(uv_out) - expected, axis=-1)
    # the pipeline gates on alignment error (src/map.cpp:538) — low-error
    # results must be at the right position, and most features must qualify
    low_err = np.asarray(err) < 3.0
    assert float(np.mean(low_err)) > 0.6, np.median(np.asarray(err))
    assert float(np.mean(d[low_err] < 0.3)) > 0.9, (d[low_err], err)


def test_illumination_offset_tolerated(rng):
    shift = (0.9, 0.6)
    ref, cur = _shifted_pair(rng, shift)
    gref = abs_gradient_saturated_sum(ref)
    gcur = abs_gradient_saturated_sum(cur) + 12.0  # constant gradient-domain offset
    n = 30
    uv_ref = jnp.asarray(rng.uniform(30, 210, size=(n, 2)))
    uv_out, err, conv = align_features_2d(gref, gcur, uv_ref, uv_ref, jnp.ones((n,), bool))
    expected = np.asarray(uv_ref) - np.asarray(shift)
    d = np.linalg.norm(np.asarray(uv_out) - expected, axis=-1)
    assert float(np.mean(d < 0.3)) > 0.6, np.median(d)


def test_invalid_features_masked(rng):
    ref, cur = _shifted_pair(rng, (1.0, 1.0))
    gref = abs_gradient_saturated_sum(ref)
    gcur = abs_gradient_saturated_sum(cur)
    uv_ref = jnp.asarray([[50.0, 50.0], [120.0, 80.0]])
    valid = jnp.asarray([True, False])
    uv_out, err, conv = align_features_2d(gref, gcur, uv_ref, uv_ref, valid)
    assert bool(conv[0]) and not bool(conv[1])
    # masked feature's position unchanged
    np.testing.assert_allclose(uv_out[1], uv_ref[1], atol=1e-9)


def test_border_features_not_converged(rng):
    ref, cur = _shifted_pair(rng, (1.0, 1.0))
    gref = abs_gradient_saturated_sum(ref)
    gcur = abs_gradient_saturated_sum(cur)
    uv_ref = jnp.asarray([[1.0, 1.0], [239.0, 239.0]])
    uv_out, err, conv = align_features_2d(gref, gcur, uv_ref, uv_ref, jnp.ones((2,), bool))
    assert not bool(conv[0]) and not bool(conv[1])

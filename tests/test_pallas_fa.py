"""Fused Pallas feature-alignment kernel vs the XLA batched path (interpret
mode on CPU — the same kernel compiles with Mosaic on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdvo_tpu.align.feature_alignment import align_features_2d_cached
from sdvo_tpu.image.pyramid import abs_gradient_saturated_sum
from sdvo_tpu.image.stack import build_patch_stack, sample_patches_grad

from test_feature_alignment import _shifted_pair


def _problem(rng, shift, n=48):
    ref, cur = _shifted_pair(rng, shift)
    gref = abs_gradient_saturated_sum(ref).astype(jnp.float32)
    gcur = abs_gradient_saturated_sum(cur).astype(jnp.float32)
    uv_ref = jnp.asarray(rng.uniform(30, 210, size=(n, 2)), jnp.float32)
    stack = build_patch_stack(gref, 5)
    ref_patch, gx, gy, ok = sample_patches_grad(stack, uv_ref)
    live = jnp.asarray(ok)
    return gcur, ref_patch, gx, gy, uv_ref, live


@pytest.mark.slow  # interpret-mode kernel / full viz run — minutes on CPU
def test_pallas_fa_matches_xla(rng):
    shift = (1.2, -0.8)
    gcur, ref_patch, gx, gy, uv_ref, live = _problem(rng, shift)
    args = (gcur, ref_patch, gx, gy, uv_ref, live)
    uv_x, err_x, conv_x = align_features_2d_cached(*args, backend="xla")
    uv_p, err_p, conv_p = align_features_2d_cached(*args, backend="pallas")

    cx = np.asarray(conv_x)
    cp = np.asarray(conv_p)
    # converged sets agree on ≥90% of features (LM accept/reject boundaries
    # may flip individual marginal features between implementations)
    assert float(np.mean(cx == cp)) > 0.9, (cx.sum(), cp.sum())
    both = cx & cp
    assert both.sum() >= max(3, int(0.5 * max(cx.sum(), 1)))
    d = np.linalg.norm(np.asarray(uv_x) - np.asarray(uv_p), axis=-1)
    assert float(np.median(d[both])) < 0.05, np.median(d[both])
    # and both land at the true shifted position
    expected = np.asarray(uv_ref) - np.asarray(shift)
    for uv, conv in ((uv_x, cx), (uv_p, cp)):
        dd = np.linalg.norm(np.asarray(uv) - expected, axis=-1)
        good = conv & (np.asarray(err_x) < 3.0)
        assert float(np.mean(dd[good] < 0.3)) > 0.8, dd[good]


def test_pallas_fa_masks_dead(rng):
    gcur, ref_patch, gx, gy, uv_ref, live = _problem(rng, (0.5, 0.5))
    uv_p, err_p, conv_p = align_features_2d_cached(
        gcur, ref_patch, gx, gy, uv_ref, jnp.zeros_like(live), backend="pallas"
    )
    assert not bool(np.any(np.asarray(conv_p)))
    assert np.all(np.isfinite(np.asarray(uv_p)))

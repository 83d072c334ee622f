"""Feature detection (SSC + grid) and batched pyramidal KLT tests (reference
pattern: tests/test_feature_selection.cpp)."""

import jax.numpy as jnp
import numpy as np

from sdvo_tpu.features.detection import (
    FeatureSelection,
    detect_gradient_by_value,
    gradient_magnitude_with_ssc,
)
from sdvo_tpu.features import ssc as ssc_mod
from sdvo_tpu.features.klt import optical_flow_with_gate, pyramidal_klt
from sdvo_tpu.image.pyramid import abs_gradient_saturated_sum, build_pyramid
from sdvo_tpu.image.interp import bilinear_sample

from synthetic import smooth_texture


def test_native_library_loaded():
    # the native C++ path must be present in the build environment
    assert ssc_mod.have_native()


def test_ssc_native_matches_python(rng):
    n = 800
    xs = rng.uniform(0, 640, n).astype(np.float32)
    ys = rng.uniform(0, 480, n).astype(np.float32)
    # sorted by synthetic response already (SSC assumes sorted input)
    sel_native = ssc_mod.ssc_select(xs, ys, 150, 0.1, 640, 480)
    sel_py = ssc_mod._ssc_python(xs, ys, 150, 0.1, 640, 480)
    np.testing.assert_array_equal(sel_native, sel_py)
    assert 100 <= len(sel_native) <= 200


def test_ssc_spatial_spread(rng):
    n = 2000
    xs = rng.uniform(0, 640, n).astype(np.float32)
    ys = rng.uniform(0, 480, n).astype(np.float32)
    sel = ssc_mod.ssc_select(xs, ys, 200, 0.1, 640, 480)
    # selected points should cover a good fraction of a coarse grid
    gx = (xs[sel] // 80).astype(int)
    gy = (ys[sel] // 80).astype(int)
    cells = set(zip(gx.tolist(), gy.tolist()))
    assert len(cells) >= 40  # of 48 cells


def test_detector_with_ssc(rng):
    tex = smooth_texture(rng, size=512, blur=7)
    img = jnp.asarray(tex[:376, :500])
    grad = np.asarray(abs_gradient_saturated_sum(img))
    feats, occ = gradient_magnitude_with_ssc(grad, 50, 200, cell_size=30)
    assert 30 <= len(feats.uv) <= 240
    # all responses above threshold
    assert np.all(feats.response > 50)
    # one per cell: no duplicate cells
    cells = set(map(tuple, (feats.uv // 30).astype(int).tolist()))
    assert len(cells) == len(feats.uv)


def test_occupancy_respected(rng):
    tex = smooth_texture(rng, size=512, blur=7)
    img = jnp.asarray(tex[:300, :300])
    grad = np.asarray(abs_gradient_saturated_sum(img))
    fs = FeatureSelection(300, 300, 30)
    existing = np.array([[45.0, 45.0], [75.0, 100.0]])
    fs.set_existing_features(existing)
    feats = fs.detect_with_ssc(grad, 40, 100)
    cells = (feats.uv // 30).astype(int)
    assert not any((c == [1, 1]).all() for c in cells)
    assert not any((c == [2, 3]).all() for c in cells)


def test_detect_by_value_device(rng):
    tex = smooth_texture(rng, size=512, blur=7)
    img = jnp.asarray(tex[:240, :360])
    grad = abs_gradient_saturated_sum(img)
    uv, resp, valid = detect_gradient_by_value(grad, 40.0, 30)
    assert uv.shape == (8 * 12, 2)
    uv_np, resp_np, valid_np = map(np.asarray, (uv, resp, valid))
    g = np.asarray(grad)
    for i in np.nonzero(valid_np)[0][:20]:
        x, y = uv_np[i].astype(int)
        assert g[y, x] == resp_np[i]
        assert resp_np[i] > 40.0


def test_klt_recovers_shift(rng):
    tex = smooth_texture(rng, size=1024, blur=9)
    size = 320
    ref = jnp.asarray(tex[200 : 200 + size, 200 : 200 + size])
    shift = (6.4, -3.7)
    yy, xx = np.meshgrid(np.arange(size, dtype=np.float64), np.arange(size, dtype=np.float64), indexing="ij")
    uv = jnp.asarray(np.stack([xx + shift[0] + 200, yy + shift[1] + 200], axis=-1)).reshape(-1, 2)
    cur = bilinear_sample(jnp.asarray(tex), uv)[0].reshape(size, size)

    pyr_ref = build_pyramid(ref, 4)
    pyr_cur = build_pyramid(cur, 4)
    n = 50
    uv_ref = jnp.asarray(rng.uniform(40, size - 40, size=(n, 2)))
    uv_cur, status, err = pyramidal_klt(pyr_ref.images, pyr_cur.images, uv_ref, window=11)
    flow = np.asarray(uv_cur - uv_ref)
    good = np.asarray(status)
    assert good.mean() > 0.8
    med = np.median(flow[good], axis=0)
    np.testing.assert_allclose(med, [-shift[0], -shift[1]], atol=0.1)


def test_flow_gate(rng):
    tex = smooth_texture(rng, size=1024, blur=9)
    size = 320
    ref = jnp.asarray(tex[200 : 200 + size, 200 : 200 + size])
    pyr = build_pyramid(ref, 4)
    n = 30
    uv_ref = jnp.asarray(rng.uniform(40, size - 40, size=(n, 2)))
    valid = jnp.ones((n,), bool)
    # zero motion -> no baseline
    _, _, med, enough = optical_flow_with_gate(pyr.images, pyr.images, uv_ref, valid)
    assert float(med) < 1.0 and not bool(enough)

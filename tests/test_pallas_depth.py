"""Fused depth-filter scoring kernel vs the XLA sampling+ZSSD path
(interpret mode on CPU — the same kernel compiles with Mosaic on TPU)."""

import jax.numpy as jnp
import numpy as np

from sdvo_tpu.depth.epipolar import zssd_score
from sdvo_tpu.ops.pallas_depth import depth_scores
from sdvo_tpu.ops.window_sampler import sample_windows, window_gather


def test_depth_scores_match_xla(rng):
    F, K, P = 37, 16, 7
    H, W = 120, 320
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    locs = jnp.asarray(rng.uniform(20, [W - 20, H - 20], (F, K, 2)), jnp.float32)
    ref = jnp.asarray(rng.uniform(0, 255, (F, P * P)), jnp.float32)

    locs_f = locs.reshape(F * K, 2)
    win, org, ok_w = window_gather(img, locs_f, win_h=P + 5)
    vals, ok_s = sample_windows(win, locs_f - org, P)
    want = zssd_score(ref[:, None, :], vals.reshape(F, K, P * P))

    cref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    cref_rep = jnp.repeat(cref, K, axis=0)
    sc, ok_k = depth_scores(
        win.reshape(F * K, -1), cref_rep, locs_f - org,
        patch=P, win_h=P + 5, win_w=win.shape[-1], block=256, interpret=True,
    )
    got = sc.reshape(F, K)
    both = np.asarray(ok_s.reshape(F, K)) & np.asarray(ok_k.reshape(F, K))
    assert both.mean() > 0.9
    np.testing.assert_allclose(
        np.asarray(got)[both], np.asarray(want)[both], rtol=1e-4, atol=0.05
    )
    # the kernel's support mask is at most 1 px stricter than the XLA one
    assert not np.any(np.asarray(ok_k.reshape(F, K)) & ~np.asarray(ok_s.reshape(F, K)))

#!/usr/bin/env python
"""Per-stage timing of the frame step at KITTI geometry — identifies which
device kernel dominates so optimization effort goes to the right place.

Run on the real device:  python tools/profile_frame.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

import bench as B


def timeit(fn, args, n=50, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) * 1e3
    print(f"{name:32s} {dt:8.3f} ms")
    return dt


def main():
    from sdvo_tpu.align.feature_alignment import align_features_2d
    from sdvo_tpu.align.image_alignment import SparseImageAlign
    from sdvo_tpu.depth.filter import FilterBank, update_filters
    from sdvo_tpu.geometry.se3 import SE3
    from sdvo_tpu.image.pyramid import build_pyramid

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    img_ref, img_cur, feats, T0, (fx, fy, cx, cy) = B.build_inputs(rng)
    aligner = SparseImageAlign(patch_size=5, min_level=0, max_level=3)
    DTYPE = B.DTYPE
    LEVELS = B.LEVELS
    N_MATCHES = B.N_MATCHES
    N_FILTERS = B.N_FILTERS
    W, H = B.W, B.H

    pyr_fn = jax.jit(lambda im: build_pyramid(im, LEVELS))
    ref_pyr = jax.block_until_ready(pyr_fn(img_ref))
    cur_pyr = jax.block_until_ready(pyr_fn(img_cur))

    filters = FilterBank.empty(N_FILTERS, 49, DTYPE)
    filters = filters._replace(
        uv_ref=jnp.asarray(rng.uniform(30, [W - 30, H - 30], (N_FILTERS, 2)), DTYPE),
        mu=jnp.asarray(rng.uniform(0.05, 0.3, N_FILTERS), DTYPE),
        var=jnp.full((N_FILTERS,), 0.01, DTYPE),
        max_inv_depth=jnp.full((N_FILTERS,), 0.5, DTYPE),
        valid=jnp.ones((N_FILTERS,), bool),
    )
    b = np.stack(
        [
            (np.asarray(filters.uv_ref[:, 0]) - cx) / fx,
            (np.asarray(filters.uv_ref[:, 1]) - cy) / fy,
            np.ones(N_FILTERS),
        ],
        axis=-1,
    )
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    filters = filters._replace(bearing_ref=jnp.asarray(b, DTYPE))
    T_rel = SE3(
        jnp.broadcast_to(jnp.eye(3, dtype=DTYPE), (N_FILTERS, 3, 3)),
        jnp.broadcast_to(jnp.asarray([0.3, 0.0, 0.5], DTYPE), (N_FILTERS, 3)),
    )

    # --- stages, each its own jit ------------------------------------------
    t_pyr = timeit(pyr_fn, (img_cur,), name="pyramid build (4 levels)")

    host_pyr = tuple(r[None] for r in ref_pyr.images)
    align_fn = jax.jit(
        lambda T0_, feats_, cur_imgs: aligner._align_impl(
            T0_, host_pyr, cur_imgs, feats_,
            jnp.asarray(fx, DTYPE), jnp.asarray(fy, DTYPE),
            jnp.asarray(cx, DTYPE), jnp.asarray(cy, DTYPE),
        )
    )
    t_align = timeit(align_fn, (T0, feats, tuple(cur_pyr.images)), name="sparse image alignment (4 lvl)")

    uv_m = feats.uv_host[:N_MATCHES]
    fa_fn = jax.jit(
        lambda g, uv: align_features_2d(
            g, g, uv, uv, jnp.ones((N_MATCHES,), bool), 5, 10,
            jnp.zeros((N_MATCHES,), jnp.int32),
        )
    )
    t_fa = timeit(fa_fn, (cur_pyr.base_gradient, uv_m), name=f"feature alignment ({N_MATCHES})")

    df_fn = jax.jit(
        lambda bank, T, im: update_filters(bank, T, im, fx, fy, cx, cy, jnp.asarray(1))
    )
    t_df = timeit(df_fn, (filters, T_rel, cur_pyr.base_image), name=f"depth filters ({N_FILTERS})")

    # null round-trip: measures dispatch+tunnel latency floor
    null_fn = jax.jit(lambda x: x + 1.0)
    t_null = timeit(null_fn, (jnp.zeros((8,), DTYPE),), name="null dispatch round-trip")

    total = t_pyr + t_align + t_fa + t_df
    print(f"{'sum of stages':32s} {total:8.3f} ms")
    print(f"{'latency floor x4':32s} {t_null*4:8.3f} ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-stage timing of the frame step at KITTI geometry — identifies which
device kernel dominates so optimization effort goes to the right place.

Each stage is iterated REPS times inside one ``lax.scan`` dispatch, so the
reported per-iteration time is pure device compute — the host-link round trip
(tens of ms over a tunneled TPU) is paid once per stage, not per rep.

Run on the real device:  python -u tools/profile_frame.py
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

import workload as B

REPS = 20


_NULL_RTT_MS = [0.0]  # set once by measure_null_rtt(); subtracted per dispatch


def measure_null_rtt():
    null_fn = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(null_fn(x0))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(null_fn(x0))
        ts.append(time.perf_counter() - t0)
    _NULL_RTT_MS[0] = float(np.median(ts)) * 1e3
    print(f"{'null dispatch round-trip':36s} {_NULL_RTT_MS[0]:8.3f} ms (subtracted)")
    return _NULL_RTT_MS[0]


def device_time(make_scan_fn, args, name=""):
    """make_scan_fn(*args) -> jitted fn running REPS iterations on device.
    The host-link round trip (one per dispatch) is subtracted."""
    fn = make_scan_fn
    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    dt = max(float(np.median(ts)) * 1e3 - _NULL_RTT_MS[0], 0.0) / REPS
    print(f"{name:36s} {dt:8.3f} ms/iter")
    return dt


def scanned(step_fn):
    """Iterate step_fn REPS times in one dispatch. The carry holds a scalar
    perturbation fed into the FIRST float array argument each iteration, so
    the body has a true serial dependency and XLA cannot hoist or CSE it."""

    def run(*args):
        def body(eps, i):
            leaves, treedef = jax.tree_util.tree_flatten(args)
            injected = False
            new_leaves = []
            for l in leaves:
                if (
                    not injected
                    and hasattr(l, "dtype")
                    and jnp.issubdtype(l.dtype, jnp.floating)
                ):
                    new_leaves.append(l + eps.astype(l.dtype))
                    injected = True
                else:
                    new_leaves.append(l)
            perturbed = jax.tree_util.tree_unflatten(treedef, new_leaves)
            out = step_fn(*perturbed)
            s = sum(
                jnp.sum(x.astype(jnp.float32))
                for x in jax.tree_util.tree_leaves(out)
                if hasattr(x, "astype")
            )
            return (s * 0.0).astype(jnp.float32), s

        _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(REPS))
        return outs

    return jax.jit(run)


def main():
    from sdvo_tpu.align.feature_alignment import align_features_2d
    from sdvo_tpu.align.image_alignment import SparseImageAlign
    from sdvo_tpu.depth.filter import FilterBank, update_filters
    from sdvo_tpu.geometry.se3 import SE3
    from sdvo_tpu.image.pyramid import build_pyramid

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    img_ref, images, T_true, feats, (fx, fy, cx, cy) = B.build_inputs(rng)
    img_cur = images[0]
    T0 = SE3.identity(dtype=B.DTYPE)
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

    fxj, fyj, cxj, cyj = (jnp.asarray(v, DTYPE) for v in (fx, fy, cx, cy))
    host_pyr = tuple(r[None] for r in ref_pyr.images)
    cur_imgs = tuple(cur_pyr.images)

    # --- stages, each a scanned jit ----------------------------------------
    measure_null_rtt()
    t_pyr = device_time(
        scanned(lambda im: build_pyramid(im, LEVELS).images[0]),
        (img_cur,), name="pyramid build (4 levels)")

    t_align = device_time(
        scanned(lambda T0_, feats_: aligner._align_impl(
            T0_, host_pyr, cur_imgs, feats_, fxj, fyj, cxj, cyj)[0].translation),
        (T0, feats), name="sparse image alignment (4 lvl)")

    uv_m = feats.uv_host[:N_MATCHES]
    t_fa = device_time(
        scanned(lambda g, uv: align_features_2d(
            g, g, uv, uv, jnp.ones((N_MATCHES,), bool), 5, 10,
            jnp.zeros((N_MATCHES,), jnp.int32))[0]),
        (cur_pyr.base_gradient, uv_m), name=f"feature alignment ({N_MATCHES})")

    # image FIRST so the scan perturbation defeats loop-invariant hoisting of
    # the epipolar sampling (it depends on the image, not on uv_ref)
    t_df = device_time(
        scanned(lambda im, bank, T: update_filters(
            bank, T, im, fxj, fyj, cxj, cyj, jnp.asarray(1))[0].mu),
        (cur_pyr.base_image, filters, T_rel), name=f"depth filters ({N_FILTERS})")

    total = t_pyr + t_align + t_fa + t_df
    print(f"{'sum of stages (device)':36s} {total:8.3f} ms  ->  {1e3/total:.1f} fps ceiling")


if __name__ == "__main__":
    main()

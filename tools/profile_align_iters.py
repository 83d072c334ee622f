#!/usr/bin/env python
"""How does sparse-alignment device time scale with max_iterations?
Separates per-level fixed cost (precompute/ESM) from per-LM-iteration cost,
and reveals whether the early-exit actually terminates the while_loop."""

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
from tools.profile_frame import REPS, device_time, scanned


def main():
    from sdvo_tpu.align.image_alignment import SparseImageAlign
    from sdvo_tpu.geometry.se3 import SE3
    from sdvo_tpu.image.pyramid import build_pyramid
    from sdvo_tpu.optim.optimizer import LMSettings

    rng = np.random.default_rng(0)
    img_ref, images, T_true, feats, (fx, fy, cx, cy) = B.build_inputs(rng)
    img_cur = images[0]
    T0 = SE3.identity(dtype=B.DTYPE)
    fxj, fyj, cxj, cyj = (jnp.asarray(v, B.DTYPE) for v in (fx, fy, cx, cy))

    pyr_fn = jax.jit(lambda im: build_pyramid(im, B.LEVELS))
    ref_pyr = jax.block_until_ready(pyr_fn(img_ref))
    cur_pyr = jax.block_until_ready(pyr_fn(img_cur))
    host_pyr = tuple(r[None] for r in ref_pyr.images)
    cur_imgs = tuple(cur_pyr.images)

    for iters in (1, 5, 10, 20):
        for rel in (0.0, 1e-3):
            aligner = SparseImageAlign(
                patch_size=5, min_level=0, max_level=3,
                settings=LMSettings(max_iterations=iters, mad="hist", min_rel_decrease=rel),
            )
            device_time(
                scanned(lambda T0_, feats_, _a=aligner: _a._align_impl(
                    T0_, host_pyr, cur_imgs, feats_, fxj, fyj, cxj, cyj)[0].translation),
                (T0, feats), name=f"align iters={iters:2d} rel_exit={rel}")

    # ESM off (frozen IC jacobian only) at 20 iters for comparison
    aligner = SparseImageAlign(
        patch_size=5, min_level=0, max_level=3, use_esm=False,
        settings=LMSettings(max_iterations=20, mad="hist", min_rel_decrease=1e-3),
    )
    device_time(
        scanned(lambda T0_, feats_, _a=aligner: _a._align_impl(
            T0_, host_pyr, cur_imgs, feats_, fxj, fyj, cxj, cyj)[0].translation),
        (T0, feats), name="align iters=20 no-ESM")

    # exact sort MAD at 20 iters for comparison
    aligner = SparseImageAlign(
        patch_size=5, min_level=0, max_level=3,
        settings=LMSettings(max_iterations=20, mad="exact", min_rel_decrease=1e-3),
    )
    device_time(
        scanned(lambda T0_, feats_, _a=aligner: _a._align_impl(
            T0_, host_pyr, cur_imgs, feats_, fxj, fyj, cxj, cyj)[0].translation),
        (T0, feats), name="align iters=20 exact-MAD")


if __name__ == "__main__":
    main()

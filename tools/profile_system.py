#!/usr/bin/env python
"""Per-stage device timing of the DeviceSystem superstep at KITTI geometry.

Builds a real packed VOState from the bench scene, then times each stage of
the frame/keyframe step in isolation (scanned, serial-dependency-injected, so
XLA cannot hoist) — points optimization effort at the dominant stage.

Run on the real device:  python -u tools/profile_system.py
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

from profile_frame import device_time, measure_null_rtt, scanned


def main():
    import bench as B
    from sdvo_tpu.config import load_config
    from sdvo_tpu.pipeline.device_system import DeviceSystem
    from sdvo_tpu.image.pyramid import build_pyramid
    from sdvo_tpu.mapping.device_map import reproject_device

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    frames, T_true = B.render_sequence(rng, 8)
    config = load_config(overrides={
        "initialization": {"disparity_threshold": 3, "threshold_gradient_magnitude": 20},
    })
    ds = DeviceSystem(config, supersteps_per_chunk=1)
    ds.add_image(frames[0].astype(np.float32), 0.0)
    ds.add_image(frames[1].astype(np.float32), 1.0)
    assert ds.bootstrapped

    # run one superstep so the map/filters are warm
    imgs = jnp.asarray(np.stack(frames[2:5])[None], jnp.float32)
    fn = ds.vo.chunk_fn(1)
    ds.state, _ = fn(ds.state, imgs)
    jax.block_until_ready(ds.state)

    vo = ds.vo
    st = ds.state
    cam = vo.cam
    img = jnp.asarray(frames[5], jnp.float32)
    pyr = jax.jit(lambda im: build_pyramid(im, vo.cfg.levels))(img)
    jax.block_until_ready(pyr)
    from sdvo_tpu.geometry.se3 import SE3

    T_cur_w = st.T_cur_ref.compose(st.ref.T_ref_w)

    measure_null_rtt()

    host_pyr = tuple(im[None] for im in st.ref.pyr_images)
    t_align = device_time(
        scanned(lambda T0, feats: vo.aligner._align_impl(
            T0, host_pyr, tuple(pyr.images), feats, cam.fx, cam.fy, cam.cx, cam.cy
        )[0].translation),
        (st.T_cur_ref, st.ref.feats), name="sparse alignment (4 lvl)")

    t_rep = device_time(
        scanned(lambda m, T: reproject_device(
            m, T, pyr.base_gradient, cam.fx, cam.fy, cam.cx, cam.cy,
            vo.cfg.cell_size, vo.cfg.max_matches, vo.cfg.max_error,
            vo.cfg.patch_fa, jnp.asarray(7, jnp.int32),
        )[1].uv),
        (st.map, T_cur_w), name="device reprojection + feat align")

    _, matches = jax.jit(lambda m, T: reproject_device(
        m, T, pyr.base_gradient, cam.fx, cam.fy, cam.cx, cam.cy,
        vo.cfg.cell_size, vo.cfg.max_matches, vo.cfg.max_error,
        vo.cfg.patch_fa, jnp.asarray(7, jnp.int32)))(st.map, T_cur_w)
    jax.block_until_ready(matches)

    from sdvo_tpu.ba.bundle_adjustment import optimize_pose
    from sdvo_tpu.optim.optimizer import LMSettings

    t_pose = device_time(
        scanned(lambda T, uv: optimize_pose(
            T, st.map.pt_pos[matches.pt_slot], cam.backproject(uv), matches.good,
            settings=LMSettings(max_iterations=8, mad="hist", min_rel_decrease=1e-3),
        )[0].translation),
        (T_cur_w, matches.uv), name="pose polish (150 obs)")

    from sdvo_tpu.depth.filter import update_filters

    kf_slots = st.filt.bank.kf_slot
    R_kf = st.map.kf_R[kf_slots]
    t_kf_ = st.map.kf_t[kf_slots]
    R_rel = jnp.einsum("ij,ckj->cik", T_cur_w.rotation, R_kf)
    t_rel = T_cur_w.translation[None] - jnp.einsum("cik,ck->ci", R_rel, t_kf_)
    t_df = device_time(
        scanned(lambda im, bank: update_filters(
            bank, SE3(R_rel, t_rel), im, cam.fx, cam.fy, cam.cx, cam.cy,
            kf_counter=st.map.kf_counter, patch_size=vo.cfg.patch_filter,
            num_steps=vo.cfg.epipolar_steps)[0].mu),
        (pyr.base_image, st.filt.bank), name="depth filters (512)")

    t_ba = device_time(
        scanned(lambda m, slot: vo._run_ba(m, slot, jnp.asarray(False))[1].translation),
        (st.map, st.ref.ref_slot), name=f"local BA ({vo.cfg.ba_iterations} it)")

    t_kfstep = device_time(
        scanned(lambda state, im: vo._frame_step(state, im, is_kf=True)[1].t),
        (st, img), name="FULL keyframe frame")
    t_track = device_time(
        scanned(lambda state, im: vo._frame_step(state, im, is_kf=False)[1].t),
        (st, img), name="FULL tracked frame")

    per = vo.cfg.period
    amort = ((per - 1) * t_track + t_kfstep) / per
    print(f"{'amortized per frame':36s} {amort:8.3f} ms -> {1e3/amort:.1f} fps ceiling")
    print(f"{'  (track/kf split)':36s} {t_track:.3f} / {t_kfstep:.3f} ms")
    print(f"{'  kf extras (kf - track)':36s} {t_kfstep - t_track:8.3f} ms")


if __name__ == "__main__":
    main()

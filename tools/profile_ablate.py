#!/usr/bin/env python
"""Real-motion chunk ablations of the DeviceSystem superstep.

The scanned-stage profilers (profile_system.py) replay ONE frame, so every
data-dependent LM while-loop exits at its minimum iteration count — they
measure the launch/bandwidth floor, not the real cost (measured 2.1 vs 5.4
ms/frame in round 4). This tool times REAL chunks (distinct moving frames) on
a mature state, then re-times them with one stage at a time stubbed out — the
deltas are the true per-stage costs under real motion.

Run on the real device:  python -u tools/profile_ablate.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
import bench as B
from sdvo_tpu.config import load_config
from sdvo_tpu.pipeline.device_system import DeviceSystem, DeviceVO
from sdvo_tpu.geometry.se3 import SE3

rng = np.random.default_rng(0)
per = 3; SC = 8
frames, _ = B.render_sequence(rng, 2 + 4 * SC * per)
config = load_config(overrides={"initialization": {"disparity_threshold": 3, "threshold_gradient_magnitude": 20}})
ds = DeviceSystem(config, supersteps_per_chunk=SC)
ds.add_image(frames[0].astype(np.float32), 0.0)
ds.add_image(frames[1].astype(np.float32), 1.0)
fn0 = ds.vo.chunk_fn(SC)
chunk_frames = SC * per
chunks = []
for c in range(4):
    arr = np.stack(frames[2 + c*chunk_frames : 2 + (c+1)*chunk_frames]).reshape(SC, per, B.H, B.W)
    chunks.append(jnp.asarray(arr, jnp.float32))
st = ds.state
st, _ = fn0(st, chunks[0])
st, _ = fn0(st, chunks[1])
jax.block_until_ready(st)

def timeit(fn, state, ch, n=3):
    fn(state, ch)  # compile+warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        s2, outs = fn(state, ch)
        jax.block_until_ready(outs.R)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3

base = timeit(fn0, st, chunks[2])
print(f"full chunk: {base:.1f} ms ({base/chunk_frames:.2f} ms/frame)", flush=True)

vo = ds.vo
orig_frame_step = DeviceVO._frame_step
orig_run_ba = DeviceVO._run_ba
orig_keyframe = DeviceVO._keyframe_step

# ablation: no BA
def no_ba(self, m, slot, frozen):
    return m, SE3(m.kf_R[slot], m.kf_t[slot])
DeviceVO._run_ba = no_ba
vo2 = DeviceVO(vo.cam, vo.cfg, dtype=vo.dtype)
t = timeit(vo2.chunk_fn(SC), st, chunks[2])
print(f"no BA: {t:.1f} ms (delta {base-t:.1f})", flush=True)
DeviceVO._run_ba = orig_run_ba

# ablation: no keyframe extras at all
def no_kf(self, state, pyr, T_cur_w, matches):
    return state, T_cur_w
DeviceVO._keyframe_step = no_kf
vo3 = DeviceVO(vo.cam, vo.cfg, dtype=vo.dtype)
t = timeit(vo3.chunk_fn(SC), st, chunks[2])
print(f"no keyframe extras: {t:.1f} ms (delta {base-t:.1f})", flush=True)
DeviceVO._keyframe_step = orig_keyframe

# ablation: skip alignment (use CV prior directly)
import sdvo_tpu.pipeline.device_system as DSM
orig_align = vo.aligner._align_impl
class FakeAligner:
    backend = vo.aligner.backend
    _interpret = vo.aligner._interpret
    precompute_ref_windows = vo.aligner.precompute_ref_windows
    def _align_impl(self, T0, host_pyr, cur_pyr, feats, fx, fy, cx, cy):
        return T0, jnp.asarray(0.5, jnp.float32), jnp.asarray(0, jnp.int32)
    def align_precomputed(self, T0, tables, cur_pyr, feats, fx, fy, cx, cy):
        return T0, jnp.asarray(0.5, jnp.float32), jnp.asarray(0, jnp.int32)
vo4 = DeviceVO(vo.cam, vo.cfg, dtype=vo.dtype)
vo4.aligner = FakeAligner()
t = timeit(vo4.chunk_fn(SC), st, chunks[2])
print(f"no alignment: {t:.1f} ms (delta {base-t:.1f})", flush=True)

# ablation: no depth filters
import sdvo_tpu.depth.filter as DF
orig_upd = DF.update_filters
def fake_update(bank, *a, **k):
    return bank, jnp.zeros(bank.mu.shape, bool)
DSM.update_filters = fake_update
vo5 = DeviceVO(vo.cam, vo.cfg, dtype=vo.dtype)
t = timeit(vo5.chunk_fn(SC), st, chunks[2])
print(f"no depth filters: {t:.1f} ms (delta {base-t:.1f})", flush=True)
DSM.update_filters = orig_upd

# ablation: no reprojection/FA/pose (keep alignment+filters)
import sdvo_tpu.mapping.device_map as DM
orig_rep = DSM.reproject_device
def fake_rep(m, T, grad, fx, fy, cx, cy, **kw):
    M = kw.get("max_matches")
    from sdvo_tpu.mapping.device_map import DeviceMatches
    return m, DeviceMatches(
        pt_slot=jnp.zeros((M,), jnp.int32), uv=jnp.full((M,2), 50.0, jnp.float32),
        err=jnp.zeros((M,), jnp.float32), good=jnp.ones((M,), bool),
        n_good=jnp.asarray(M, jnp.int32))
DSM.reproject_device = fake_rep
vo6 = DeviceVO(vo.cam, vo.cfg, dtype=vo.dtype)
t = timeit(vo6.chunk_fn(SC), st, chunks[2])
print(f"no reproject+FA (pose runs on fake): {t:.1f} ms (delta {base-t:.1f})", flush=True)
DSM.reproject_device = orig_rep

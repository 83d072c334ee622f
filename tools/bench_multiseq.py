#!/usr/bin/env python
"""Aggregate throughput of N concurrent sequences on the attached chip(s).

BASELINE config 4's bench mode: the FULL DeviceSystem superstep vmapped over
a ``seq`` axis (per-sequence maps, shared kernels — parallel/multi_seq.py),
processing N distinct synthetic KITTI-geometry sequences in lockstep. On one
chip this measures batch throughput (the vmapped superstep amortizes every
kernel launch across sequences); on a pod the same code shards the seq axis
over devices with zero communication.

Usage: python tools/bench_multiseq.py [--seqs 4] [--chunks 2]
Prints one JSON line {metric, value, unit, per_seq_fps}.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, default=4)
    ap.add_argument("--supersteps", type=int, default=8)
    ap.add_argument("--chunks", type=int, default=2)
    # one-chip multi-sequence batching: vmap of a pallas_call serializes the
    # kernel instances over an outer grid (each sequence's fused LM/FA/pose/
    # depth kernel runs in turn), while the XLA backend's ops batch across
    # the seq axis natively — for >1 sequence per chip "xla" usually wins;
    # across chips (1 seq/device, the pod deployment) "pallas" is fastest.
    ap.add_argument("--backend", default="pallas", choices=["pallas", "xla"])
    args = ap.parse_args()

    import bench as B
    from sdvo_tpu.config import load_config
    from sdvo_tpu.parallel.multi_seq import multi_chunk_fn, stack_states
    from sdvo_tpu.pipeline.device_system import DeviceSystem

    S = args.seqs
    per = 3
    chunk_frames = args.supersteps * per
    n_frames = 2 + (1 + args.chunks) * chunk_frames

    config = load_config(overrides={
        "initialization": {"disparity_threshold": 3, "threshold_gradient_magnitude": 20},
    })

    # S distinct sequences (different textures/trajectory phases)
    seqs, subs = [], []
    for i in range(S):
        rng = np.random.default_rng(i)
        frames, _ = B.render_sequence(rng, n_frames)
        seqs.append(frames)
        ds = DeviceSystem(config, supersteps_per_chunk=args.supersteps,
                          backend=args.backend)
        k = 0
        while ds.state is None and k < len(frames):
            ds.add_image(frames[k].astype(np.float32), float(k))
            k += 1
        assert ds.state is not None, f"seq {i} failed to bootstrap"
        subs.append((ds, k))
    vo = subs[0][0].vo
    state = stack_states([ds.state for ds, _ in subs])
    fn = multi_chunk_fn(vo)

    def chunk_at(c):
        imgs = np.stack([
            np.stack(seqs[i][subs[i][1] + c * chunk_frames : subs[i][1] + (c + 1) * chunk_frames])
            for i in range(S)
        ])  # (S, C·per, H, W)
        imgs = imgs.reshape(S, args.supersteps, per, B.H, B.W).transpose(1, 0, 2, 3, 4)
        return jax.device_put(jnp.asarray(imgs, jnp.float32))

    chunks = [chunk_at(c) for c in range(1 + args.chunks)]
    jax.block_until_ready(chunks)

    # warmup (compile)
    state, outs = fn(state, chunks[0])
    jax.block_until_ready(outs.R)
    ok_frac = float(np.mean(np.asarray(outs.ok)))
    assert ok_frac > 0.95, f"multi-seq tracking failing ({ok_frac:.0%} ok)"

    # measure the tunnel's dispatch and sync legs separately; each timed
    # chunk pays one dispatch + one sync, so the correction is disp+sync
    # per chunk (see bench.py for the rationale; raw is emitted too)
    null = jax.jit(lambda x: x + 1)
    z = jnp.zeros(())
    jax.block_until_ready(null(z))
    disp = sync = 0.0
    for _ in range(10):
        t0 = time.perf_counter()
        y = null(z)
        t1 = time.perf_counter()
        jax.block_until_ready(y)
        t2 = time.perf_counter()
        disp += t1 - t0
        sync += t2 - t1
    rtt = (disp + sync) / 10

    t0 = time.perf_counter()
    for ch in chunks[1:]:
        state, outs = fn(state, ch)
        jax.block_until_ready(outs.R)
    raw_elapsed = time.perf_counter() - t0
    elapsed = max(raw_elapsed - args.chunks * rtt, 1e-9)
    total_frames = args.chunks * chunk_frames * S
    fps = total_frames / elapsed
    assert float(np.mean(np.asarray(outs.ok))) > 0.95

    print(json.dumps({
        "metric": "multi_sequence_aggregate_throughput",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "sequences": S,
        "per_seq_fps": round(fps / S, 2),
        "backend": args.backend,
        "raw_fps": round(total_frames / raw_elapsed, 2),
        "rtt_ms": round(rtt * 1e3, 3),
    }))


if __name__ == "__main__":
    main()

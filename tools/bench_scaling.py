#!/usr/bin/env python
"""Scaling-efficiency harness for distributed (landmark-sharded) Schur BA.

Times ``distributed_local_ba`` on 1/2/4/8-device meshes and reports strong-
scaling efficiency. The DEFAULT workload is BASELINE config 5's global-map
shape — K=16 keyframes, P=32768 landmarks, M≈128k observations (the "all
sequences, map-block sharding" refinement) — where each shard carries real
arithmetic (the Schur fill-in is a (96×3P_s)·(3P_s×96) matmul per shard) so
the (6K)² psum has something to hide behind. ``--points 2048 --cams 7`` gives
the old single-window shape, whose ~0.5 ms/shard is pure-overhead territory
and does not scale (SCALING.json r3).

On this rig multi-chip hardware is unavailable, so the default run uses the
virtual CPU mesh (``--xla_force_host_platform_device_count``): collectives
execute for real (they cross the same XLA partitioner/SPMD code path a pod
uses), but inter-device bandwidth is host-memory, so treat CPU numbers as a
CORRECTNESS + overhead-structure measurement, not ICI bandwidth. On a real
pod the same script runs unchanged after `initialize_from_env()`.

Writes a markdown table to stdout and SCALING.json next to the repo root.

Usage:  python tools/bench_scaling.py [--devices 8] [--points 2048] [--obs-per-point 5]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--cams", type=int, default=16)
    ap.add_argument("--obs-per-point", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--real-devices", action="store_true",
                    help="use the attached accelerator devices (pods); default "
                         "is the virtual CPU mesh — probing jax.devices() first "
                         "would lock in the backend before we could switch")
    args = ap.parse_args()

    # must happen before jax configures a backend
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax

    from sdvo_tpu.parallel.distributed import initialize_from_env, runtime_info

    if not args.real_devices:
        jax.config.update("jax_platforms", "cpu")
    initialize_from_env()

    import jax.numpy as jnp

    from sdvo_tpu.geometry import se3
    from sdvo_tpu.geometry.se3 import SE3
    from sdvo_tpu.parallel.dist_ba import distributed_local_ba, shard_observations
    from sdvo_tpu.parallel.mesh import make_vo_mesh

    print("runtime:", runtime_info())

    K, Pn, OBS = args.cams, args.points, args.obs_per_point
    rng = np.random.default_rng(0)
    taus = np.stack([np.array([0.3 * k, 0.01 * k, 0.08 * k, 0.0, 0.01 * k, 0.0]) for k in range(K)])
    poses_gt = se3.exp(jnp.asarray(taus, jnp.float32))
    pts_w = rng.uniform([-10, -5, 8], [10, 5, 40], (Pn, 3))
    FX = FY = 721.5377
    CX, CY = 609.5593, 172.854

    # vectorized synthesis: each point seen by OBS distinct cameras
    obs_cams = np.argsort(rng.random((Pn, K)), axis=1)[:, :OBS]
    pt_idx = np.repeat(np.arange(Pn, dtype=np.int32), OBS)
    cam_idx = obs_cams.reshape(-1).astype(np.int32)
    R_all = np.asarray(poses_gt.rotation)
    t_all = np.asarray(poses_gt.translation)
    pc = np.einsum("mij,mj->mi", R_all[cam_idx], pts_w[pt_idx]) + t_all[cam_idx]
    uvs = np.stack([FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1)
    uvs += rng.normal(size=uvs.shape) * 0.3
    valid = pc[:, 2] > 0.1
    M = len(cam_idx)
    fixed = jnp.zeros((K,), bool).at[0].set(True).at[1].set(True)

    rows = []
    n_avail = len(jax.devices())
    for nsh in (1, 2, 4, 8):
        if nsh > n_avail:
            continue
        mesh = make_vo_mesh(num_seq=1, num_shard=nsh, devices=jax.devices()[:nsh])
        s_cam, s_pt, s_uv, s_valid, s_table, s_points = shard_observations(
            cam_idx, pt_idx, uvs, valid, Pn, nsh, max_obs_per_point=OBS
        )
        pts0 = pts_w[np.clip(s_points, 0, Pn - 1)].astype(np.float32)
        pts0 += rng.normal(size=pts0.shape).astype(np.float32) * 0.1
        pts0[s_points < 0] = 0.0

        def run():
            out = distributed_local_ba(
                poses_gt, jnp.asarray(pts0),
                jnp.asarray(s_cam), jnp.asarray(s_pt), jnp.asarray(s_uv, jnp.float32),
                jnp.asarray(s_valid), jnp.asarray(s_table), fixed,
                FX, FY, CX, CY, mesh=mesh, num_cams=K, iterations=args.iters,
            )
            jax.block_until_ready(out)
            return out

        poses_out, pts_out, chi = run()  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        rows.append({"shards": nsh, "ms": dt * 1e3, "chi2": float(chi)})
        print(f"shards={nsh}: {dt*1e3:8.2f} ms  chi2={float(chi):.3e}")

    base = rows[0]["ms"]
    print(f"\n| shards | time (ms) | speedup | strong-scaling efficiency |")
    print("|---|---|---|---|")
    for r in rows:
        sp = base / r["ms"]
        r["speedup"] = sp
        r["efficiency"] = sp / r["shards"]
        print(f"| {r['shards']} | {r['ms']:.2f} | {sp:.2f}x | {100*sp/r['shards']:.0f}% |")

    out = {
        "workload": {"K": K, "P": Pn, "M": M, "iterations": args.iters},
        "runtime": runtime_info(),
        "rows": rows,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("\nwrote SCALING.json")


if __name__ == "__main__":
    main()

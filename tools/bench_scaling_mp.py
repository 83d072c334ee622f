#!/usr/bin/env python
"""Multi-PROCESS scaling of distributed Schur BA (real collectives).

``tools/bench_scaling.py`` on the in-process virtual CPU mesh cannot show
wall-clock scaling: all virtual devices serialize through one executor, so a
compute-bound workload measures partitioning overhead only (SCALING.json r3's
honest caveat). This harness runs each shard in its OWN PROCESS with the
standard JAX multi-controller runtime (``jax.distributed.initialize``) and
gloo CPU collectives — the same code path a multi-host TPU pod uses, with the
psum actually crossing a process boundary.

The rig's core count bounds how many processes can scale in wall-clock
(``nproc``); beyond that the harness also reports a WORK MODEL: the measured
single-process time of a 1/k-sliced workload (the per-shard compute a k-chip
pod would run) plus the measured cross-process psum latency — an honest
upper-bound decomposition, labeled as such in SCALING.json.

Usage:  python tools/bench_scaling_mp.py [--max-procs 2] [--points 32768]
        (run as orchestrator; it spawns its own workers with --worker)
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = 19765


def build_workload(Pn, K, OBS, seed=0):
    import jax.numpy as jnp

    from sdvo_tpu.geometry import se3

    rng = np.random.default_rng(seed)
    taus = np.stack([np.array([0.3 * k, 0.01 * k, 0.08 * k, 0.0, 0.01 * k, 0.0]) for k in range(K)])
    poses_gt = se3.exp(jnp.asarray(taus, jnp.float32))
    pts_w = rng.uniform([-10, -5, 8], [10, 5, 40], (Pn, 3))
    FX = FY = 721.5377
    CX, CY = 609.5593, 172.854
    obs_cams = np.argsort(rng.random((Pn, K)), axis=1)[:, :OBS]
    pt_idx = np.repeat(np.arange(Pn, dtype=np.int32), OBS)
    cam_idx = obs_cams.reshape(-1).astype(np.int32)
    R_all = np.asarray(poses_gt.rotation)
    t_all = np.asarray(poses_gt.translation)
    pc = np.einsum("mij,mj->mi", R_all[cam_idx], pts_w[pt_idx]) + t_all[cam_idx]
    uvs = np.stack([FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1)
    uvs += rng.normal(size=uvs.shape) * 0.3
    valid = pc[:, 2] > 0.1
    return poses_gt, pts_w, cam_idx, pt_idx, uvs, valid, (FX, FY, CX, CY), rng


def worker(args):
    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=args.nproc, process_id=args.pid,
    )
    import jax.numpy as jnp

    from sdvo_tpu.parallel.dist_ba import distributed_local_ba, shard_observations
    from sdvo_tpu.parallel.mesh import make_vo_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    nsh = args.nproc
    K, Pn, OBS = args.cams, args.points, args.obs
    poses_gt, pts_w, cam_idx, pt_idx, uvs, valid, intr, rng = build_workload(Pn, K, OBS)
    FX, FY, CX, CY = intr
    s_cam, s_pt, s_uv, s_valid, s_table, s_points = shard_observations(
        cam_idx, pt_idx, uvs, valid, Pn, nsh, max_obs_per_point=OBS
    )
    pts0 = pts_w[np.clip(s_points, 0, Pn - 1)].astype(np.float32)
    pts0 += rng.normal(size=pts0.shape).astype(np.float32) * 0.1
    pts0[s_points < 0] = 0.0

    mesh = make_vo_mesh(num_seq=1, num_shard=nsh, devices=jax.devices())
    shard = NamedSharding(mesh, P("shard"))
    repl = NamedSharding(mesh, P())

    def g(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    fixed = np.zeros((K,), bool)
    fixed[:2] = True
    import sdvo_tpu.geometry.se3 as se3m
    from sdvo_tpu.geometry.se3 import SE3

    poses = SE3(g(np.asarray(poses_gt.rotation), repl), g(np.asarray(poses_gt.translation), repl))
    argsd = (
        g(pts0, shard), g(s_cam, shard), g(s_pt, shard),
        g(s_uv.astype(np.float32), shard), g(s_valid, shard), g(s_table, shard),
        g(fixed, repl),
    )

    def run():
        out = distributed_local_ba(
            poses, *argsd[:1], *argsd[1:6], argsd[6],
            FX, FY, CX, CY, mesh=mesh, num_cams=K, iterations=args.iters,
        )
        jax.block_until_ready(out)
        return out

    out = run()  # compile
    chi = out[2]
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)

    # measured COLLECTIVE cost: a pure-psum program with the exact payload the
    # BA iteration reduces (packed symmetric reduced system + rhs — see
    # dist_ba), iterated like the solver, on the same multi-process mesh.
    K6 = K * 6
    n_payload = K6 * (K6 + 1) // 2 + K * 21 + K6 + K6
    payload_bytes = n_payload * 4
    comm_ms = 0.0
    if nsh > 1:
        import jax as _jax
        from jax.sharding import PartitionSpec as PS

        def psum_only(x):
            def body(c, _):
                return _jax.lax.psum(c, axis_name="shard"), None
            y, _ = _jax.lax.scan(body, x, None, length=args.iters)
            return y

        f = _jax.jit(
            _jax.shard_map(psum_only, mesh=mesh, in_specs=PS(), out_specs=PS(),
                           check_vma=False)
        )
        xp = g(np.zeros((n_payload,), np.float32), repl)
        _jax.block_until_ready(f(xp))
        cts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _jax.block_until_ready(f(xp))
            cts.append(time.perf_counter() - t0)
        comm_ms = float(np.median(cts)) * 1e3
    if args.pid == 0:
        print(json.dumps({"nproc": nsh, "ms": float(np.median(ts)) * 1e3,
                          "chi2": float(chi),
                          "comm_ms_total": comm_ms,
                          "comm_ms_per_iter": comm_ms / args.iters,
                          "psum_payload_bytes": payload_bytes}), flush=True)


def orchestrate(args):
    ncores = os.cpu_count() or 1
    rows = []
    for nproc in (1, 2, 4, 8):
        if nproc > args.max_procs or nproc > ncores:
            continue
        procs = []
        for pid in range(nproc):
            cmd = [sys.executable, os.path.abspath(__file__), "--worker",
                   "--pid", str(pid), "--nproc", str(nproc),
                   "--points", str(args.points), "--cams", str(args.cams),
                   "--obs", str(args.obs), "--iters", str(args.iters)]
            core = pid % ncores
            cmd = ["taskset", "-c", str(core)] + cmd
            procs.append(subprocess.Popen(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
                cwd=REPO,
            ))
        outs = [p.communicate()[0] for p in procs]
        for o in outs:
            for line in o.splitlines():
                if line.startswith("{"):
                    rows.append(json.loads(line))
                    print("measured:", line, flush=True)

    # work model: single process timing of a 1/k workload slice
    model = []
    for k in (2, 4, 8):
        p = subprocess.Popen(
            ["taskset", "-c", "0", sys.executable, os.path.abspath(__file__),
             "--worker", "--pid", "0", "--nproc", "1",
             "--points", str(args.points // k), "--cams", str(args.cams),
             "--obs", str(args.obs), "--iters", str(args.iters)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, cwd=REPO,
        )
        o = p.communicate()[0]
        for line in o.splitlines():
            if line.startswith("{"):
                d = json.loads(line)
                model.append({"shards_modeled": k, "per_shard_ms": d["ms"]})
                print(f"work model k={k}:", line, flush=True)

    base = rows[0]["ms"] if rows else None
    for r in rows:
        r["speedup"] = base / r["ms"]
        r["efficiency"] = r["speedup"] / r["nproc"]
    for m in model:
        m["modeled_efficiency"] = base / (m["per_shard_ms"] * 1.0) / m["shards_modeled"]
    out = {
        "methodology": (
            "measured rows: one PROCESS per shard, gloo CPU collectives through "
            "jax.distributed (the multi-controller path a pod uses), one core per "
            "process via taskset; wall-clock scaling is real but capped by this "
            f"rig's {os.cpu_count()} cores. comm_ms_*: measured pure-psum program "
            "with the solver's exact packed payload (symmetric half of the "
            "reduced camera system + rhs) on the same mesh — the measured "
            "compute/collective split. work_model rows: measured single-process "
            "time of the 1/k workload slice each pod chip would run."
        ),
        "workload": {"K": args.cams, "P": args.points, "obs": args.obs,
                     "iterations": args.iters},
        "rows": rows,
        "work_model": model,
    }
    path = os.path.join(REPO, "SCALING_MP.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--nproc", type=int, default=1)
    ap.add_argument("--max-procs", type=int, default=8)
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--cams", type=int, default=16)
    ap.add_argument("--obs", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()
    if args.worker:
        worker(args)
    else:
        orchestrate(args)


if __name__ == "__main__":
    main()

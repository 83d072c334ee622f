"""Full-System data parallelism: N independent sequences, one dispatch.

BASELINE config 4 asks for "8 parallel KITTI sequences, shared kernels,
per-chip maps". ``pipeline.device_system`` already carries the WHOLE
steady-state VO loop (tracking, reprojection, feature alignment, depth
filters, keyframe work, Schur BA, eviction) in a ``VOState`` pytree whose
leaves all have fixed shapes — so the complete superstep vmaps over a leading
``seq`` axis and shards over the mesh's ``seq`` devices with
``NamedSharding``: XLA partitions the batch with ZERO cross-device
communication (each sequence owns its map). This file is the driver around
that vmap: state stacking, the scanned multi-sequence chunk function, and a
lockstep batch runner.

Reference analog: running the whole of src/system.cpp once per sequence — the
reference has no multi-sequence mode at all; here it is one program.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdvo_tpu.pipeline.device_system import DeviceSystem, DeviceVO, FrameOut, VOState


def stack_states(states: Sequence[VOState]) -> VOState:
    """Stack per-sequence VOStates along a new leading ``seq`` axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def unstack_states(state: VOState, n: int) -> List[VOState]:
    return [jax.tree_util.tree_map(lambda x: x[i], state) for i in range(n)]


def multi_chunk_fn(vo: DeviceVO, mesh: Optional[Mesh] = None, axis: str = "seq"):
    """Jitted ``(stacked VOState, images (C, S, per, H, W)) → (state, outs)``.

    ``outs`` is a FrameOut pytree with leading dims (C, S, per). With a mesh,
    call ``fn.place(tree, leading_seq_axis)`` to shard inputs over ``axis``
    before dispatch — GSPMD then partitions the whole scanned program
    per-device with no collectives.
    """

    def superstep(st: VOState, im: jax.Array):
        return jax.vmap(vo._superstep)(st, im)

    @jax.jit
    def run(state: VOState, images: jax.Array):
        return jax.lax.scan(superstep, state, images)

    if mesh is not None:
        state_sharding = NamedSharding(mesh, P(axis))
        img_sharding = NamedSharding(mesh, P(None, axis))

        def place(tree, images=False):
            return jax.device_put(
                tree, img_sharding if images else state_sharding
            )

        run.place = place  # type: ignore[attr-defined]
    return run


class MultiSequenceSystem:
    """Lockstep batch VO over N sequences with per-sequence maps.

    Each sequence bootstraps on the host (two-view init, like the single-
    sequence ``DeviceSystem``); the steady state of ALL sequences then runs
    as one scanned, vmapped (and mesh-sharded) device dispatch. Sequences may
    bootstrap at different frame indices — the joint phase simply starts each
    sequence at its own post-bootstrap pointer (sequences are independent;
    nothing requires a shared source-frame index). A sequence whose tracking
    fails mid-chunk freezes (``VOState.failed``) and its frames report
    failed; per-sequence host relocalization applies in the tail phase.
    """

    def __init__(self, config, n_seq: int, camera=None,
                 supersteps_per_chunk: int = 8, mesh: Optional[Mesh] = None,
                 backend: str = "auto", **ds_kwargs):
        self.n_seq = n_seq
        self.mesh = mesh
        self.subs = [
            DeviceSystem(config, camera=camera, seed=i, backend=backend,
                         supersteps_per_chunk=supersteps_per_chunk, **ds_kwargs)
            for i in range(n_seq)
        ]
        self.supersteps_per_chunk = supersteps_per_chunk
        self.vo = self.subs[0].vo  # shared kernels: one jitted program
        self._fn = None

    @property
    def period(self) -> int:
        return self.subs[0].scfg.period

    def run(self, sequences: List[List[np.ndarray]]) -> List[Dict]:
        """Process N sequences to completion. Returns per-sequence dicts with
        ``trajectory`` (list of 4×4 or None) and ``metrics``."""
        assert len(sequences) == self.n_seq
        per = self.period
        chunk_frames = self.supersteps_per_chunk * per

        # --- phase 1: host bootstrap, per sequence -------------------------
        ptr = [0] * self.n_seq
        for i, (sub, seq) in enumerate(zip(self.subs, sequences)):
            while sub.state is None and ptr[i] < len(seq):
                sub.add_image(np.asarray(seq[ptr[i]]), float(ptr[i]))
                ptr[i] += 1
            if sub.state is None:
                raise RuntimeError(f"sequence {i} failed to bootstrap")

        # --- phase 2: joint lockstep chunks --------------------------------
        state = stack_states([sub.state for sub in self.subs])
        if self._fn is None:
            self._fn = multi_chunk_fn(self.vo, self.mesh)
        fn = self._fn
        if self.mesh is not None:
            state = fn.place(state)

        dtype = self.subs[0].host.dtype
        while all(ptr[i] + chunk_frames <= len(sequences[i]) for i in range(self.n_seq)):
            imgs = np.stack([
                np.stack(sequences[i][ptr[i] : ptr[i] + chunk_frames]).astype(np.float32)
                for i in range(self.n_seq)
            ])  # (S, C·per, H, W)
            C = self.supersteps_per_chunk
            imgs = imgs.reshape(self.n_seq, C, per, *imgs.shape[2:]).transpose(1, 0, 2, 3, 4)
            imgs = jnp.asarray(imgs, dtype)
            if self.mesh is not None:
                imgs = fn.place(imgs, images=True)
            state, outs = fn(state, imgs)
            outs = jax.device_get(outs)
            for c in range(C):
                for i in range(self.n_seq):
                    for p in range(per):
                        self._emit(i, outs, c, i, p)
            for i in range(self.n_seq):
                ptr[i] += chunk_frames

        # --- phase 3: per-sequence tail through the single-seq path --------
        finals = unstack_states(jax.device_get(state), self.n_seq)
        results = []
        for i, sub in enumerate(self.subs):
            sub.state = jax.tree_util.tree_map(jnp.asarray, finals[i])
            if bool(sub.state.failed):
                sub._relocalize()
            for j in range(ptr[i], len(sequences[i])):
                sub.add_image(np.asarray(sequences[i][j]), float(j))
            sub.finish()
            results.append({"trajectory": sub.trajectory, "metrics": sub.metrics})
        return results

    def _emit(self, seq_i: int, outs: FrameOut, c: int, s: int, p: int):
        sub = self.subs[seq_i]
        ok = bool(outs.ok[c, s, p])
        T = np.eye(4)
        T[:3, :3] = np.asarray(outs.R[c, s, p], np.float64)
        T[:3, 3] = np.asarray(outs.t[c, s, p], np.float64)
        sub.trajectory.append(T if ok else None)
        sub.metrics.append({
            "frame": len(sub.trajectory) - 1,
            "result": ("KEYFRAME" if bool(outs.is_kf[c, s, p]) else "SUCCESS") if ok else "FAILED",
            "n_features": int(outs.n_matches[c, s, p]),
            "n_points": int(outs.n_points[c, s, p]),
            "n_filters": int(outs.n_filters[c, s, p]),
            "align_rmse": float(outs.rmse[c, s, p]),
        })

"""Multi-host runtime wiring: ``jax.distributed`` initialization + host-spanning
meshes.

The reference is strictly single-process (SURVEY §2.4 — one pthread and two
mutexes); the TPU build scales across hosts with the standard JAX multi-
controller runtime: every host runs the same program, ``jax.distributed
.initialize`` wires the coordination service, and ``jax.devices()`` then spans
the full slice so ``make_vo_mesh`` meshes ride ICI within a slice and DCN
across slices.  Collective layout: the ``shard`` axis (landmark blocks for
distributed BA) should map to ICI-adjacent devices; the ``seq`` axis (whole
independent sequences) tolerates DCN.

Environment contract (all optional — TPU pods autodetect everything):

    SDVO_COORDINATOR   "host:port" of process 0   (jax: coordinator_address)
    SDVO_NUM_PROCESSES total process count        (jax: num_processes)
    SDVO_PROCESS_ID    this process's index       (jax: process_id)

On Cloud TPU pods, ``jax.distributed.initialize()`` with no arguments reads
the TPU metadata service; the env vars exist for CPU/GPU clusters and tests.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def initialize_from_env(force: bool = False) -> bool:
    """Initialize the multi-host runtime if the environment asks for it.

    Returns True when ``jax.distributed.initialize`` was called (or already
    was), False for the single-process case. Safe to call unconditionally at
    program start — the single-chip path is unaffected.
    """
    global _initialized
    if _initialized and not force:
        return True
    coord = os.environ.get("SDVO_COORDINATOR")
    nproc = os.environ.get("SDVO_NUM_PROCESSES")
    pid = os.environ.get("SDVO_PROCESS_ID")
    if coord is None and nproc is None:
        # TPU pod auto-detection: initialize() with no args when the TPU
        # runtime reports multiple processes; single host → no-op
        if os.environ.get("SDVO_AUTO_DISTRIBUTED", "0") == "1":
            jax.distributed.initialize()
            _initialized = True
            return True
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nproc) if nproc else None,
        process_id=int(pid) if pid else None,
    )
    _initialized = True
    return True


def runtime_info() -> dict:
    """Process/device topology for logs and the scaling harness."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "platform": jax.devices()[0].platform,
    }

"""Device-mesh construction for the two VO parallelism axes.

The reference is single-process (SURVEY §2.4); the TPU build scales out over

* ``seq``  — data parallel over independent video sequences (one map arena
  per sequence, shared jitted kernels; BASELINE config 4), and
* ``shard`` — landmark-block sharding for distributed bundle adjustment
  (Schur contributions reduced with ``psum`` over ICI/DCN; BASELINE config 5).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_vo_mesh(
    num_seq: Optional[int] = None,
    num_shard: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with axes ('seq', 'shard'). Defaults: all devices on 'seq'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if num_seq is None:
        num_seq = n // num_shard
    assert num_seq * num_shard == n, f"{num_seq}x{num_shard} != {n} devices"
    arr = np.asarray(devices).reshape(num_seq, num_shard)
    return Mesh(arr, axis_names=("seq", "shard"))

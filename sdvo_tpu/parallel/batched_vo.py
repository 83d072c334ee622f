"""Data-parallel multi-sequence VO: N independent videos tracked at once.

BASELINE config 4 ("8 parallel KITTI sequences, shared alignment kernels,
per-chip maps"): every per-frame kernel already has fixed shapes, so the whole
tracking step vmaps over a leading ``seq`` axis and shards it over the mesh's
``seq`` devices with ``NamedSharding`` — XLA partitions the batch with zero
cross-device communication (maps are per-sequence).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdvo_tpu.align.image_alignment import AlignFeatures, SparseImageAlign
from sdvo_tpu.geometry.se3 import SE3


def batched_align_step(
    aligner: SparseImageAlign,
    mesh: Mesh,
    num_levels: int,
):
    """Build a jitted, seq-sharded batched alignment step.

    Returns ``step(T_init (S,), host_pyrs, cur_pyrs, feats, fx, fy, cx, cy)``
    where every arg carries a leading sequence axis S sharded over the mesh's
    'seq' devices. ``host_pyrs``/``cur_pyrs`` are tuples of per-level image
    stacks: host (S, n_hosts, H_l, W_l), cur (S, H_l, W_l).
    """
    seq_sharding = NamedSharding(mesh, P("seq"))
    repl = NamedSharding(mesh, P())

    def one(T_init, host_pyr, cur_pyr, feats, fx, fy, cx, cy):
        return aligner._align_impl(T_init, host_pyr, cur_pyr, feats, fx, fy, cx, cy)

    batched = jax.vmap(one, in_axes=(0, 0, 0, 0, None, None, None, None))

    @partial(jax.jit)
    def step(T_init, host_pyrs, cur_pyrs, feats, fx, fy, cx, cy):
        return batched(T_init, host_pyrs, cur_pyrs, feats, fx, fy, cx, cy)

    def place(tree):
        return jax.device_put(tree, seq_sharding)

    step.place = place  # type: ignore[attr-defined]
    return step

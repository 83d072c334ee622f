"""Sparse direct (photometric) image alignment — the core tracking kernel.

TPU-native redesign of the reference's ``ImageAlignment``
(src/image_alignment.cpp:25-380): coarse-to-fine inverse-compositional
Gauss-Newton/LM over small intensity patches at feature locations, estimating a
6-DoF pose per frame.

Key differences from the C++ (deliberate, TPU-first):

* The per-feature ``for`` loops (src/image_alignment.cpp:85-121, :271-303)
  become fixed-shape batched tensors: ``(N, P²)`` patches, ``(N·P², 6)``
  Jacobians, one gather for all patch pixels, one einsum for ``H = JᵀWJ``.
* We optimize the RELATIVE pose ``T_cur_ref`` instead of the absolute world
  pose (the reference optimizes ``curFrame->m_absPose`` directly). The
  relative pose stays near identity for ~0.1s frame spacing, which keeps every
  quantity in float32 range on TPU; the absolute pose is composed on the host
  in float64. Same update rule: ``T ← T · exp(-dx)``
  (src/image_alignment.cpp:372-380).
* The Jacobian chain is evaluated at the point expressed in the REFERENCE
  camera frame: ``J = ∇I_host · dπ/dp|_{p_ref} · [I | -p_ref^]``. (The
  reference evaluates the projection jacobian at the WORLD point,
  src/image_alignment.cpp:163 — a frame-mixing approximation that decays as
  the trajectory leaves the origin; evaluating at the ref-frame point is the
  standard SVO/inverse-compositional form and stays exact everywhere.)
* Features of the reference frame AND its last keyframe participate, as in the
  reference (src/image_alignment.cpp:30-41): every feature carries a
  ``host_idx`` selecting which host image its patch/gradient samples from.
* Per-level optimization runs through the shared batched LM engine
  (sdvo_tpu.optim.optimizer) with Tukey IRLS — the same engine the reference
  drives through callbacks (src/optimizer.cpp:161-370).
* ``backend="pallas"`` (the TPU default) replaces the per-level LM while_loop
  with ONE fused Mosaic kernel (sdvo_tpu.ops.pallas_lm): windows, reference
  patches and frozen Jacobians live in VMEM and the whole
  sample→residual→Tukey→JᵀWJ→solve→retract loop runs in-kernel, so a level
  costs one kernel launch instead of ~100 (PERF.md: launch latency is the
  binding constraint at ~2% of the bandwidth roofline).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from sdvo_tpu.geometry import se3
from sdvo_tpu.geometry.se3 import SE3
from sdvo_tpu.optim.optimizer import LMSettings, optimize_lm


class AlignFeatures(NamedTuple):
    """Fixed-capacity SoA batch of alignment features.

    All arrays have leading dim N (static capacity); ``valid`` masks live
    entries — the reference's nullptr-point skip (src/image_alignment.cpp:88).
    """

    uv_host: jax.Array  # (N, 2) pixel position in host image, level-0 coords
    host_idx: jax.Array  # (N,) int32: index into the stacked host images (0=ref, 1=lastKF)
    points_ref: jax.Array  # (N, 3) 3D point in the REFERENCE camera frame
    valid: jax.Array  # (N,) bool


def _border_ok(uv: jax.Array, width: int, height: int, border: int) -> jax.Array:
    """The reference's integer-border visibility test
    (src/image_alignment.cpp:145-149): floor(u)±border inside the image."""
    ui = jnp.floor(uv[..., 0]).astype(jnp.int32)
    vi = jnp.floor(uv[..., 1]).astype(jnp.int32)
    return (ui - border >= 0) & (vi - border >= 0) & (ui + border < width) & (vi + border < height)


class SparseImageAlign:
    """Coarse-to-fine sparse photometric alignment.

    Static configuration mirrors the reference ctor (patchSize, minLevel,
    maxLevel; include/image_alignment.hpp:25). ``align`` is jit-compiled once
    per (image shape, capacity) combination.
    """

    # hot-path defaults: histogram MAD (no device sorts), relative-decrease
    # early exit, 12-iteration cap. freeze_sigma stays OFF: the robust scale
    # must adapt as the estimate improves — frozen at a weak initial pose it
    # Tukey-rejects exactly the informative residuals (measured: 0.25 m
    # convergence failure on the no-prior alignment test)
    DEFAULT_SETTINGS = LMSettings(mad="hist", min_rel_decrease=1e-3, max_iterations=12)

    def __init__(
        self,
        patch_size: int = 5,
        min_level: int = 0,
        max_level: int = 3,
        settings: LMSettings = DEFAULT_SETTINGS,
        use_esm: bool = True,
        use_windows: bool = True,
        window: int = 16,
        backend: str = "auto",
        level_taper: int = 0,
    ):
        # level_taper: reduce the per-level LM iteration budget by
        # ``taper × (max_level − level)`` at coarse→fine (floor 4). Correct
        # ONLY when each level starts near its optimum (a constant-velocity
        # prior, as in the device pipeline); with a weak/no prior the finest
        # levels need the full budget — keep 0 (the default) there.
        # backend: "xla" = per-level optimize_lm while_loop (portable);
        # "pallas" = fused Mosaic level kernel (ops.pallas_lm) — one launch per
        # level; "auto" = pallas on TPU, xla elsewhere. On CPU the pallas
        # backend runs the kernel in interpret mode (tests/parity only).
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        assert backend in ("xla", "pallas"), backend
        assert backend != "pallas" or use_windows, "pallas backend requires use_windows"
        self.backend = backend
        self.level_taper = int(level_taper)
        self._interpret = jax.default_backend() != "tpu"
        # use_windows: per-feature 16×16 windows + separable-interp sampling
        # (sdvo_tpu.ops.window_sampler) — no full-image shifted stacks, no
        # per-iteration gathers. The LM motion budget inside one level is a
        # few pixels (coarse-to-fine seeds each level near its optimum), so a
        # window with ~4 px of slack loses nothing; features pushed outside
        # their window are masked for that level, like the reference's border
        # visibility test (src/image_alignment.cpp:145-149).
        self.use_esm = bool(use_esm)
        self.use_windows = bool(use_windows)
        self.window = int(window)
        self.patch_size = int(patch_size)
        self.half_patch = self.patch_size // 2
        self.patch_area = self.patch_size * self.patch_size
        self.min_level = int(min_level)
        self.max_level = int(max_level)
        self.settings = settings
        self._jit_align = jax.jit(self._align_impl)

    # -- per-level precompute (the reference's computeJacobian, :69-192) -----
    def precompute_level(
        self,
        host_images: jax.Array,  # (n_hosts, H_l, W_l)
        feats: AlignFeatures,
        fx: jax.Array,
        fy: jax.Array,
        level: int,
    ):
        """Reference patches + inverse-compositional Jacobians at one level.

        Returns (patches (N, P²), J (N, P², 6), visible (N,)).
        """
        scale = 1.0 / (1 << level)
        H, W = host_images.shape[-2:]
        border = self.half_patch + 2
        uv_l = feats.uv_host * scale  # (N, 2)
        visible = feats.valid & _border_ok(uv_l, W, H, border)

        # patch + central-difference gradients via the shifted patch stack —
        # contiguous row gathers instead of scattered element gathers (the
        # reference computes the same quantities with 5 interpolation passes
        # per pixel, src/image_alignment.cpp:179-184)
        from sdvo_tpu.image.stack import build_patch_stack_multi, sample_patches_grad_multi

        hstack = build_patch_stack_multi(host_images, self.patch_size)
        patches, gx, gy, _ = sample_patches_grad_multi(hstack, feats.host_idx, uv_l)

        # 2×6 geometric jacobian at the ref-frame point with level-scaled
        # intrinsics (src/image_alignment.cpp:194-248 formula).
        p = feats.points_ref
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        z_safe = jnp.where(jnp.abs(z) < 1e-9, 1.0, z)
        iz = 1.0 / z_safe
        iz2 = iz * iz
        fxs = fx * scale
        fys = fy * scale
        row_u = jnp.stack(
            [fxs * iz, jnp.zeros_like(x), -fxs * x * iz2, -fxs * x * y * iz2, fxs * (1.0 + x * x * iz2), -fxs * y * iz],
            axis=-1,
        )  # (N, 6)
        row_v = jnp.stack(
            [jnp.zeros_like(x), fys * iz, -fys * y * iz2, -fys * (1.0 + y * y * iz2), fys * x * y * iz2, fys * x * iz],
            axis=-1,
        )
        J = gx[..., None] * row_u[:, None, :] + gy[..., None] * row_v[:, None, :]  # (N, P², 6)
        J = jnp.where(visible[:, None, None], J, 0.0)
        patches = jnp.where(visible[:, None], patches, 0.0)
        return patches, J, visible, (gx, gy, row_u, row_v)

    # -- per-level residuals (the reference's computeResiduals, :251-308) ----
    def _residuals_level(
        self,
        T_cur_ref: SE3,
        cur_stack,  # PatchStack of the current image at this level
        img_shape: Tuple[int, int],  # (H_l, W_l) static
        feats: AlignFeatures,
        patches: jax.Array,
        visible: jax.Array,
        fx: jax.Array,
        fy: jax.Array,
        cx: jax.Array,
        cy: jax.Array,
        level: int,
    ):
        from sdvo_tpu.image.stack import sample_patches

        scale = 1.0 / (1 << level)
        H, W = img_shape
        border = self.half_patch + 2
        p_cur = T_cur_ref.apply(feats.points_ref)  # (N, 3)
        z = jnp.where(p_cur[..., 2] < 1e-6, 1.0, p_cur[..., 2])
        u = (fx * p_cur[..., 0] / z + cx) * scale
        v = (fy * p_cur[..., 1] / z + cy) * scale
        uv_l = jnp.stack([u, v], axis=-1)
        in_front = p_cur[..., 2] > 1e-6
        vis = visible & in_front & _border_ok(uv_l, W, H, border)

        cur_vals, _ = sample_patches(cur_stack, uv_l)  # (N, P²)
        r = cur_vals - patches  # residual = cur - ref (src/image_alignment.cpp:355)
        r = jnp.where(vis[:, None], r, 0.0)
        return r.reshape(-1), jnp.broadcast_to(vis[:, None], r.shape).reshape(-1)

    # -- geometric jacobian rows (shared by both backends) -------------------
    def _jac_rows(self, feats: AlignFeatures, fx, fy, level: int):
        scale = 1.0 / (1 << level)
        p = feats.points_ref
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        z_safe = jnp.where(jnp.abs(z) < 1e-9, 1.0, z)
        iz = 1.0 / z_safe
        iz2 = iz * iz
        fxs = fx * scale
        fys = fy * scale
        row_u = jnp.stack(
            [fxs * iz, jnp.zeros_like(x), -fxs * x * iz2, -fxs * x * y * iz2, fxs * (1.0 + x * x * iz2), -fxs * y * iz],
            axis=-1,
        )
        row_v = jnp.stack(
            [jnp.zeros_like(x), fys * iz, -fys * y * iz2, -fys * (1.0 + y * y * iz2), fys * x * y * iz2, fys * x * iz],
            axis=-1,
        )
        return row_u, row_v

    # -- window-backend coarse-to-fine alignment ----------------------------
    def _align_impl_windows(
        self,
        T_init: SE3,
        host_pyramid: Tuple[jax.Array, ...],  # per level: (n_hosts, H_l, W_l)
        cur_pyramid: Tuple[jax.Array, ...],  # per level: (H_l, W_l)
        feats: AlignFeatures,
        fx: jax.Array,
        fy: jax.Array,
        cx: jax.Array,
        cy: jax.Array,
    ):
        from sdvo_tpu.ops.window_sampler import (
            sample_windows, sample_windows_grad, window_gather,
        )

        WIN = self.window
        P = self.patch_size
        N = feats.uv_host.shape[0]
        dtype = feats.points_ref.dtype
        T = T_init
        rmse = jnp.asarray(0.0, dtype)
        status = jnp.asarray(0, jnp.int32)
        for level in range(self.max_level, self.min_level - 1, -1):
            scale = 1.0 / (1 << level)
            H, W = cur_pyramid[level].shape
            # reference patches + gradients from per-host windows (this block
            # depends only on the host pyramid and feature set — inside a
            # frame scan XLA hoists it out of the loop)
            uv_ref_l = feats.uv_host * scale
            refs = [window_gather(im, uv_ref_l, WIN) for im in host_pyramid[level]]
            win_h = jnp.stack([r[0] for r in refs])  # (n_hosts, N, WIN, 2·blk)
            org_h = jnp.stack([r[1] for r in refs])
            ok_or = refs[0][2]
            sel = (feats.host_idx, jnp.arange(N))
            win_ref = win_h[sel]
            offs_r = uv_ref_l - org_h[sel]
            patches, gx_r, gy_r, ok_r = sample_windows_grad(win_ref, offs_r, P)
            visible = feats.valid & ok_or & ok_r

            row_u, row_v = self._jac_rows(feats, fx, fy, level)

            # current-image windows at the level's initial projection
            uv0 = self._project_level(T, feats, fx, fy, cx, cy, level)
            win_cur, org_c, ok_oc = window_gather(cur_pyramid[level], uv0, WIN)
            visible = visible & ok_oc
            patches = jnp.where(visible[:, None], patches, 0.0)

            if self.use_esm:
                offs0 = uv0 - org_c
                _, gcx, gcy, _ = sample_windows_grad(win_cur, offs0, P)
                gx = 0.5 * (gx_r + gcx)
                gy = 0.5 * (gy_r + gcy)
            else:
                gx, gy = gx_r, gy_r
            J3 = gx[..., None] * row_u[:, None, :] + gy[..., None] * row_v[:, None, :]
            J3 = jnp.where(visible[:, None, None], J3, 0.0)

            if self.backend == "pallas":
                from sdvo_tpu.ops.pallas_lm import lm_align_level

                # pyramid iteration budget: coarse levels absorb the motion
                # (full budget), fine levels only polish a sub-pixel basin —
                # each saved iteration is a full sample+solve pass in-kernel
                its = max(4, self.settings.max_iterations
                          - self.level_taper * (self.max_level - level))
                T, rmse, _iters = lm_align_level(
                    T, win_cur, patches, J3, feats.points_ref, org_c, visible,
                    fx * scale, fy * scale, cx * scale, cy * scale,
                    patch=P, max_iters=its,
                    min_rel_decrease=self.settings.min_rel_decrease,
                    interpret=self._interpret,
                )
                status = jnp.asarray(0, jnp.int32)
                continue

            J = J3.reshape(-1, 6)
            org_cf = org_c

            def residual_fn(T_, _lvl=level, _patches=patches, _visible=visible,
                            _win=win_cur, _org=org_cf):
                p_cur = T_.apply(feats.points_ref)
                z = jnp.where(p_cur[..., 2] < 1e-6, 1.0, p_cur[..., 2])
                scale_ = 1.0 / (1 << _lvl)
                u = (fx * p_cur[..., 0] / z + cx) * scale_
                v = (fy * p_cur[..., 1] / z + cy) * scale_
                offs = jnp.stack([u, v], axis=-1) - _org
                vals, ok_s = sample_windows(_win, offs, P)
                vis = _visible & ok_s & (p_cur[..., 2] > 1e-6)
                r = jnp.where(vis[:, None], vals - _patches, 0.0)
                return r.reshape(-1), jnp.broadcast_to(vis[:, None], r.shape).reshape(-1)

            def jacobian_fn(T_, _J=J):
                return _J

            def update_fn(T_, dx):
                return T_.compose(se3.exp(-dx))

            T, rmse, status = optimize_lm(T, residual_fn, jacobian_fn, update_fn, self.settings)
        return T, rmse, status

    # -- full coarse-to-fine alignment --------------------------------------
    def _align_impl(
        self,
        T_init: SE3,  # initial T_cur_ref (constant-velocity prediction)
        host_pyramid: Tuple[jax.Array, ...],  # per level: (n_hosts, H_l, W_l)
        cur_pyramid: Tuple[jax.Array, ...],  # per level: (H_l, W_l)
        feats: AlignFeatures,
        fx: jax.Array,
        fy: jax.Array,
        cx: jax.Array,
        cy: jax.Array,
    ):
        if self.use_windows:
            return self._align_impl_windows(
                T_init, host_pyramid, cur_pyramid, feats, fx, fy, cx, cy
            )
        from sdvo_tpu.image.stack import build_patch_stack, sample_patches_grad

        T = T_init
        rmse = jnp.asarray(0.0, feats.points_ref.dtype)
        status = jnp.asarray(0, jnp.int32)
        for level in range(self.max_level, self.min_level - 1, -1):
            patches, J, visible, (gx_ref, gy_ref, row_u, row_v) = self.precompute_level(
                host_pyramid[level], feats, fx, fy, level
            )
            J_flat = J.reshape(-1, 6)

            # one shifted patch stack of the current level serves every
            # residual pass of the LM loop (and the ESM gradient sampling)
            cur_stack = build_patch_stack(cur_pyramid[level], self.patch_size)
            img_shape = tuple(cur_pyramid[level].shape)

            def residual_fn(T_, _lvl=level, _patches=patches, _visible=visible,
                            _stack=cur_stack, _shape=img_shape):
                return self._residuals_level(
                    T_, _stack, _shape, feats, _patches, _visible, fx, fy, cx, cy, _lvl
                )

            if self.use_esm:
                # Frozen ESM: average the reference gradients with the CURRENT
                # image gradients sampled ONCE at the level's initial pose
                # (the constant-velocity prior puts the projection within ~a
                # pixel of the optimum). This removes most of the pure-IC bias
                # at the cost of a single extra gradient sampling per level —
                # and because the Jacobian is loop-invariant, XLA hoists it
                # out of the LM while_loop entirely.
                uv0 = self._project_level(T, feats, fx, fy, cx, cy, level)
                _, cgx, cgy, _ = sample_patches_grad(cur_stack, uv0)
                gx = 0.5 * (gx_ref + cgx)
                gy = 0.5 * (gy_ref + cgy)
                J_esm = gx[..., None] * row_u[:, None, :] + gy[..., None] * row_v[:, None, :]
                J_esm = jnp.where(visible[:, None, None], J_esm, 0.0).reshape(-1, 6)

                def jacobian_fn(T_, _J=J_esm):
                    return _J
            else:
                def jacobian_fn(T_, _J=J_flat):
                    return _J

            def update_fn(T_, dx):
                return T_.compose(se3.exp(-dx))

            T, rmse, status = optimize_lm(T, residual_fn, jacobian_fn, update_fn, self.settings)
        return T, rmse, status

    def _project_level(self, T_cur_ref: SE3, feats: AlignFeatures, fx, fy, cx, cy, level: int):
        scale = 1.0 / (1 << level)
        p_cur = T_cur_ref.apply(feats.points_ref)
        z = jnp.where(p_cur[..., 2] < 1e-6, 1.0, p_cur[..., 2])
        u = (fx * p_cur[..., 0] / z + cx) * scale
        v = (fy * p_cur[..., 1] / z + cy) * scale
        return jnp.stack([u, v], axis=-1)

    # -- keyframe-cadence precompute + per-frame consume ---------------------
    def precompute_ref_windows(self, ref_pyramid, feats: AlignFeatures, fx, fy):
        """Reference-side per-level tables: (patches, J, visible) per level.

        The reference half of :meth:`_align_impl_windows` — ref windows,
        patch + gradient sampling, and the frozen inverse-compositional
        Jacobian — depends only on the reference keyframe and its feature
        set, which change at KEYFRAME cadence.  Computing it per frame was
        ~2/3 of the measured alignment cost (round 5 probe: the fused kernel
        itself is ~8 µs/LM-iteration; the per-frame XLA glue dominated).
        The tables ride in the tracker state and are rebuilt once per
        keyframe; :meth:`align_precomputed` consumes them each frame.

        Pure inverse-compositional (the reference's own formulation,
        src/image_alignment.cpp:69-192 computeJacobian — evaluated once per
        level at the reference): no per-frame ESM gradient resampling.
        """
        WIN = self.window
        P = self.patch_size
        out_patches, out_J, out_vis = [], [], []
        from sdvo_tpu.ops.window_sampler import sample_windows_grad, window_gather

        for level in range(self.max_level - self.min_level + 1):
            lv = self.min_level + level
            scale = 1.0 / (1 << lv)
            uv_l = feats.uv_host * scale
            win_r, org_r, ok_r = window_gather(ref_pyramid[lv], uv_l, WIN)
            patches, gx, gy, ok_s = sample_windows_grad(win_r, uv_l - org_r, P)
            row_u, row_v = self._jac_rows(feats, fx, fy, lv)
            J = gx[..., None] * row_u[:, None, :] + gy[..., None] * row_v[:, None, :]
            vis = feats.valid & ok_r & ok_s
            out_patches.append(jnp.where(vis[:, None], patches, 0.0))
            out_J.append(jnp.where(vis[:, None, None], J, 0.0))
            out_vis.append(vis)
        return tuple(out_patches), tuple(out_J), tuple(out_vis)

    def align_precomputed(
        self,
        T_init: SE3,
        tables,  # (patches, J, vis) tuples from precompute_ref_windows
        cur_pyramid: Tuple[jax.Array, ...],  # per level: (H_l, W_l)
        feats: AlignFeatures,
        fx, fy, cx, cy,
    ):
        """Coarse-to-fine alignment against precomputed reference tables.

        Per frame and level this does ONLY: project → gather current-image
        windows → run the level LM (fused Pallas kernel on TPU, XLA
        optimize_lm elsewhere)."""
        from sdvo_tpu.ops.window_sampler import sample_windows, window_gather

        t_patches, t_J, t_vis = tables
        WIN = self.window
        P = self.patch_size
        T = T_init
        rmse = jnp.asarray(0.0, feats.points_ref.dtype)
        status = jnp.asarray(0, jnp.int32)
        for level in range(self.max_level, self.min_level - 1, -1):
            li = level - self.min_level
            patches, J3, vis_ref = t_patches[li], t_J[li], t_vis[li]
            scale = 1.0 / (1 << level)
            uv0 = self._project_level(T, feats, fx, fy, cx, cy, level)
            win_cur, org_c, ok_oc = window_gather(cur_pyramid[level], uv0, WIN)
            visible = vis_ref & ok_oc

            if self.backend == "pallas":
                from sdvo_tpu.ops.pallas_lm import lm_align_level

                its = max(4, self.settings.max_iterations
                          - self.level_taper * (self.max_level - level))
                T, rmse, _iters = lm_align_level(
                    T, win_cur, patches, J3, feats.points_ref, org_c, visible,
                    fx * scale, fy * scale, cx * scale, cy * scale,
                    patch=P, max_iters=its,
                    min_rel_decrease=self.settings.min_rel_decrease,
                    interpret=self._interpret,
                )
                status = jnp.asarray(0, jnp.int32)
                continue

            J = jnp.where(visible[:, None, None], J3, 0.0).reshape(-1, 6)

            def residual_fn(T_, _lvl=level, _patches=patches, _visible=visible,
                            _win=win_cur, _org=org_c):
                p_cur = T_.apply(feats.points_ref)
                z = jnp.where(p_cur[..., 2] < 1e-6, 1.0, p_cur[..., 2])
                scale_ = 1.0 / (1 << _lvl)
                u = (fx * p_cur[..., 0] / z + cx) * scale_
                v = (fy * p_cur[..., 1] / z + cy) * scale_
                offs = jnp.stack([u, v], axis=-1) - _org
                vals, ok_s = sample_windows(_win, offs, P)
                vis = _visible & ok_s & (p_cur[..., 2] > 1e-6)
                r = jnp.where(vis[:, None], vals - _patches, 0.0)
                return r.reshape(-1), jnp.broadcast_to(vis[:, None], r.shape).reshape(-1)

            def jacobian_fn(T_, _J=J):
                return _J

            def update_fn(T_, dx):
                return T_.compose(se3.exp(-dx))

            T, rmse, status = optimize_lm(T, residual_fn, jacobian_fn, update_fn,
                                          self.settings)
        return T, rmse, status

    def align(
        self,
        T_init: SE3,
        host_pyramid: Sequence[jax.Array],
        cur_pyramid: Sequence[jax.Array],
        feats: AlignFeatures,
        fx,
        fy,
        cx,
        cy,
    ) -> Tuple[SE3, jax.Array, jax.Array]:
        """Jitted coarse-to-fine alignment; returns (T_cur_ref, rmse, status)."""
        return self._jit_align(
            T_init, tuple(host_pyramid), tuple(cur_pyramid), feats,
            jnp.asarray(fx), jnp.asarray(fy), jnp.asarray(cx), jnp.asarray(cy),
        )

"""Per-feature 2D patch alignment (translation + illumination offset).

TPU-native redesign of the reference's ``FeatureAlignment``
(src/feature_alignment.cpp:25-205): refines each reprojected feature's pixel
position on the GRADIENT images (level 0) with a 3-parameter
inverse-compositional LM — params (u, v, illumination offset), Jacobian
``[dI/dx, dI/dy, 1]`` per patch pixel fixed at the reference patch, residual
``-(I_cur(warp) - I_ref + offset)``, additive update.

The reference runs one scalar LM per candidate inside ``Map::reprojectCell``
(src/map.cpp:505-579). Here ALL candidates across the whole frame run
simultaneously: every array carries a leading feature axis N, each feature has
its own damping state, and the 3×3 normal solves are closed-form cofactor
inverses batched on the VPU.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sdvo_tpu.geometry.robust import masked_mad
from sdvo_tpu.image.interp import patch_offsets


def _solve3x3(H: jax.Array, g: jax.Array) -> jax.Array:
    """Batched 3×3 solve via cofactor (adjugate) inverse. H: (N,3,3), g: (N,3)."""
    a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    d, e, f = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    g2, h, i = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g2)
    C = d * h - e * g2
    det = a * A + b * B + c * C
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    inv = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g2, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g2), a * e - b * d], axis=-1),
        ],
        axis=-2,
    ) / det_safe[..., None, None]
    dx = jnp.einsum("nij,nj->ni", inv, g)
    return jnp.where((jnp.abs(det) < 1e-12)[..., None], 0.0, dx)


def _tukey_per_feature(res: jax.Array, vis: jax.Array) -> jax.Array:
    """Per-feature Tukey weights over that feature's patch pixels.

    res, vis: (N, P²). Mirrors Optimizer::tukeyWeighting applied per feature.
    """
    sigma = jax.vmap(masked_mad)(res, vis) * 1.4826  # (N,)
    # floor at ~1 intensity level: a near-constant residual patch (e.g. a pure
    # illumination offset before the offset parameter adapts) must not collapse
    # the MAD and zero out every weight
    sigma = jnp.maximum(sigma, 1.0)
    c = 4.6851 * sigma[:, None]
    w = (1.0 - (res * res) / (c * c)) ** 2
    w = jnp.where(jnp.abs(res) <= c, w, 0.0)
    return jnp.where(vis, w, 0.0)


class FeatureAlignState(NamedTuple):
    params: jax.Array  # (N, 3): u, v, illumination offset
    lam: jax.Array  # (N,)
    nu: jax.Array  # (N,)
    chi2: jax.Array  # (N,)
    r: jax.Array  # (N, P²) residuals at current params (carried: halves gathers)
    vis: jax.Array  # (N, P²)
    stalled: jax.Array  # (N,) bool — this feature's LM has converged/stalled
    iteration: jax.Array  # scalar int32


def align_features_2d(
    ref_gradient: jax.Array,  # (H, W) or (K, H, W) host-frame gradient image(s), level 0
    cur_gradient: jax.Array,  # (H, W) gradient image of the current frame
    uv_ref: jax.Array,  # (N, 2) feature position in the host image
    uv_init: jax.Array,  # (N, 2) initial position in the current image
    valid: jax.Array,  # (N,)
    patch_size: int = 5,
    max_iterations: int = 10,
    host_idx: jax.Array = None,  # (N,) int32 into the leading dim of ref_gradient
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched 2D+illumination alignment of N features at once.

    Features may come from different host keyframes: pass ``ref_gradient`` as
    a (K, H, W) stack with ``host_idx`` selecting each feature's host (the
    reprojection path aligns candidates hosted by any window keyframe,
    src/map.cpp:505-579).

    Returns (uv_refined (N,2), final_error (N,) — RMSE over patch pixels in
    gradient-intensity units (the reference gates on 50, src/map.cpp:538),
    converged (N,) bool).
    """
    half = patch_size // 2
    border = half + 2
    H, W = cur_gradient.shape

    if ref_gradient.ndim == 2:
        ref_gradient = ref_gradient[None]
    if host_idx is None:
        host_idx = jnp.zeros((uv_ref.shape[0],), jnp.int32)

    # --- reference patches + fixed jacobian (computeJacobian, :64-110) ------
    # shifted patch stacks: contiguous row gathers instead of scattered
    # element gathers (see sdvo_tpu.image.stack)
    from sdvo_tpu.image.stack import build_patch_stack_multi, sample_patches_grad_multi

    ref_stack = build_patch_stack_multi(ref_gradient, patch_size)
    ref_patch, gx, gy, _ = sample_patches_grad_multi(ref_stack, host_idx, uv_ref)

    ref_inside = (
        (uv_ref[:, 0] >= border) & (uv_ref[:, 1] >= border)
        & (uv_ref[:, 0] < W - border) & (uv_ref[:, 1] < H - border)
    )
    live = valid & ref_inside
    return align_features_2d_cached(
        cur_gradient, ref_patch, gx, gy, uv_init, live, patch_size, max_iterations
    )


def align_features_2d_cached(
    cur_gradient: jax.Array,  # (H, W) gradient image of the current frame
    ref_patch: jax.Array,  # (N, P²) cached reference patches
    gx: jax.Array,  # (N, P²) cached reference-patch x-gradients
    gy: jax.Array,  # (N, P²) cached reference-patch y-gradients
    uv_init: jax.Array,  # (N, 2) initial position in the current image
    live: jax.Array,  # (N,) bool — feature valid AND its ref patch usable
    patch_size: int = 5,
    max_iterations: int = 10,
    window: int = 24,
    backend: str = "auto",
    contrast_threshold: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """:func:`align_features_2d` with PRECOMPUTED reference patch tables.

    An observation's position in its host keyframe never moves, so the map
    arena extracts each observation's patch + gradients once at creation and
    feature alignment consumes those tables.  Per-frame device work touches
    only one ``window×window`` region of the current image per candidate
    (sdvo_tpu.ops.window_sampler): candidates that wander outside their window
    (≥ ~7 px from the prediction) go invisible — the same features the moved-
    too-far convergence gate (patch·2 px) would reject anyway.

    Backend note: the ``pallas`` kernel freezes each feature's state the
    moment IT stalls (per-feature mask), while the ``xla`` path only uses the
    stall test for a global early exit and keeps iterating individually
    stalled features until the whole batch stalls.  This divergence is
    intentional — freezing at the stall point is the per-feature analogue of
    the early exit, costs nothing in-kernel, and only marginal features (a
    stalled LM step that would later un-stall) can land on different uv; the
    parity test bounds the disagreement at <10 % of features.
    """
    half = patch_size // 2
    H, W = cur_gradient.shape
    dtype = uv_init.dtype

    from sdvo_tpu.ops.window_sampler import sample_windows, window_gather

    win, org_f, org_ok = window_gather(cur_gradient, uv_init, window)
    live = live & org_ok

    # ``contrast_threshold`` is in SQUARED intensity units of the input images
    # (default: one level of an 8-bit [0,255] image; callers feeding
    # [0,1]-normalized images must scale it down accordingly)
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from sdvo_tpu.ops.pallas_fa import fa_align_batch

        return fa_align_batch(
            win, ref_patch, gx, gy, uv_init, org_f, live,
            patch=patch_size, max_iters=max_iterations,
            contrast_threshold=contrast_threshold,
            interpret=jax.default_backend() != "tpu",
        )
    ones = jnp.ones_like(gx)
    J = jnp.stack([gx, gy, ones], axis=-1)  # (N, P², 3)

    def residuals(params):
        cur_vals, ok_s = sample_windows(win, params[:, :2] - org_f, patch_size)
        # r = -(cur - ref + offset)  (src/feature_alignment.cpp:155)
        r = -(cur_vals - ref_patch + params[:, None, 2])
        vis = live & ok_s
        visp = jnp.broadcast_to(vis[:, None], r.shape)
        return jnp.where(visp, r, 0.0), visp

    # initialize the illumination offset to the mean patch difference so a
    # constant brightness change is absorbed immediately instead of being
    # Tukey-rejected as "all pixels are outliers" (the reference starts at 0,
    # src/feature_alignment.cpp:41-44, and simply fails on such patches)
    cur0, cur0_ok = sample_windows(win, uv_init - org_f, patch_size)
    cur0_ok = jnp.broadcast_to(cur0_ok[:, None], cur0.shape)
    diff0 = jnp.where(cur0_ok, cur0 - ref_patch, 0.0)
    cnt0 = jnp.maximum(jnp.sum(cur0_ok, axis=-1), 1)
    # r = -(cur - ref + offset): canceling the mean difference needs -mean
    offset0 = -jnp.sum(diff0, axis=-1) / cnt0
    params0 = jnp.concatenate([uv_init, offset0[:, None]], axis=-1)
    r0, vis0 = residuals(params0)
    w0 = _tukey_per_feature(r0, vis0)
    chi0 = jnp.sum(r0 * r0 * w0, axis=-1)

    N = uv_init.shape[0]
    init = FeatureAlignState(
        params=params0,
        lam=jnp.full((N,), 1e-2, dtype),
        nu=jnp.full((N,), 2.0, dtype),
        chi2=chi0,
        r=r0,
        vis=vis0,
        stalled=~live,  # dead features never make progress
        iteration=jnp.asarray(0, jnp.int32),
    )

    def body(s: FeatureAlignState):
        i = s.iteration
        r, vis = s.r, s.vis
        w = _tukey_per_feature(r, vis)
        Jw = J * w[..., None]  # (N, P², 3)
        Hn = jnp.einsum("npi,npj->nij", Jw, J)  # (N, 3, 3)
        gn = jnp.einsum("npi,np->ni", Jw, r)
        lam_eff = jnp.where(i == 0, s.lam * jnp.max(jnp.abs(jnp.diagonal(Hn, axis1=-2, axis2=-1)), axis=-1), s.lam)
        Hd = Hn + lam_eff[:, None, None] * jnp.eye(3, dtype=dtype)
        dx = _solve3x3(Hd, gn)
        new_params = s.params + dx  # additive (src/feature_alignment.cpp:200-205)
        r_new, vis_new = residuals(new_params)
        w_new = _tukey_per_feature(r_new, vis_new)
        chi_new = jnp.sum(r_new * r_new * w_new, axis=-1)
        # normalized gain ratio (see sdvo_tpu.optim.optimizer for rationale)
        pred = jnp.sum(dx * (lam_eff[:, None] * dx + gn), axis=-1)
        rho = (s.chi2 - chi_new) / jnp.maximum(pred, 1e-30)
        success = (s.chi2 - chi_new) > 0.0
        lam_next = jnp.where(
            success,
            lam_eff * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
            lam_eff * s.nu,
        )
        nu_next = jnp.where(success, 2.0, s.nu * 2.0)
        params_next = jnp.where(success[:, None], new_params, s.params)
        chi_next = jnp.where(success, chi_new, s.chi2)
        r_next = jnp.where(success[:, None], r_new, r)
        vis_next = jnp.where(success[:, None], vis_new, vis)
        # per-feature convergence: progress (actual or predicted) exhausted —
        # once EVERY feature stalls the whole batch exits early instead of
        # always burning max_iterations (the reference's per-feature LM has
        # its own early exits, src/optimizer.cpp:314-334)
        chi_ref = jnp.maximum(s.chi2, 1e-30)
        rel_dec = (s.chi2 - chi_new) / chi_ref
        rel_pred = pred / chi_ref
        stalled = s.stalled | (success & (rel_dec < 1e-3)) | (rel_pred < 1e-4)
        return FeatureAlignState(
            params_next, lam_next, nu_next, chi_next, r_next, vis_next,
            stalled, i + 1,
        )

    final = jax.lax.while_loop(
        lambda s: (s.iteration < max_iterations) & ~jnp.all(s.stalled),
        body,
        init,
    )

    r_f, vis_f = residuals(final.params)
    n_vis = jnp.maximum(jnp.sum(vis_f, axis=-1), 1)
    rmse = jnp.sqrt(jnp.sum(r_f * r_f, axis=-1) / n_vis)
    moved = jnp.linalg.norm(final.params[:, :2] - uv_init, axis=-1)
    # contrast gate: a (near-)flat current patch cannot localize anything —
    # without it a textureless frame "matches" every candidate because the
    # illumination offset absorbs the constant difference (the reference
    # avoids this only by accident: it starts the offset at 0 and the full
    # patch magnitude then exceeds the error threshold)
    cur_f, _ = sample_windows(win, final.params[:, :2] - org_f, patch_size)
    mean_c = jnp.sum(jnp.where(vis_f, cur_f, 0.0), axis=-1) / n_vis
    var_c = jnp.sum(jnp.where(vis_f, (cur_f - mean_c[:, None]) ** 2, 0.0), axis=-1) / n_vis
    has_contrast = var_c > contrast_threshold  # structured current patch
    converged = live & (moved < patch_size * 2.0) & has_contrast
    return final.params[:, :2], rmse, converged

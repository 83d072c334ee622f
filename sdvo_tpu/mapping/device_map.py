"""Device-resident map arena: the full reprojection pass as one tensor program.

The host ``MapArena`` (sdvo_tpu.mapping.arena) mirrors the reference's Map as
numpy bookkeeping; this module is its device twin — every array is a fixed-
capacity jax array carried through ``lax.scan``, so the whole steady-state
pipeline (tracking + reprojection + filters + keyframe work) runs for many
frames per host dispatch.  Reference scope covered here:

* ``Map::reprojectMap`` / ``reprojectPoint`` / ``reprojectCell``
  (src/map.cpp:223-579): project every (keyframe, feature) observation of a
  GOOD/CANDIDATE point, close-view observation selection
  (``Point::getCloseViewObservation``, src/point.cpp:118-181, 60 deg cutoff),
  grid binning with one candidate per cell (GOOD preferred, pseudo-random
  tie-break replacing the reference's shuffled cell visit order), the 150-
  match cap (src/map.cpp:484-487), and batched feature alignment against the
  arena's cached reference-patch tables.
* ``Point`` quality counters + promotion/kill policy (src/map.cpp:505-579).

Everything is branch-free masked tensor code: selection uses scatter-max of
integer priority keys (unique per observation, so ties cannot double-select a
point) and ``lax.top_k`` for the capacity cap.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sdvo_tpu.align.feature_alignment import align_features_2d_cached
from sdvo_tpu.geometry.se3 import SE3
from sdvo_tpu.mapping.arena import PointType


class DeviceMap(NamedTuple):
    """Fixed-capacity SoA map state (all device arrays).

    Shapes: K keyframe slots, F features per keyframe, P point slots,
    P2 = feature-alignment patch area.
    """

    kf_R: jax.Array  # (K, 3, 3) world→camera rotation
    kf_t: jax.Array  # (K, 3)
    kf_valid: jax.Array  # (K,) bool
    kf_frame_id: jax.Array  # (K,) int32
    kf_counter: jax.Array  # scalar int32 — total keyframes ever (staleness clock)
    kf_img0: jax.Array  # (K, H, W) level-0 keyframe images (checkpoint/reloc)

    feat_uv: jax.Array  # (K, F, 2)
    feat_point: jax.Array  # (K, F) int32 point slot, -1 = none
    feat_valid: jax.Array  # (K, F) bool
    feat_patch: jax.Array  # (K, F, P2) cached ref patch on the host gradient image
    feat_gx: jax.Array  # (K, F, P2)
    feat_gy: jax.Array  # (K, F, P2)
    feat_ok: jax.Array  # (K, F) bool — patch fully inside the image

    pt_pos: jax.Array  # (P, 3) world position
    pt_type: jax.Array  # (P,) int32 PointType
    pt_valid: jax.Array  # (P,) bool
    pt_succ: jax.Array  # (P,) int32 projection successes
    pt_fail: jax.Array  # (P,) int32 projection failures

    @staticmethod
    def empty(max_kf: int, max_feat: int, max_pts: int, patch_area: int,
              img_hw: Tuple[int, int] = (0, 0), dtype=jnp.float32) -> "DeviceMap":
        K, F, P = max_kf, max_feat, max_pts
        return DeviceMap(
            kf_R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (K, 3, 3)),
            kf_t=jnp.zeros((K, 3), dtype),
            kf_valid=jnp.zeros((K,), bool),
            kf_frame_id=-jnp.ones((K,), jnp.int32),
            kf_counter=jnp.asarray(0, jnp.int32),
            kf_img0=jnp.zeros((K,) + tuple(img_hw), dtype),
            feat_uv=jnp.zeros((K, F, 2), dtype),
            feat_point=-jnp.ones((K, F), jnp.int32),
            feat_valid=jnp.zeros((K, F), bool),
            feat_patch=jnp.zeros((K, F, patch_area), dtype),
            feat_gx=jnp.zeros((K, F, patch_area), dtype),
            feat_gy=jnp.zeros((K, F, patch_area), dtype),
            feat_ok=jnp.zeros((K, F), bool),
            pt_pos=jnp.zeros((P, 3), dtype),
            pt_type=jnp.full((P,), int(PointType.UNKNOWN), jnp.int32),
            pt_valid=jnp.zeros((P,), bool),
            pt_succ=jnp.zeros((P,), jnp.int32),
            pt_fail=jnp.zeros((P,), jnp.int32),
        )

    def kf_pose(self) -> SE3:
        return SE3(self.kf_R, self.kf_t)

    def kf_centers(self) -> jax.Array:
        """(K, 3) camera centers in world frame (-Rᵀt)."""
        return -jnp.einsum("kji,kj->ki", self.kf_R, self.kf_t)


class DeviceMatches(NamedTuple):
    """Fixed-capacity (M,) reprojection matches of one frame."""

    pt_slot: jax.Array  # (M,) int32 point slot (clipped; gate on `good`)
    uv: jax.Array  # (M, 2) refined pixel position in the current frame
    err: jax.Array  # (M,) feature-alignment RMSE
    good: jax.Array  # (M,) bool — converged, error < threshold
    n_good: jax.Array  # scalar int32


def _scatter_argmax(key: jax.Array, seg: jax.Array, num_segments: int) -> jax.Array:
    """Per-segment winner mask: True where key equals the segment max AND this
    row holds the unique max (keys must be unique among contenders)."""
    best = jnp.full((num_segments,), jnp.iinfo(jnp.int32).min, jnp.int32)
    best = best.at[seg].max(key)
    return key == best[seg]


def reproject_device(
    m: DeviceMap,
    T_cur_w: SE3,
    cur_gradient: jax.Array,  # (H, W) gradient image of the current frame
    fx, fy, cx, cy,
    cell_size: int,
    max_matches: int,
    max_error: float,
    patch_size: int,
    frame_salt: jax.Array,  # scalar int32 — varies the cell shuffle per frame
    backend: str = "auto",  # feature-alignment backend (see align_features_2d_cached)
) -> Tuple[DeviceMap, DeviceMatches]:
    """One full reprojection pass (Map::reprojectMap, src/map.cpp:260-489)."""
    K, F = m.feat_valid.shape
    P = m.pt_pos.shape[0]
    KF = K * F
    H, W = cur_gradient.shape
    border = 8.0
    dtype = m.pt_pos.dtype

    pt = m.feat_point.reshape(KF)
    pt_c = jnp.clip(pt, 0, P - 1)
    ptype = m.pt_type[pt_c]
    obs_valid = (
        m.feat_valid.reshape(KF) & (pt >= 0) & m.pt_valid[pt_c] & m.feat_ok.reshape(KF)
        & ((ptype == int(PointType.GOOD)) | (ptype == int(PointType.CANDIDATE)))
    )

    # --- project all observations' points into the current frame ------------
    pos = m.pt_pos[pt_c]  # (KF, 3)
    p_cam = T_cur_w.apply(pos)
    z = p_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * p_cam[..., 0] / z_safe + cx
    v = fy * p_cam[..., 1] / z_safe + cy
    vis = (
        obs_valid & (z > 1e-6)
        & (u >= border) & (v >= border) & (u < W - border) & (v < H - border)
    )

    # projection failures feed the point quality counters (src/map.cpp:505-579)
    pt_fail = m.pt_fail.at[pt_c].add((obs_valid & ~vis).astype(jnp.int32))

    # --- close-view observation selection (src/point.cpp:118-181) -----------
    cur_center = -jnp.einsum("ji,j->i", T_cur_w.rotation, T_cur_w.translation)
    dir_cur = cur_center[None] - pos
    dir_cur = dir_cur / jnp.maximum(jnp.linalg.norm(dir_cur, axis=-1, keepdims=True), 1e-12)
    kf_center = m.kf_centers()  # (K, 3)
    obs_center = jnp.repeat(kf_center, F, axis=0)  # (KF, 3)
    dir_obs = obs_center - pos
    dir_obs = dir_obs / jnp.maximum(jnp.linalg.norm(dir_obs, axis=-1, keepdims=True), 1e-12)
    cos_view = jnp.sum(dir_cur * dir_obs, axis=-1)
    usable = vis & (cos_view > 0.5)  # cos 60 deg cutoff

    # unique integer key: quantized cosine then observation index as tie-break
    idx = jnp.arange(KF, dtype=jnp.int32)
    ckey = (jnp.clip(cos_view, 0.0, 1.0) * 16384.0).astype(jnp.int32)
    ckey = jnp.where(usable, ckey * KF + idx, jnp.iinfo(jnp.int32).min)
    winner = usable & _scatter_argmax(ckey, pt_c, P)

    # --- grid binning: one candidate per cell, GOOD preferred ---------------
    gc = (W + cell_size - 1) // cell_size
    gr = (H + cell_size - 1) // cell_size
    cell = (
        jnp.clip((v / cell_size).astype(jnp.int32), 0, gr - 1) * gc
        + jnp.clip((u / cell_size).astype(jnp.int32), 0, gc - 1)
    )
    quality = (ptype == int(PointType.GOOD)).astype(jnp.int32)
    # pseudo-random tie-break = the reference's shuffled candidate visit order
    h = ((idx * jnp.int32(2654435761 & 0x7FFFFFFF)) ^ (frame_salt * jnp.int32(40503))) & 1023
    gkey = jnp.where(winner, (quality * 2048 + h) * KF + idx, jnp.iinfo(jnp.int32).min)
    cell_win = winner & _scatter_argmax(gkey, cell, gr * gc)

    # --- cap to max_matches (src/map.cpp:484-487), shuffled preference ------
    prio = jnp.where(cell_win, (quality * 2048 + h).astype(dtype), -1.0)
    topv, sel = jax.lax.top_k(prio, max_matches)
    live = topv >= 0.0
    kf_of = sel // F
    row_of = sel % F

    uv_init = jnp.stack([u[sel], v[sel]], axis=-1)
    ref_patch = m.feat_patch[kf_of, row_of]
    ref_gx = m.feat_gx[kf_of, row_of]
    ref_gy = m.feat_gy[kf_of, row_of]

    # --- batched feature alignment off the cached patch tables --------------
    uv_out, err, conv = align_features_2d_cached(
        cur_gradient, ref_patch, ref_gx, ref_gy, uv_init.astype(dtype), live,
        patch_size=patch_size, backend=backend,
    )
    good = live & conv & (err < max_error)

    # --- quality counters + promote / kill (src/map.cpp:505-579) ------------
    sel_pt = pt_c[sel]
    pt_succ = m.pt_succ.at[sel_pt].add(good.astype(jnp.int32))
    pt_fail = pt_fail.at[sel_pt].add((live & ~good).astype(jnp.int32))
    promote = (pt_succ >= 3) & (m.pt_type == int(PointType.CANDIDATE)) & m.pt_valid
    pt_type = jnp.where(promote, int(PointType.GOOD), m.pt_type)
    kill = (pt_fail > 15) & (pt_fail > 3 * jnp.maximum(pt_succ, 1)) & m.pt_valid
    pt_valid = m.pt_valid & ~kill
    pt_type = jnp.where(kill, int(PointType.DELETED), pt_type)
    # detach features of killed points (removal cascade, src/map.cpp:26-110)
    feat_killed = kill[jnp.clip(m.feat_point, 0, P - 1)] & (m.feat_point >= 0)
    feat_valid = m.feat_valid & ~feat_killed

    m_out = m._replace(
        pt_succ=pt_succ, pt_fail=pt_fail, pt_type=pt_type, pt_valid=pt_valid,
        feat_valid=feat_valid,
    )
    matches = DeviceMatches(
        pt_slot=sel_pt, uv=uv_out, err=err, good=good,
        n_good=jnp.sum(good.astype(jnp.int32)),
    )
    return m_out, matches


def orphan_point_cleanup(m: DeviceMap) -> DeviceMap:
    """Invalidate points that lost every observation (the reference's removal
    cascade endpoint, src/map.cpp:26-110). Branch-free scatter-add count."""
    P = m.pt_pos.shape[0]
    pt = jnp.clip(m.feat_point.reshape(-1), 0, P - 1)
    cnt = jnp.zeros((P,), jnp.int32).at[pt].add(
        (m.feat_valid.reshape(-1) & (m.feat_point.reshape(-1) >= 0)).astype(jnp.int32)
    )
    gone = m.pt_valid & (cnt == 0)
    return m._replace(
        pt_valid=m.pt_valid & ~gone,
        pt_type=jnp.where(gone, int(PointType.DELETED), m.pt_type),
    )


def evict_furthest_keyframe(m: DeviceMap, keep_slot: jax.Array, max_keyframes: int) -> Tuple[DeviceMap, jax.Array]:
    """Sliding-window eviction (src/system.cpp:436-442): when more than
    ``max_keyframes`` are live, drop the keyframe furthest from ``keep_slot``'s
    camera center. Returns (map', evicted_slot or -1)."""
    centers = m.kf_centers()
    ref_center = centers[keep_slot]
    d = jnp.linalg.norm(centers - ref_center[None], axis=-1)
    cand = m.kf_valid & (jnp.arange(m.kf_valid.shape[0]) != keep_slot)
    d = jnp.where(cand, d, -1.0)
    evict = jnp.argmax(d).astype(jnp.int32)
    need = jnp.sum(m.kf_valid.astype(jnp.int32)) > max_keyframes
    hit = need & (jnp.arange(m.kf_valid.shape[0]) == evict)
    m = m._replace(
        kf_valid=m.kf_valid & ~hit,
        feat_valid=m.feat_valid & ~hit[:, None],
    )
    m = orphan_point_cleanup(m)
    return m, jnp.where(need, evict, -1)


def alloc_free_slots(valid: jax.Array, n: int) -> Tuple[jax.Array, jax.Array]:
    """First ``n`` free slots of a validity mask (lowest indices first).

    Returns (slots (n,) int32, ok (n,) bool) — ok is False where fewer than n
    slots were free (XLA top_k is stable: equal keys resolve to lower index).
    """
    size = valid.shape[0]
    k = min(n, size)  # requesting more slots than exist: the excess is ok=False
    free = (~valid).astype(jnp.int32)
    val, slots = jax.lax.top_k(free, k)
    if k < n:
        slots = jnp.concatenate([slots, jnp.zeros((n - k,), slots.dtype)])
        val = jnp.concatenate([val, jnp.zeros((n - k,), val.dtype)])
    return slots.astype(jnp.int32), val > 0

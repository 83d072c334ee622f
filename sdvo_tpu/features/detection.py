"""Feature detection: gradient-magnitude threshold + SSC ANMS + grid bucketing.

Re-implements the reference's ``FeatureSelection`` (src/feature_selection.cpp):

* ``gradient_magnitude_with_ssc`` (:27-89): threshold all pixels → sort by
  response → SSC ANMS to ~target count → one-feature-per-cell bucketing.
  Detection runs once per keyframe, so the pixel scan runs on device (the
  gradient image is already there) and the data-dependent SSC/bucketing run on
  host (native C++ via ctypes, see sdvo_tpu.features.ssc).
* ``detect_gradient_by_value`` (:91-163): the max-response-per-grid-cell
  detector — fully on device, fixed output shape (n_cells,), jit-friendly;
  this is the fast path used during tracking re-detection.
* occupancy grid with ``set_existing_features`` semantics (:269-282): cells
  holding an existing feature are skipped on re-detection.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdvo_tpu.features import ssc as ssc_mod


class FeatureType:
    """include/feature.hpp:20-25."""

    CORNER = 0
    EDGE = 1
    DEFAULT = 2


class DetectedFeatures(NamedTuple):
    uv: np.ndarray  # (K, 2) float32 pixel positions
    response: np.ndarray  # (K,)
    angle: np.ndarray  # (K,) gradient orientation (radians) — reference stores uint8 orientation
    ftype: np.ndarray = None  # (K,) int FeatureType (reference tags gradient-magnitude detections CORNER)


def gradient_orientation(image: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """Gradient orientation atan2(dy, dx) at integer feature pixels — the
    reference stores it on every Feature (include/feature.hpp, set from the
    detection gradients)."""
    if len(uv) == 0:
        return np.zeros((0,), np.float32)
    img = np.asarray(image, np.float32)
    H, W = img.shape
    x = np.clip(np.asarray(uv)[:, 0].astype(int), 1, W - 2)
    y = np.clip(np.asarray(uv)[:, 1].astype(int), 1, H - 2)
    gx = 0.5 * (img[y, x + 1] - img[y, x - 1])
    gy = 0.5 * (img[y + 1, x] - img[y - 1, x])
    return np.arctan2(gy, gx).astype(np.float32)


def gradient_magnitude_with_ssc(
    gradient_image: np.ndarray,
    detection_threshold: int,
    num_candidates: int,
    cell_size: int,
    occupancy: Optional[np.ndarray] = None,
    tolerance: float = 0.1,
    use_bucketing: bool = True,
) -> Tuple[DetectedFeatures, np.ndarray]:
    """Keyframe detector (reference gradientMagnitudeWithSSC).

    ``occupancy``: optional (grid_rows, grid_cols) uint8 grid whose occupied
    cells are skipped (setExistingFeatures). Returns (features, occupancy).
    """
    grad = np.asarray(gradient_image)
    rows, cols = grad.shape
    grid_cols = int(np.ceil(cols / cell_size))
    grid_rows = int(np.ceil(rows / cell_size))
    if occupancy is None:
        occupancy = np.zeros((grid_rows, grid_cols), dtype=np.uint8)

    xs, ys, resp = ssc_mod.threshold_extract(grad, detection_threshold)
    if xs.shape[0] == 0:
        empty = np.empty(0, np.float32)
        return DetectedFeatures(np.empty((0, 2), np.float32), empty, empty,
                                np.empty(0, np.int32)), occupancy

    sel = ssc_mod.ssc_select(xs, ys, num_candidates, tolerance, cols, rows)
    xs, ys, resp = xs[sel], ys[sel], resp[sel]

    if use_bucketing:
        occupancy, keep = ssc_mod.bucket_points(xs, ys, cell_size, grid_cols, grid_rows, occupancy)
        xs, ys, resp = xs[keep], ys[keep], resp[keep]

    uv = np.stack([xs, ys], axis=-1)
    # orientation of the magnitude surface at the feature; gradient-magnitude
    # detections are tagged CORNER like the reference's detector
    angle = gradient_orientation(grad, uv)
    ftype = np.full(len(uv), FeatureType.CORNER, np.int32)
    return DetectedFeatures(uv, resp, angle, ftype), occupancy


def detect_gradient_by_value(
    gradient_image: jax.Array,
    threshold: float,
    cell_size: int,
    occupied: Optional[jax.Array] = None,
):
    """Device-side max-per-cell detector (reference gradientMagnitudeByValue).

    Fixed output shape: one candidate per grid cell.

    Returns (uv (C, 2), response (C,), valid (C,)) where C = grid_rows*grid_cols.
    """
    H, W = gradient_image.shape
    gr = H // cell_size
    gc = W // cell_size
    img = gradient_image[: gr * cell_size, : gc * cell_size]
    cells = img.reshape(gr, cell_size, gc, cell_size).transpose(0, 2, 1, 3).reshape(gr, gc, -1)
    best = jnp.argmax(cells, axis=-1)  # (gr, gc)
    resp = jnp.max(cells, axis=-1)
    by = best // cell_size
    bx = best % cell_size
    cy = jnp.arange(gr)[:, None] * cell_size
    cx = jnp.arange(gc)[None, :] * cell_size
    uv = jnp.stack([(cx + bx).astype(img.dtype), (cy + by).astype(img.dtype)], axis=-1)
    valid = resp > threshold
    if occupied is not None:
        valid = valid & ~occupied[:gr, :gc]
    return uv.reshape(-1, 2), resp.reshape(-1), valid.reshape(-1)


class FeatureSelection:
    """Stateful facade mirroring the reference class: owns the occupancy grid,
    exposes both detectors + grid bookkeeping."""

    def __init__(self, width: int, height: int, cell_size: int):
        self.width = int(width)
        self.height = int(height)
        self.cell_size = int(cell_size)
        self.grid_cols = int(np.ceil(width / cell_size))
        self.grid_rows = int(np.ceil(height / cell_size))
        self.occupancy = np.zeros((self.grid_rows, self.grid_cols), dtype=np.uint8)

    def reset_grid(self):
        """resetGridOccupancy (feature_selection.cpp:284-287)."""
        self.occupancy[:] = 0

    def set_existing_features(self, uv: np.ndarray):
        """Mark cells of existing features occupied (setExistingFeatures)."""
        if len(uv) == 0:
            return
        cx = (np.asarray(uv)[:, 0] // self.cell_size).astype(int)
        cy = (np.asarray(uv)[:, 1] // self.cell_size).astype(int)
        ok = (cx >= 0) & (cy >= 0) & (cx < self.grid_cols) & (cy < self.grid_rows)
        self.occupancy[cy[ok], cx[ok]] = 1

    def detect_with_ssc(self, gradient_image, threshold: int, num_candidates: int) -> DetectedFeatures:
        feats, self.occupancy = gradient_magnitude_with_ssc(
            gradient_image, threshold, num_candidates, self.cell_size, self.occupancy
        )
        return feats

    def detect_by_value(self, gradient_image, threshold: float):
        occ = jnp.asarray(self.occupancy.astype(bool))
        return detect_gradient_by_value(gradient_image, threshold, self.cell_size, occ)

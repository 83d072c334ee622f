"""SSC adaptive non-maximal suppression — native C++ with Python fallback.

Per-keyframe feature selection is the one data-dependent, branch-heavy stage
of the pipeline (binary search on the suppression radius, sequential covering
— reference feature_selection.cpp:165-248). It runs on host: natively via
``native/libsdvo_host.so`` (ctypes), or in pure Python when the library is not
built. Both paths implement the same published SSC algorithm.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(here, "native", "libsdvo_host.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.sdvo_ssc_select.restype = ctypes.c_int32
        lib.sdvo_ssc_select.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sdvo_threshold_extract.restype = ctypes.c_int32
        lib.sdvo_threshold_extract.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
        ]
        lib.sdvo_bucket_points.restype = ctypes.c_int32
        lib.sdvo_bucket_points.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def have_native() -> bool:
    return _load_lib() is not None


def _as_f32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


def ssc_select(
    xs: np.ndarray, ys: np.ndarray, num_ret_points: int, tolerance: float,
    cols: int, rows: int,
) -> np.ndarray:
    """Select ~num_ret_points indices (into the response-sorted input)."""
    xs = _as_f32(xs)
    ys = _as_f32(ys)
    n = xs.shape[0]
    lib = _load_lib()
    if lib is not None:
        out = np.empty(n, dtype=np.int32)
        count = lib.sdvo_ssc_select(
            xs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ys.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, int(num_ret_points), float(tolerance), int(cols), int(rows),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out[:count]
    return _ssc_python(xs, ys, num_ret_points, tolerance, cols, rows)


def _ssc_python(xs, ys, num_ret_points, tolerance, cols, rows) -> np.ndarray:
    n = xs.shape[0]
    if n == 0 or num_ret_points <= 0:
        return np.empty(0, dtype=np.int32)
    if n <= num_ret_points:
        return np.arange(n, dtype=np.int32)
    exp1 = rows + cols + 2 * num_ret_points
    exp2 = (
        4 * cols + 4 * num_ret_points + 4 * rows * num_ret_points
        + rows * rows + cols * cols - 2 * rows * cols + 4 * rows * cols * num_ret_points
    )
    exp3 = np.sqrt(float(exp2))
    exp4 = 2.0 * (num_ret_points - 1)
    high = int(max(-round((exp1 + exp3) / exp4), -round((exp1 - exp3) / exp4)))
    low = int(np.sqrt(n / num_ret_points))
    kmin = round(num_ret_points - num_ret_points * tolerance)
    kmax = round(num_ret_points + num_ret_points * tolerance)
    prev_width = -1
    result = prev_result = np.empty(0, dtype=np.int32)
    while True:
        width = low + (high - low) // 2
        if width == prev_width or low > high:
            result = prev_result
            break
        c = width / 2.0
        ncols = int(cols / c)
        nrows = int(rows / c)
        covered = np.zeros((nrows + 1, ncols + 1), dtype=bool)
        reach = int(width / c)
        sel = []
        rr = (ys / c).astype(np.int32)
        cc = (xs / c).astype(np.int32)
        for i in range(n):
            r, col = rr[i], cc[i]
            if r > nrows or col > ncols:
                continue
            if not covered[r, col]:
                sel.append(i)
                covered[max(r - reach, 0): min(r + reach, nrows) + 1,
                        max(col - reach, 0): min(col + reach, ncols) + 1] = True
        result = np.asarray(sel, dtype=np.int32)
        if kmin <= len(sel) <= kmax:
            break
        if len(sel) < kmin:
            high = width - 1
        else:
            low = width + 1
        prev_width = width
        prev_result = result
    return result


def threshold_extract(grad: np.ndarray, threshold: int, max_out: int = 100000) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pixels with gradient response > threshold, sorted by response desc.

    Returns (x, y, response) float32 arrays.
    """
    grad_u8 = np.ascontiguousarray(np.clip(grad, 0, 255), dtype=np.uint8)
    lib = _load_lib()
    if lib is not None:
        out_x = np.empty(max_out, np.float32)
        out_y = np.empty(max_out, np.float32)
        out_r = np.empty(max_out, np.float32)
        count = lib.sdvo_threshold_extract(
            grad_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            grad_u8.shape[0], grad_u8.shape[1], int(threshold),
            out_x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_r.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_out,
        )
        return out_x[:count], out_y[:count], out_r[:count]
    ys, xs = np.nonzero(grad_u8 > threshold)
    resp = grad_u8[ys, xs].astype(np.float32)
    order = np.argsort(-resp, kind="stable")[:max_out]
    return xs[order].astype(np.float32), ys[order].astype(np.float32), resp[order]


def bucket_points(
    xs: np.ndarray, ys: np.ndarray, cell_size: int, grid_cols: int, grid_rows: int,
    occupancy: np.ndarray,
) -> np.ndarray:
    """One point per free grid cell (mutates ``occupancy`` in place)."""
    xs = _as_f32(xs)
    ys = _as_f32(ys)
    occupancy = np.ascontiguousarray(occupancy, dtype=np.uint8)
    lib = _load_lib()
    if lib is not None:
        keep = np.empty(xs.shape[0], dtype=np.int32)
        count = lib.sdvo_bucket_points(
            xs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ys.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            xs.shape[0], int(cell_size), int(grid_cols), int(grid_rows),
            occupancy.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return occupancy, keep[:count]
    kept = []
    for i in range(xs.shape[0]):
        cx = int(xs[i]) // cell_size
        cy = int(ys[i]) // cell_size
        if 0 <= cx < grid_cols and 0 <= cy < grid_rows and not occupancy[cy, cx]:
            occupancy[cy, cx] = 1
            kept.append(i)
    return occupancy, np.asarray(kept, dtype=np.int32)

"""Image overlay suite — the reference's ``visualization.cpp`` equivalent.

The reference draws with OpenCV (named color palette
include/visualization.hpp:33-40, drawing functors :44-55; feature points,
grids, depth colormaps, reprojection overlays, epipolar lines, patch mosaics,
src/visualization.cpp:116-595). Here PIL does the rasterizing; every function
takes/returns uint8 numpy RGB images so outputs drop straight into files.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence, Tuple

import numpy as np

# named palette (include/visualization.hpp:33-40)
COLORS = {
    "red": (255, 0, 0),
    "green": (0, 255, 0),
    "blue": (0, 0, 255),
    "cyan": (0, 255, 255),
    "orange": (255, 165, 0),
    "pink": (255, 105, 180),
    "yellow": (255, 255, 0),
    "purple": (160, 32, 240),
    "white": (255, 255, 255),
    "black": (0, 0, 0),
}


def _rgb(color) -> Tuple[int, int, int]:
    return COLORS.get(color, color) if isinstance(color, str) else tuple(color)


def get_color_image(gray: np.ndarray) -> np.ndarray:
    """Grayscale (H, W) → RGB uint8 (``visualization::getColorImage``)."""
    g = np.clip(np.asarray(gray), 0, 255).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def _draw(img: np.ndarray):
    from PIL import Image, ImageDraw

    pil = Image.fromarray(img)
    return pil, ImageDraw.Draw(pil)


def draw_feature_points(
    img: np.ndarray, uv: np.ndarray, radius: int = 4, color="orange", shape: str = "circle"
) -> np.ndarray:
    """circle/rectangle feature markers (``visualization::featurePoints`` with
    drawingCircle/drawingRectangle functors)."""
    pil, d = _draw(img)
    c = _rgb(color)
    for x, y in np.asarray(uv):
        box = [x - radius, y - radius, x + radius, y + radius]
        if shape == "circle":
            d.ellipse(box, outline=c, width=1)
        else:
            d.rectangle(box, outline=c, width=1)
    return np.asarray(pil)


def draw_image_grid(img: np.ndarray, cell_size: int, color="green") -> np.ndarray:
    """Cell grid overlay (``visualization::imageGrid``)."""
    pil, d = _draw(img)
    c = _rgb(color)
    H, W = img.shape[:2]
    for x in range(0, W, cell_size):
        d.line([(x, 0), (x, H - 1)], fill=c, width=1)
    for y in range(0, H, cell_size):
        d.line([(0, y), (W - 1, y)], fill=c, width=1)
    return np.asarray(pil)


def colormap_depth(depths: np.ndarray, d_min: Optional[float] = None, d_max: Optional[float] = None) -> np.ndarray:
    """Depth → RGB jet-style colors (``visualization::colormapDepth``)."""
    d = np.asarray(depths, np.float64)
    d_min = d_min if d_min is not None else np.nanmin(d)
    d_max = d_max if d_max is not None else np.nanmax(d)
    t = np.clip((d - d_min) / max(d_max - d_min, 1e-9), 0, 1)
    r = np.clip(1.5 - np.abs(4 * t - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * t - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * t - 1), 0, 1)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


def draw_reprojected_points(
    img: np.ndarray, uv_proj: np.ndarray, depths: Optional[np.ndarray] = None,
    radius: int = 4,
) -> np.ndarray:
    """Project map points, colored by depth
    (``visualization::projectPointsWithRelativePose`` + colormapDepth)."""
    colors = colormap_depth(depths) if depths is not None else None
    pil, d = _draw(img)
    for i, (x, y) in enumerate(np.asarray(uv_proj)):
        c = tuple(colors[i]) if colors is not None else COLORS["cyan"]
        d.ellipse([x - radius, y - radius, x + radius, y + radius], outline=c, width=1)
    return np.asarray(pil)


def draw_epipolar_lines(
    img: np.ndarray, F: np.ndarray, uv_ref: np.ndarray, color="yellow"
) -> np.ndarray:
    """Epipolar lines l' = F x in the current image
    (``visualization::epipolarLines`` family)."""
    pil, d = _draw(img)
    c = _rgb(color)
    H, W = img.shape[:2]
    for u, v in np.asarray(uv_ref):
        a, b, cc = F @ np.array([u, v, 1.0])
        if abs(b) > 1e-9:
            y0 = -(cc + a * 0) / b
            y1 = -(cc + a * (W - 1)) / b
            d.line([(0, y0), (W - 1, y1)], fill=c, width=1)
    return np.asarray(pil)


def patch_mosaic(patches: np.ndarray, patch_size: int, cols: int = 10, scale: int = 8) -> np.ndarray:
    """Tile N patches into a mosaic (``visualization::referencePatches`` /
    ``residualsPatches``)."""
    N = patches.shape[0]
    rows = (N + cols - 1) // cols
    p = np.asarray(patches).reshape(N, patch_size, patch_size)
    lo, hi = p.min(), p.max()
    p8 = ((p - lo) / max(hi - lo, 1e-9) * 255).astype(np.uint8)
    canvas = np.zeros((rows * (patch_size + 1), cols * (patch_size + 1)), np.uint8)
    for i in range(N):
        r, c = divmod(i, cols)
        canvas[
            r * (patch_size + 1) : r * (patch_size + 1) + patch_size,
            c * (patch_size + 1) : c * (patch_size + 1) + patch_size,
        ] = p8[i]
    big = np.kron(canvas, np.ones((scale, scale), np.uint8))
    return np.stack([big] * 3, axis=-1)


def stack_vertically(a: np.ndarray, b: np.ndarray, gap: int = 8) -> np.ndarray:
    """(``visualization::stickTwoImageVertically``)."""
    W = max(a.shape[1], b.shape[1])

    def pad(x):
        if x.shape[1] < W:
            x = np.pad(x, ((0, 0), (0, W - x.shape[1]), (0, 0)))
        return x

    spacer = np.zeros((gap, W, 3), np.uint8)
    return np.concatenate([pad(a), spacer, pad(b)], axis=0)

"""Dataset IO: image listing/decoding and camera calibration loading.

Replaces the reference's host-side IO: ``utils::listImageFilesInFolder``
(src/utils.cpp:33-44, sorted directory scan), ``cv::imread`` grayscale
(src/main.cpp:102-130), and the OpenCV-YAML intrinsics loader
``System::loadCameraIntrinsics`` (src/system.cpp:612-633, reads
resource/kitti.yaml / denso.yaml). No OpenCV: PIL decodes, a tiny parser reads
the opencv-matrix YAML schema.
"""

from __future__ import annotations

import os
import re
from typing import List, Tuple

import numpy as np

IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".pgm", ".bmp", ".tif", ".tiff")


def list_image_files(folder: str) -> List[str]:
    """Sorted image paths in a directory (utils::listImageFilesInFolder)."""
    files = [
        os.path.join(folder, f)
        for f in sorted(os.listdir(folder))
        if f.lower().endswith(IMAGE_EXTENSIONS)
    ]
    return files


def load_image_grayscale(path: str) -> np.ndarray:
    """uint8 (H, W) grayscale, like cv::imread(..., IMREAD_GRAYSCALE)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), dtype=np.uint8)


def load_camera_yaml(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse the reference's OpenCV-YAML intrinsics files (resource/kitti.yaml):
    returns (K 3x3, dist 5). Handles the `!!opencv-matrix` data blocks."""
    with open(path) as f:
        text = f.read()
    mats = {}
    for name, block in re.findall(r"(\w+): !!opencv-matrix\n(.*?)(?=\n\w+:|\Z)", text, re.S):
        data = re.search(r"data:\s*\[(.*?)\]", block, re.S)
        vals = [float(x) for x in data.group(1).replace("\n", " ").split(",")]
        rows = int(re.search(r"rows:\s*(\d+)", block).group(1))
        cols = int(re.search(r"cols:\s*(\d+)", block).group(1))
        mats[name] = np.asarray(vals).reshape(rows, cols)
    K = mats.get("K", np.eye(3))
    d = mats.get("d", np.zeros((5, 1))).reshape(-1)
    if d.shape[0] < 5:
        d = np.concatenate([d, np.zeros(5 - d.shape[0])])
    return K, d[:5]


def load_kitti_calib(calib_path: str, cam: int = 0) -> np.ndarray:
    """KITTI odometry calib.txt → 3x4 projection matrix P{cam}."""
    with open(calib_path) as f:
        for line in f:
            if line.startswith(f"P{cam}:"):
                vals = [float(x) for x in line.split()[1:]]
                return np.asarray(vals).reshape(3, 4)
    raise ValueError(f"P{cam} not found in {calib_path}")

"""Path helpers + debug feature/point text serialization.

Replaces ``utils.cpp``: repo-root-relative path resolution (:15-31 strips
build/bin from cwd — here: walk up to the directory containing this package),
and the feature/point text dump/restore used for optimizer debugging
(``writeAllInfoFile`` / ``readAllFromFile``, src/utils.cpp:54-117).
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np


def repo_root() -> str:
    """Directory containing the sdvo_tpu package (findAbsoluteFilePath base)."""
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_absolute_path(relative: str) -> str:
    """Resolve a path relative to the repo root (utils::findAbsoluteFilePath)."""
    if os.path.isabs(relative):
        return relative
    return os.path.join(repo_root(), relative)


def write_debug_dump(path: str, pose_wc: np.ndarray, feat_uv: np.ndarray, points_w: np.ndarray):
    """Text dump of one frame's pose + per-feature (uv, 3D point) rows
    (utils::writeAllInfoFile)."""
    with open(path, "w") as f:
        f.write("pose " + " ".join(f"{v:.12g}" for v in pose_wc.reshape(-1)) + "\n")
        for uv, p in zip(feat_uv, points_w):
            f.write(
                "feat "
                + " ".join(f"{v:.12g}" for v in uv)
                + " "
                + " ".join(f"{v:.12g}" for v in p)
                + "\n"
            )


def read_debug_dump(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of write_debug_dump (utils::readAllFromFile)."""
    pose = np.eye(4)
    uvs: List[List[float]] = []
    pts: List[List[float]] = []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "pose":
                pose = np.asarray([float(x) for x in tok[1:]]).reshape(4, 4)
            elif tok[0] == "feat":
                vals = [float(x) for x in tok[1:]]
                uvs.append(vals[:2])
                pts.append(vals[2:5])
    return pose, np.asarray(uvs), np.asarray(pts)

"""Colored point-cloud dumps — the offline counterpart of the reference's
colored frame / local-map publishers (reference ros/ros2/OdometryServer.cpp:
211-220 + the color LUT packing at ros/launch/odometry.launch.py:69-81).

Writes binary little-endian PLY, viewable in CloudCompare/Meshlab/Open3D.
"""

from __future__ import annotations

import struct

import numpy as np

from sage_icp_tpu.utils.labels import COLOR_MAP_BGR


def label_colors_rgb_u8(labels: np.ndarray) -> np.ndarray:
    lut = np.zeros((260, 3), dtype=np.uint8)
    for k, (b, g, r) in COLOR_MAP_BGR.items():
        lut[k] = (r, g, b)
    return lut[np.clip(labels.astype(int), 0, 259)]


def write_ply(path: str, points: np.ndarray, colors: np.ndarray | None = None):
    """points: (n, >=3); colors: (n, 3) uint8 or None (then colored by the
    semantic label in lane 3 when present, grey otherwise)."""
    n = len(points)
    if colors is None:
        if points.shape[1] >= 4:
            colors = label_colors_rgb_u8(points[:, 3])
        else:
            colors = np.full((n, 3), 180, dtype=np.uint8)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    rec = np.zeros(
        n,
        dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
               ("r", "u1"), ("g", "u1"), ("b", "u1")],
    )
    rec["x"], rec["y"], rec["z"] = (points[:, i].astype(np.float32) for i in range(3))
    rec["r"], rec["g"], rec["b"] = colors[:, 0], colors[:, 1], colors[:, 2]
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(rec.tobytes())


def dump_local_map(path: str, odom) -> int:
    """Write the current semantic local map (colored by label)."""
    pts = odom.local_map()
    write_ply(path, pts)
    return len(pts)

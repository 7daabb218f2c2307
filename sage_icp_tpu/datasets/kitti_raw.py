"""KITTI raw-drive dataset reader — offline equivalent of the reference's
raw replay publisher (reference eval/kittiraw_pub.py).

Reproduced loader behaviors:
  * velodyne_points/data/*.bin float32 (n, 4), HDL-64 scan correction
    applied to xyz (kittiraw_pub.py:48-52,81-84 via kiss_icp pybind;
    vectorized reimplementation in datasets.kitti.correct_kitti_scan)
  * ground truth = OXTS T_w_imu normalized by the first frame's inverse
    (kittiraw_pub.py:101-104 — the reference keeps the IMU frame and only
    re-bases at frame 0); T_w_imu from the Mercator projection of
    lat/lon/alt + roll/pitch/yaw with scale = cos(lat0) (pykitti
    semantics, same math as eval/kitti360_oxts_pub_wogt.py:278-330)
  * labels come from an external segmentation network in the reference
    (RangeNet++, launch variant `range_odom_raw`); offline we emit label 0
    unless a labels directory is supplied

Drive layout: <root>/<date>/<date>_drive_<drive>_sync/
    velodyne_points/data/*.bin, oxts/data/*.txt, timestamps in
    velodyne_points/timestamps.txt.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from sage_icp_tpu.datasets.kitti import correct_kitti_scan
from sage_icp_tpu.datasets.kitti360 import oxts_to_pose


def read_oxts_record(path: str) -> np.ndarray:
    with open(path) as f:
        return np.fromstring(f.read(), sep=" ")


def oxts_poses(oxts_files: list[str]) -> np.ndarray:
    """T_w_imu per frame: Mercator scale fixed by the first record's
    latitude (pykitti convention used by the reference's `kitti.oxts`)."""
    poses = []
    scale = None
    origin = None
    for f in oxts_files:
        r = read_oxts_record(f)
        lat, lon, alt, roll, pitch, yaw = r[:6]
        if scale is None:
            scale = np.cos(lat * np.pi / 180.0)
        T = oxts_to_pose(lat, lon, alt, roll, pitch, yaw, scale=scale)
        if origin is None:
            origin = T[:3, 3].copy()
        T[:3, 3] -= origin
        poses.append(T)
    return np.stack(poses) if poses else np.zeros((0, 4, 4))


class KittiRawSequence:
    """One raw drive. Iteration yields (n, 4) [x y z label] scans; gt_poses
    are IMU-frame poses re-based to the first frame (the reference's GT
    convention, kittiraw_pub.py:101-104)."""

    def __init__(
        self,
        root: str,
        date: str,
        drive: str,
        apply_scan_correction: bool = True,
        labels_dir: str | None = None,
    ):
        self.data_path = os.path.join(root, date, f"{date}_drive_{drive}_sync")
        self.velo_files = sorted(
            glob.glob(os.path.join(self.data_path, "velodyne_points", "data", "*.bin"))
        )
        self.oxts_files = sorted(
            glob.glob(os.path.join(self.data_path, "oxts", "data", "*.txt"))
        )
        self.apply_scan_correction = apply_scan_correction
        self.label_files = (
            sorted(glob.glob(os.path.join(labels_dir, "*.label")))
            if labels_dir
            else []
        )
        gt = oxts_poses(self.oxts_files)
        # normalize to the first frame (kittiraw_pub.py:101-104)
        self.gt_poses = (
            np.linalg.inv(gt[0])[None] @ gt if len(gt) else None
        )

    def __len__(self) -> int:
        return len(self.velo_files)

    def read_scan(self, i: int) -> np.ndarray:
        raw = np.fromfile(self.velo_files[i], dtype=np.float32).reshape(-1, 4)
        xyz = raw[:, :3]
        if self.apply_scan_correction:
            xyz = correct_kitti_scan(xyz.astype(np.float64))
        if i < len(self.label_files):
            lab = np.fromfile(self.label_files[i], dtype=np.int32)
            lab = (lab & 0xFFFF).astype(np.float32)
            n = min(len(lab), len(xyz))
            return np.concatenate([xyz[:n], lab[:n, None]], axis=1, dtype=np.float32)
        return np.concatenate(
            [xyz, np.zeros((len(xyz), 1), dtype=np.float32)], axis=1
        )

    def __iter__(self):
        for i in range(len(self)):
            yield self.read_scan(i)


def discover_drives(root: str) -> list[tuple[str, str]]:
    """All (date, drive) pairs under a raw-KITTI root, sorted by drive
    number (the reference walks the same layout, kittiraw_pub.py:243-260)."""
    out = []
    for date in sorted(os.listdir(root)):
        if not date.startswith("2011"):
            continue
        ddir = os.path.join(root, date)
        if not os.path.isdir(ddir):
            continue
        for d in sorted(os.listdir(ddir)):
            if os.path.isdir(os.path.join(ddir, d)) and "_drive_" in d:
                out.append((date, d.split("_drive_")[1].replace("_sync", "")))
    out.sort(key=lambda p: int(p[1]))
    return out

"""Numpy oracle replicating reference VoxelHashMap semantics
(cpp/sage_icp/core/VoxelHashMap.{hpp,cpp}) for parity testing. Pure python,
dict-based — slow but obviously correct."""

import numpy as np


class OracleVoxelMap:
    def __init__(self, voxel_size, max_distance, basic, critical, basic_labels):
        self.voxel_size = voxel_size
        self.max_distance = max_distance
        self.basic = basic
        self.critical = critical
        self.basic_labels = set(basic_labels)
        self.map = {}  # voxel tuple -> list of points (np arrays, len 4)

    def _voxel(self, p):
        return tuple(np.trunc(p[:3] / self.voxel_size).astype(int))

    def add_point_to_block(self, block, point):
        """reference VoxelHashMap.hpp:45-70"""
        if len(block) < self.basic:
            block.append(point.copy())
            return
        label = int(point[3])
        if label == 0:
            return
        if label in self.basic_labels:
            for i, p in enumerate(block):
                if int(p[3]) == 0:
                    block[i] = point.copy()
                    return
        else:
            if len(block) < self.basic + self.critical:
                block.append(point.copy())
            else:
                for i, p in enumerate(block):
                    if int(p[3]) == 0:
                        block[i] = point.copy()
                        return

    def add_points(self, points):
        for p in points:
            v = self._voxel(p)
            if v in self.map:
                self.add_point_to_block(self.map[v], p)
            else:
                self.map[v] = [p.copy()]

    def remove_far(self, origin):
        dead = []
        for v, block in self.map.items():
            if np.sum((block[0][:3] - origin) ** 2) > self.max_distance**2:
                dead.append(v)
        for v in dead:
            del self.map[v]

    def update(self, points, pose):
        R, t = pose[:3, :3], pose[:3, 3]
        pts = [np.concatenate([R @ p[:3] + t, p[3:4]]) for p in points]
        self.add_points(pts)
        self.remove_far(t)

    def pointcloud(self):
        out = []
        for block in self.map.values():
            out.extend(block)
        return np.array(out).reshape(-1, 4)

    def get_correspondences(self, points, max_dist, sem_th):
        """reference VoxelHashMap.cpp:48-130"""
        src, tgt = [], []
        for p in points:
            kx, ky, kz = (int(np.trunc(p[i] / self.voxel_size)) for i in range(3))
            cands = []
            for i in range(kx - 1, kx + 2):
                for j in range(ky - 1, ky + 2):
                    for k in range(kz - 1, kz + 2):
                        cands.extend(self.map.get((i, j, k), []))
            best, best_d = None, np.inf
            for c in cands:
                d = np.sum((c[:3] - p[:3]) ** 2)
                if int(c[3]) == int(p[3]) or int(c[3] * p[3]) == 0:
                    d = d * sem_th
                if d < best_d:
                    best, best_d = c, d
            if best is not None and np.linalg.norm(best[:3] - p[:3]) < max_dist:
                src.append(p)
                tgt.append(best)
        return np.array(src).reshape(-1, 4), np.array(tgt).reshape(-1, 4)

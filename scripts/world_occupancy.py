"""Size the fixed capacities for a bench world: per-frame point counts,
unique source voxels (the correspondence-grid row demand), and live map
voxels under the 100 m cull, measured host-side with numpy emulations of
the two downsample stages.

Round-3 motivation: the round-2 bench crashed with corr_dropped > 0 —
the kitti preset's correspondence grid (4096 rows x 8 queries/voxel)
assumes several queries share a map voxel, but the 1.5x source
downsample (1.2 m cells) leaves most queries ALONE in their 0.8 m map
voxel, so row demand ~= num_source, far beyond 4096. This script prints
the true demand so presets are sized with measured margins.

Usage: python scripts/world_occupancy.py [corridor|city] [density ...]
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from sage_icp_tpu.utils import synthetic  # noqa: E402


def voxel_decimate(pts, size):
    """Keep the first point per voxel (trunc semantics like the
    pipeline's voxel_downsample)."""
    v = np.trunc(pts[:, :3] / size).astype(np.int64)
    code = (v[:, 0] + 2**20) * (1 << 42) + (v[:, 1] + 2**20) * (1 << 21) + (
        v[:, 2] + 2**20
    )
    _, idx = np.unique(code, return_index=True)
    return pts[np.sort(idx)]


def unique_voxels(pts, size):
    v = np.trunc(pts[:, :3] / size).astype(np.int64)
    code = (v[:, 0] + 2**20) * (1 << 42) + (v[:, 1] + 2**20) * (1 << 21) + (
        v[:, 2] + 2**20
    )
    return np.unique(code)


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "city"
    densities = [float(d) for d in sys.argv[2:]] or [0.7, 1.0, 1.5, 2.0]
    n_frames = 60
    vmap = 0.8
    for d in densities:
        if kind == "city":
            wp, wl = synthetic.build_city_world(seed=0, size=420.0, density=d)
        else:
            wp, wl = synthetic.build_world(seed=0, length=260.0, density=d)
        gt = synthetic.make_trajectory(n_frames, step=1.0)
        rng = np.random.default_rng(0)
        raws, ds1s, srcs, uq, ins = [], [], [], [], []
        live = {}
        map_sizes = []
        for i in range(n_frames):
            scan = synthetic.render_scan(wp, wl, gt[i], rng,
                                         n_target=120_000, max_range=100.0)
            raws.append(len(scan))
            ds1 = voxel_decimate(scan, 0.5 * vmap)
            ds1s.append(len(ds1))
            src = voxel_decimate(ds1, 1.5 * vmap)
            srcs.append(len(src))
            # world-frame unique map voxels among the sources = the
            # correspondence grid's row demand this frame
            w = src[:, :3] @ gt[i][:3, :3].T + gt[i][:3, 3]
            uq.append(len(unique_voxels(w, vmap)))
            # per-frame insert demand: unique map voxels among ds1 points
            w1u = ds1[:, :3] @ gt[i][:3, :3].T + gt[i][:3, 3]
            ins.append(len(unique_voxels(w1u, vmap)))
            # map accumulation: ds1 in world frame, culled at 100 m
            w1 = ds1[:, :3] @ gt[i][:3, :3].T + gt[i][:3, 3]
            for code in unique_voxels(w1, vmap):
                live[code] = True
            # cull pass every 10 frames (cheap emulation)
            if i % 10 == 9:
                center = gt[i][:3, 3]
                keep = {}
                for code in live:
                    z = (code & ((1 << 21) - 1)) - 2**20
                    y = ((code >> 21) & ((1 << 21) - 1)) - 2**20
                    x = (code >> 42) - 2**20
                    p = (np.array([x, y, z]) + 0.5) * vmap
                    if np.linalg.norm(p - center) < 100.0:
                        keep[code] = True
                live = keep
            map_sizes.append(len(live))
        print(
            f"[{kind} d={d}] raw max={max(raws)} ds1 max={max(ds1s)} "
            f"src max={max(srcs)} unique-src-voxels max={max(uq)} "
            f"insert-voxels max={max(ins)} "
            f"map voxels end={map_sizes[-1]} max={max(map_sizes)}",
            flush=True,
        )


if __name__ == "__main__":
    main()

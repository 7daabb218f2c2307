"""Find WHERE the 1.76 m map-to-scan gap comes from.

Checks, all at GROUND-TRUTH poses:
  1. self-roundtrip: insert frame 3's frame_ds into a FRESH map; NN from
     those same points to pointcloud() output (expect ~0 — catches any
     quantize/dequantize/frame error in insert or pointcloud);
  2. scan overlap: NN from frame 3's source points to frame 2's frame_ds
     points (expect ~0.1-0.3 m if consecutive scans sample the same
     surfaces);
  3. voxel coverage: fraction of frame 3 source voxels that are LIVE in
     the 3-frame map (lookup found).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import dataclasses

import jax.numpy as jnp
import numpy as np

from sage_icp_tpu.models import pipeline as pl
from sage_icp_tpu.ops import geometry as geo
from sage_icp_tpu.ops import hashmap as hm
from sage_icp_tpu.ops import scan as scan_ops
from sage_icp_tpu.utils import synthetic

cfg = dataclasses.replace(pl.PRESETS["synthetic"], quantized_scan_upload=True)
world_pts, world_labs = synthetic.build_world(seed=0, length=260.0, density=2.0)
gt = synthetic.make_trajectory(4, step=1.0)
rng = np.random.default_rng(0)
scans = [synthetic.render_scan(world_pts, world_labs, gt[i], rng,
                               n_target=120000, max_range=100.0)
         for i in range(4)]


def downsample(i):
    pts = np.full((cfg.scan_capacity, 4), scan_ops.INVALID_COORD, np.float32)
    n = min(len(scans[i]), cfg.scan_capacity)
    pts[:n] = scans[i][:n, :4]
    pj = jnp.asarray(pts)
    valid = pj[:, 0] < 1e6
    cropped, cval = scan_ops.preprocess(
        pj, valid, cfg.max_range, cfg.min_range, cfg.label_max_range
    )
    (src, sval), (fds, fval) = pl.voxelize(cropped, cval, cfg)
    T = jnp.asarray(gt[i], jnp.float32)
    return (
        np.asarray(geo.transform_points(T, src)), np.asarray(sval),
        np.asarray(geo.transform_points(T, fds)), np.asarray(fval),
    )


def nn_stats(q, ref, label, k=800):
    qs = q[np.random.default_rng(1).choice(len(q), min(k, len(q)),
                                           replace=False)]
    d = np.sqrt(((qs[:, None, :] - ref[None, :, :]) ** 2).sum(-1).min(1))
    print(f"{label}: median NN {np.median(d):.3f} m, "
          f"<0.3: {(d < 0.3).mean():.2%}, <0.6: {(d < 0.6).mean():.2%}",
          flush=True)


src3, sval3, fds3, fval3 = downsample(3)
src3 = src3[sval3][:, :3]
fds3w = fds3[fval3]

# 1. self-roundtrip through a fresh map
fresh = hm.create(cfg.map_capacity, cfg.points_per_voxel, jnp.float32)
fresh = hm.insert(
    fresh, jnp.asarray(fds3), jnp.asarray(fval3), cfg.voxel_size_map,
    cfg.basic_points_per_voxel, pl._basic_label_mask(cfg),
    max_incoming_per_voxel=cfg.max_incoming_per_voxel,
    probe_depth=cfg.probe_depth,
    unique_voxel_capacity=cfg.insert_unique_capacity,
    basic_labels=cfg.basic_parts_labels,
)
mp, mm = hm.pointcloud(fresh, cfg.voxel_size_map)
mp = np.asarray(mp)[np.asarray(mm)][:, :3]
print(f"fresh map: {len(mp)} points from {fval3.sum()} inserted", flush=True)
nn_stats(fds3w[:, :3], mp, "1a. frame3 fds -> fresh map(frame3)")

# 2. scan-to-scan overlap
_, _, fds2, fval2 = downsample(2)
nn_stats(src3, fds2[fval2][:, :3], "2. frame3 src -> frame2 fds")

# 3. voxel coverage in the real 3-frame map
odom = pl.SageICP(cfg)
for i in range(3):
    odom.register_frame(scans[i])
mp3, mm3 = hm.pointcloud(odom.state.map, cfg.voxel_size_map)
mp3 = np.asarray(mp3)[np.asarray(mm3)][:, :3]
nn_stats(src3, mp3, "3a. frame3 src -> 3-frame map")
vox = scan_ops.trunc_div(jnp.asarray(src3), cfg.voxel_size_map)
slots = hm.lookup(odom.state.map, vox, cfg.probe_depth)
print(f"3b. source voxels live in map: "
      f"{(np.asarray(slots) >= 0).mean():.2%}", flush=True)
nn_stats(mp3, src3, "3c. map -> frame3 src (reverse)")

"""Cross-check the fast correspondence engine against brute-force numpy NN.

Register 3 frames; for the next scan's downsampled source at the GT pose:
  * engine accept fraction at gate 0.6 (get_correspondences_fast);
  * brute-force: true nearest map point distance for 800 sampled queries.
If brute-force says 'close map point exists' but the engine rejects, the
engine (probe/window/seating) is at fault; if both agree the map is thin,
insert/retention is at fault.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sage_icp_tpu.models import pipeline as pl
from sage_icp_tpu.ops import correspondence_fast as cf
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

odom = pl.SageICP(cfg)
for i in range(3):
    odom.register_frame(scans[i])

# next scan, downsampled, at GT pose
nxt = scans[3]
pts = np.full((cfg.scan_capacity, 4), scan_ops.INVALID_COORD, np.float32)
n = min(len(nxt), cfg.scan_capacity)
pts[:n] = nxt[:n, :4]
pj = jnp.asarray(pts)
valid = pj[:, 0] < 1e6
cropped, cval = scan_ops.preprocess(
    pj, valid, cfg.max_range, cfg.min_range, cfg.label_max_range
)
(src, sval), _ = pl.voxelize(cropped, cval, cfg)
gt_pose = jnp.asarray(gt[3], jnp.float32)
src_w = geo.transform_points(gt_pose, src)
center = scan_ops.trunc_div(gt_pose[:3, 3], cfg.voxel_size_map)

tables = cf.build_probe_tables(odom.state.map, center, cfg.probe_depth)
tgt, acc = cf.get_correspondences_fast(
    odom.state.map, tables, src_w, sval, cfg.voxel_size_map,
    0.6, cfg.sem_th, cfg.probe_depth,
    unique_voxel_rows=cfg.corr_unique_voxel_rows,
    queries_per_voxel=cfg.corr_queries_per_voxel,
    overflow_rows=cfg.corr_overflow_rows,
)
acc_np = np.asarray(acc)
sval_np = np.asarray(sval)
src_np = np.asarray(src_w)
print(f"engine: {acc_np[sval_np].sum()}/{sval_np.sum()} accepted @0.6",
      flush=True)

# brute force on a sample
mp, mmask = hm.pointcloud(odom.state.map, cfg.voxel_size_map)
mp = np.asarray(mp)[np.asarray(mmask)][:, :3]
print(f"map points: {len(mp)}", flush=True)
qidx = np.random.default_rng(1).choice(np.nonzero(sval_np)[0], 800)
q = src_np[qidx, :3]
d = np.sqrt(((q[:, None, :] - mp[None, :, :]) ** 2).sum(-1).min(1))
close = d < 0.6
print(f"brute force: {close.sum()}/800 have map NN within 0.6 "
      f"(median d={np.median(d):.3f})", flush=True)
eng = acc_np[qidx]
print(f"agreement: engine-acc&bf-close={np.sum(eng & close)}, "
      f"engine-rej&bf-close={np.sum(~eng & close)}, "
      f"engine-acc&bf-far={np.sum(eng & ~close)}", flush=True)
# where do the engine-rejected-but-close queries sit?
bad = qidx[~eng & close]
r = np.linalg.norm(src_np[bad, :3] - np.asarray(gt[3][:3, 3])[None], axis=1)
rall = np.linalg.norm(
    src_np[np.nonzero(sval_np)[0], :3] - np.asarray(gt[3][:3, 3])[None],
    axis=1,
)
print(f"rejected-but-close range: median {np.median(r):.1f} m "
      f"(all queries median {np.median(rall):.1f} m)", flush=True)
lab_bad = src_np[bad, 3]
u, c = np.unique(lab_bad, return_counts=True)
print("rejected-but-close labels:", dict(zip(u.tolist(), c.tolist())),
      flush=True)

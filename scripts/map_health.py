"""Instrument map health across the divergence onset (frames 10-22).

Each frame: register normally, then measure
  * live voxel count and DUPLICATE live keys (same voxel in two slots);
  * using the GROUND-TRUTH pose for the NEXT scan: what fraction of its
    downsampled points find an accepted correspondence within 0.6 m —
    isolates map quality from pose error.
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

n_frames = 24
cfg = dataclasses.replace(pl.PRESETS["synthetic"], quantized_scan_upload=True)
world_pts, world_labs = synthetic.build_world(seed=0, length=260.0, density=2.0)
gt = synthetic.make_trajectory(n_frames + 1, step=1.0)
rng = np.random.default_rng(0)
scans = [synthetic.render_scan(world_pts, world_labs, gt[i], rng,
                               n_target=120000, max_range=100.0)
         for i in range(n_frames + 1)]

odom = pl.SageICP(cfg)


@jax.jit
def probe_health(mapstate, query, qvalid, center):
    tables = cf.build_probe_tables(mapstate, center, cfg.probe_depth)
    tgt, acc = cf.get_correspondences_fast(
        mapstate, tables, query, qvalid, cfg.voxel_size_map,
        0.6, cfg.sem_th, cfg.probe_depth,
        unique_voxel_rows=cfg.corr_unique_voxel_rows,
        queries_per_voxel=cfg.corr_queries_per_voxel,
        overflow_rows=cfg.corr_overflow_rows,
    )
    return jnp.sum(acc.astype(jnp.int32)), jnp.sum(qvalid.astype(jnp.int32))


def dup_keys(mapstate):
    live = np.asarray(mapstate.counts) > 0
    k = np.asarray(mapstate.keys)[live].astype(np.int64)
    if len(k) == 0:
        return 0, 0
    code = (k[:, 0] + 2**20) * (1 << 42) + (k[:, 1] + 2**20) * (1 << 21) + (
        k[:, 2] + 2**20
    )
    s = np.sort(code)
    return int(np.sum(s[1:] == s[:-1])), int(live.sum())


for i in range(n_frames):
    odom.register_frame(scans[i])
    # ground-truth-posed NEXT scan -> map match health
    nxt = scans[i + 1]
    pts = np.full((cfg.scan_capacity, 4), scan_ops.INVALID_COORD, np.float32)
    n = min(len(nxt), cfg.scan_capacity)
    pts[:n] = nxt[:n, :4]
    pj = jnp.asarray(pts)
    valid = pj[:, 0] < 1e6
    cropped, cval = scan_ops.preprocess(
        pj, valid, cfg.max_range, cfg.min_range, cfg.label_max_range
    )
    (src, sval), _ = pl.voxelize(cropped, cval, cfg)
    gt_pose = jnp.asarray(gt[i + 1], jnp.float32)
    src_w = geo.transform_points(gt_pose, src)
    center = scan_ops.trunc_div(gt_pose[:3, 3], cfg.voxel_size_map)
    nacc, nq = probe_health(odom.state.map, src_w, sval, center)
    ndup, nlive = dup_keys(odom.state.map)
    tr = odom.trajectory()
    print(f"frame{i}: pose_t={np.round(tr[-1][:3, 3], 3)} "
          f"live={int(nlive)} dup={int(ndup)} "
          f"gt_match={int(nacc)}/{int(nq)}", flush=True)

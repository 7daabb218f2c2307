"""Multi-device scaling harness on the virtual CPU mesh.

Real multi-chip hardware is not available in this environment (one
tunneled chip), so the scaling story is measured two ways:
  * THIS script: throughput of the sharded step at 1/2/4/8 virtual CPU
    devices (XLA_FLAGS=--xla_force_host_platform_device_count). CPU
    wall-clock is a weak absolute proxy for TPU, but the RELATIVE curve
    exposes what fraction of the step partitions: per-point phases
    (preprocess, downsample sort, correspondence queries, J^T W J rows)
    scale; the replicated-map phases (insert, probe-table build, cull)
    do not.
  * docs/PERF.md "Multi-chip efficiency model": the analytic ceiling of
    the replicated-map design from single-chip phase measurements.

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
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_test_cache")

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
        sps = n / dt
        results[nd] = sps
        base_sps = results[min(results)]
        eff = sps / (base_sps * nd / min(results))
        print(f"{nd} devices: {sps:6.2f} scans/s   "
              f"speedup x{sps / base_sps:4.2f}   efficiency {eff:5.1%}")
    print("\nNOTE: CPU-mesh relative curve; the replicated-map phases "
          "(insert/probe-build/cull) bound the ceiling — see docs/PERF.md "
          "'Multi-chip efficiency model'.")


if __name__ == "__main__":
    main()

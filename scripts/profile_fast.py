"""Trustworthy phase profiling on the axon TPU tunnel: every number comes
from N iterations chained inside ONE jitted fori_loop with a
data-dependent carry (repeated identical dispatches are cached by the
tunnel and block_until_ready does not synchronize — see docs/PERF.md).

Phases measured at production (KITTI) capacities:
  * full odometry step, state threaded through the loop
  * fast-path ICP solve (register_frame with fast_params)
  * one fast correspondence pass
  * map insert (fast tables path) / remove_far
"""

import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sage_icp_tpu.models import pipeline as pl
from sage_icp_tpu.ops import correspondence_fast as cf
from sage_icp_tpu.ops import hashmap as hm
from sage_icp_tpu.ops import registration as reg
from sage_icp_tpu.ops import scan as scan_ops
from sage_icp_tpu.utils import synthetic


def chain(name, fn, *args, n=50):
    """fn(*args) -> pytree; time n data-chained evaluations in one jit."""

    @jax.jit
    def loop(*a):
        def body(i, carry):
            acc, rest = carry
            out = fn(a[0] + acc * 1e-30, *a[1:])
            leaf = jax.tree.leaves(out)[0]
            return (acc + leaf.reshape(-1)[0].astype(jnp.float32) * 1e-30,
                    rest)

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), 0))[0]

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    cfg = pl.SageConfig(dynamic_vehicle_filter=False, min_range=2.0)
    print("devices:", jax.devices(), flush=True)

    world_pts, world_labs = synthetic.build_world(seed=0, length=260.0)
    gt = synthetic.make_trajectory(12, step=1.0)
    rng = np.random.default_rng(0)
    odom = pl.SageICP(cfg)
    for i in range(10):
        odom.register_frame(
            synthetic.render_scan(world_pts, world_labs, gt[i], rng,
                                  n_target=120000))
    a = odom.last_aux
    print("steady: n_ds=", int(a.num_frame_ds), "n_src=", int(a.num_source),
          "iters=", int(a.icp_iterations), "ncorr=",
          int(a.num_correspondences), flush=True)

    state = odom.state
    scan = synthetic.render_scan(world_pts, world_labs, gt[10], rng,
                                 n_target=120000)
    cap = cfg.scan_capacity
    buf = np.full((cap, 4), scan_ops.INVALID_COORD, dtype=np.float32)
    buf[: len(scan)] = scan
    val = np.zeros((cap,), dtype=bool)
    val[: len(scan)] = True
    pts, valid = jnp.asarray(buf), jnp.asarray(val)
    ts = jnp.zeros((cap,), jnp.float32)

    # steady-state inputs for isolated phases
    lut = scan_ops.make_label_group_lut(list(map(list, cfg.voxel_labels)))
    sizes = jnp.asarray(cfg.voxel_size, dtype=jnp.float32)
    (cropped, crop_valid) = jax.jit(lambda p, v: scan_ops.preprocess(
        p, v, cfg.max_range, cfg.min_range, cfg.label_max_range))(pts, valid)
    frame_ds, frame_valid = jax.jit(lambda p, v: scan_ops.voxel_downsample(
        p, v, lut, sizes, 0.5, cfg.frame_capacity))(cropped, crop_valid)
    source, source_valid = jax.jit(lambda p, v: scan_ops.voxel_downsample(
        p, v, lut, sizes, 1.5, cfg.source_capacity))(frame_ds, frame_valid)
    world_frame = jnp.asarray(np.asarray(frame_ds))  # already ~world frame

    center = scan_ops.trunc_div(jnp.zeros(3), cfg.voxel_size_map)
    tables = jax.jit(lambda st: cf.build_probe_tables(
        st, center, cfg.probe_depth))(state.map)
    fast = dict(unique_voxel_rows=cfg.corr_unique_voxel_rows,
                queries_per_voxel=cfg.corr_queries_per_voxel,
                overflow_rows=cfg.corr_overflow_rows)

    chain("preprocess (crop 135k)", lambda p: scan_ops.preprocess(
        p, valid, cfg.max_range, cfg.min_range, cfg.label_max_range), pts)
    chain("downsample 0.5x (135k->65k)", lambda p: scan_ops.voxel_downsample(
        p, crop_valid, lut, sizes, 0.5, cfg.frame_capacity), cropped)
    chain("downsample 1.5x (65k->16k)", lambda p: scan_ops.voxel_downsample(
        p, frame_valid, lut, sizes, 1.5, cfg.source_capacity), frame_ds)
    chain("remove_far", lambda c: hm.remove_far(
        state.map._replace(counts=c), jnp.zeros(3), cfg.local_map_range),
        state.map.counts)

    chain("build_probe_tables", lambda k: cf.build_probe_tables(
        state.map._replace(keys=k), center, cfg.probe_depth), state.map.keys)

    chain("corr fast ONE pass (16k queries)",
          lambda q: cf.get_correspondences_fast(
              state.map, tables, q, source_valid, cfg.voxel_size_map,
              0.75, cfg.sem_th, cfg.probe_depth, **fast), source)

    chain("fast ICP solve (while_loop)",
          lambda q: reg.register_frame(
              state.map, q, source_valid, jnp.eye(4, dtype=jnp.float32),
              cfg.voxel_size_map, 0.75, 0.08, cfg.sem_th, 500,
              cfg.probe_depth, fast_params=fast), source, n=20)

    mask = pl._basic_label_mask(cfg)
    chain("map insert fast (65k pts, tables)",
          lambda p: hm.insert(
              state.map, p, frame_valid, cfg.voxel_size_map,
              cfg.basic_points_per_voxel, mask,
              cfg.max_incoming_per_voxel, cfg.probe_depth,
              min(cfg.insert_unique_capacity, cfg.frame_capacity), tables),
          world_frame, n=20)

    chain("map insert slow (no tables)",
          lambda p: hm.insert(
              state.map, p, frame_valid, cfg.voxel_size_map,
              cfg.basic_points_per_voxel, mask,
              cfg.max_incoming_per_voxel, cfg.probe_depth,
              min(cfg.insert_unique_capacity, cfg.frame_capacity), None),
          world_frame, n=20)

    # full step, state threaded (realistic steady state)
    def full_step_time(label, config, n=20):
        @jax.jit
        def full_loop(state, p, v, t):
            def body(i, st):
                st2, pose, _ = pl.odometry_step(st, p, v, t, config=config)
                return st2

            return jax.lax.fori_loop(0, n, body, state).last_pose

        jax.block_until_ready(full_loop(state, pts, valid, ts))
        t0 = time.perf_counter()
        np.asarray(full_loop(state, pts, valid, ts))
        print(f"{label:52s} {(time.perf_counter() - t0) / n * 1e3:9.2f} ms",
              flush=True)

    import dataclasses as dc

    full_step_time("FULL STEP (chained x5, same scan)", cfg)
    full_step_time("FULL STEP max_icp_iterations=1", dc.replace(
        cfg, max_icp_iterations=1))
    full_step_time("FULL STEP iters=1, no insert rounds", dc.replace(
        cfg, max_icp_iterations=1, max_incoming_per_voxel=1))

    # honest moving-trajectory steady state: 10 REAL consecutive scans
    # through the chunked step (new voxels claimed, map culled, real
    # iteration counts)
    gt2 = synthetic.make_trajectory(22, step=1.0)
    movbuf = np.full((10, cap, 4), scan_ops.INVALID_COORD, dtype=np.float32)
    for i in range(10):
        s = synthetic.render_scan(world_pts, world_labs, gt2[10 + i], rng,
                                  n_target=120000)
        movbuf[i, : len(s)] = s[: cap]
    # compile on a throwaway copy, then time on a fresh copy so the chunk
    # progresses from the right state (re-registering stale scans against a
    # future state blows up the ICP iteration count and is NOT steady state)
    def moving(label, config):
        chunk_step = pl.make_chunk_step(config, 10)
        stA = jax.tree.map(jnp.copy, state)
        _, poses, _ = chunk_step(stA, jnp.asarray(movbuf))
        jax.block_until_ready(poses)
        stB = jax.tree.map(jnp.copy, state)
        dev_scans = jnp.asarray(movbuf)
        jax.block_until_ready(dev_scans)
        t0 = time.perf_counter()
        _, poses, aux = chunk_step(stB, dev_scans)
        np.asarray(poses[-1])
        dt = (time.perf_counter() - t0) / 10 * 1e3
        print(f"{label:52s} {dt:9.2f} ms   (iters last={int(aux.icp_iterations)})",
              flush=True)

    moving("MOVING chunk x10 (full)", cfg)
    moving("MOVING chunk x10 iters=1", dc.replace(cfg, max_icp_iterations=1))
    moving("MOVING chunk x10 iters=1 rounds=1", dc.replace(
        cfg, max_icp_iterations=1, max_incoming_per_voxel=1))


if __name__ == "__main__":
    main()

"""Sub-phase profile of the ROUND-1 dynamic-vehicle filter (hash-based)
at KITTI scale on the real TPU — the measurement that motivated the
round-5 dense-grid rewrite (recorded breakdown in docs/PERF.md: full
117 ms = compacts 11 + scratch inserts 26 + neighbor lookups 17 + CC
diffusion 41 + radius test 39). The sub-phase sections below call
internals that NO LONGER EXIST after the rewrite; only the FULL
measurement still runs against the current implementation.

    python scripts/profile_dynfilter.py          # full filter only
    python scripts/profile_dynfilter.py --old    # (historical, broken)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sage_icp_tpu.models import pipeline as pl
from sage_icp_tpu.ops import dynamic_filter as dyn
from sage_icp_tpu.ops import hashmap as hm
from sage_icp_tpu.ops import scan as scan_ops
from sage_icp_tpu.utils import synthetic


def timeit(name, fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:48s} {dt * 1000:9.2f} ms", flush=True)
    return out, dt


def main():
    cfg = pl.PRESETS["kitti"]
    print("devices:", jax.devices(), flush=True)
    world = synthetic.build_city_world(seed=0, size=420.0, density=1.3)
    gt = synthetic.make_trajectory(3, step=1.0)
    rng = np.random.default_rng(0)
    s = synthetic.render_scan(world[0], world[1], gt[2], rng,
                              n_target=120000)
    cap = cfg.scan_capacity
    buf = np.full((cap, 4), scan_ops.INVALID_COORD, np.float32)
    buf[: len(s)] = s[:, :4]
    val = np.zeros((cap,), bool)
    val[: len(s)] = True
    pts = jnp.asarray(buf)
    valid = jnp.asarray(val)
    pre = jax.jit(lambda p, v: scan_ops.preprocess(
        p, v, cfg.max_range, cfg.min_range, cfg.label_max_range))
    (pts, valid) = pre(pts, valid)
    jax.block_until_ready(pts)

    full = jax.jit(lambda p, v: dyn.filter_dynamic_vehicles(p, v, cfg))
    timeit("filter_dynamic_vehicles FULL", full, pts, valid)

    import sys as _sys

    if "--old" not in _sys.argv:
        return  # sub-phases below target the pre-round-5 implementation

    labels = pts[:, 3].astype(jnp.int32)
    vehicle_labels = tuple(cfg.voxel_labels[cfg.dynamic_vehicle_voxid])
    is_vehicle = valid & dyn._label_in(labels, vehicle_labels)
    is_landmark = valid & dyn._label_in(
        labels, tuple(cfg.dynamic_remove_landmark))
    print("n_vehicle:", int(jnp.sum(is_vehicle)),
          " n_landmark:", int(jnp.sum(is_landmark)), flush=True)

    comp = jax.jit(lambda p, m: dyn._compact(p, m, dyn._VEH_PTS_CAP))
    (veh_c, veh_cvalid, vrank), _ = timeit("compact vehicles", comp, pts,
                                           is_vehicle)
    compl = jax.jit(lambda p, m: dyn._compact(p, m, dyn._LMK_PTS_CAP))
    (lmk_c, lmk_cvalid, _), _ = timeit("compact landmarks", compl, pts,
                                       is_landmark)

    zmask = jnp.zeros((260,), dtype=bool)

    def lmk_insert(lc, lv):
        m = hm.create(dyn._LMK_VOXEL_CAP, dyn._LMK_PER_VOXEL, jnp.float32)
        return hm.insert(m, lc, lv, dyn.SEARCH_RADIUS,
                         basic_points=dyn._LMK_PER_VOXEL,
                         basic_label_mask=zmask,
                         max_incoming_per_voxel=dyn._LMK_PER_VOXEL,
                         probe_depth=8)

    lmk_map, _ = timeit("landmark insert (K=32)", jax.jit(lmk_insert),
                        lmk_c, lmk_cvalid)

    def veh_insert(vc, vv):
        m = hm.create(dyn._VEH_VOXEL_CAP, 1, jnp.float32)
        return hm.insert(m, vc, vv, dyn.CLUSTER_TOLERANCE,
                         basic_points=1, basic_label_mask=zmask,
                         max_incoming_per_voxel=1, probe_depth=8)

    veh_map, _ = timeit("vehicle insert (K=1)", jax.jit(veh_insert),
                        veh_c, veh_cvalid)

    def neighbors(vm):
        nb_keys = vm.keys[:, None, :] + hm._NEIGHBOR_OFFSETS[None, :, :]
        return hm.lookup(vm, nb_keys, probe_depth=8)

    nb_slots, _ = timeit("27-neighbor voxel lookup (V=8192)",
                         jax.jit(neighbors), veh_map)

    occupied = veh_map.counts > 0
    nb_live = (nb_slots >= 0) & occupied[jnp.clip(nb_slots, 0, None)]
    nb_slots_safe = jnp.where(nb_live, nb_slots, 0)
    V = dyn._VEH_VOXEL_CAP

    def diffuse_all(comp0):
        def diffuse(_, comp):
            nb_comp = comp[nb_slots_safe]
            nb_comp = jnp.where(nb_live, nb_comp, V)
            best = jnp.minimum(comp, jnp.min(nb_comp, axis=-1))
            return jnp.where(occupied, best, V)
        return jax.lax.fori_loop(0, dyn._CC_ITERS, diffuse, comp0)

    comp0 = jnp.where(occupied, jnp.arange(V, dtype=jnp.int32), jnp.int32(V))
    timeit("CC diffusion x24", jax.jit(diffuse_all), comp0)

    def plookup(vc):
        pv = scan_ops.trunc_div(vc[:, :3], dyn.CLUSTER_TOLERANCE)
        return hm.lookup(veh_map, pv, probe_depth=8)

    timeit("per-point voxel lookup (16k)", jax.jit(plookup), veh_c)

    def lmk_test(vc, vv):
        qv = scan_ops.trunc_div(vc[:, :3], dyn.SEARCH_RADIUS)
        qnb = qv[:, None, :] + hm._NEIGHBOR_OFFSETS[None, :, :]
        lslots = hm.lookup(lmk_map, qnb, probe_depth=8)
        lfound = lslots >= 0
        lsafe = jnp.where(lfound, lslots, 0)
        cand = hm.dequantize_blocks(
            lmk_map.points[lsafe], qnb, dyn.SEARCH_RADIUS, jnp.float32)
        ccnt = lmk_map.counts[lsafe]
        kidx = jnp.arange(dyn._LMK_PER_VOXEL, dtype=jnp.int32)
        cmask = lfound[..., None] & (kidx[None, None, :] < ccnt[..., None])
        d2 = jnp.sum((cand[..., :3] - vc[:, None, None, :3]) ** 2, axis=-1)
        near = cmask & (d2 <= dyn.SEARCH_RADIUS ** 2)
        return jnp.sum(near, axis=(1, 2)).astype(jnp.int32)

    timeit("landmark 27-gather + radius test (16k x 864)",
           jax.jit(lmk_test), veh_c, veh_cvalid)


if __name__ == "__main__":
    main()

"""Sub-stage breakdown of the fast correspondence pass (chained timing).
Stages replicate ops/correspondence_fast.py at production scale to locate
the time: sort/ranks -> grid build -> probe -> candidate gather -> planar
planes -> fused kernel.
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
from sage_icp_tpu.ops import pallas_nn as pnn
from sage_icp_tpu.ops import scan as scan_ops
from sage_icp_tpu.ops.scan import trunc_div
from sage_icp_tpu.utils import synthetic


def chain(name, fn, *args, n=50):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(a[0] + acc * 1e-30, *a[1:])
            leaf = jax.tree.leaves(out)[0]
            return acc + leaf.reshape(-1)[0].astype(jnp.float32) * 1e-30

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

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
        odom.register_frame(synthetic.render_scan(
            world_pts, world_labs, gt[i], rng, n_target=120000))
    state = odom.state
    src = np.asarray(odom.state.map.points[:1])  # touch

    # a realistic query set: transform a real source through the pipeline
    scan = synthetic.render_scan(world_pts, world_labs, gt[10], rng,
                                 n_target=120000)
    cap = cfg.scan_capacity
    buf = np.full((cap, 4), scan_ops.INVALID_COORD, dtype=np.float32)
    buf[: len(scan)] = scan
    val = np.zeros((cap,), dtype=bool)
    val[: len(scan)] = True
    lut = scan_ops.make_label_group_lut(list(map(list, cfg.voxel_labels)))
    sizes = jnp.asarray(cfg.voxel_size, dtype=jnp.float32)
    c, cv = jax.jit(lambda p, v: scan_ops.preprocess(
        p, v, cfg.max_range, cfg.min_range, cfg.label_max_range))(
            jnp.asarray(buf), jnp.asarray(val))
    f, fv = jax.jit(lambda p, v: scan_ops.voxel_downsample(
        p, v, lut, sizes, 0.5, cfg.frame_capacity))(c, cv)
    query, valid = jax.jit(lambda p, v: scan_ops.voxel_downsample(
        p, v, lut, sizes, 1.5, cfg.source_capacity))(f, fv)

    center = trunc_div(jnp.zeros(3), cfg.voxel_size_map)
    tables = jax.jit(lambda st: cf.build_probe_tables(
        st, center, cfg.probe_depth))(state.map)
    voxel_size = cfg.voxel_size_map
    Q, P, OV = (cfg.corr_unique_voxel_rows, cfg.corr_queries_per_voxel,
                cfg.corr_overflow_rows)
    R = Q + OV
    K = state.map.points_per_voxel
    n = query.shape[0]

    def stage_sort(q):
        vq_abs = trunc_div(q[:, :3], voxel_size)
        rel = vq_abs - tables.center[None, :]
        in_range = valid & jnp.all(jnp.abs(rel) <= cf.PACK_LIM - 2, axis=-1)
        code = cf.pack_rel(jnp.clip(rel, -cf.PACK_LIM, cf.PACK_LIM))
        sortcode = jnp.where(in_range, code, jnp.int32(2**30))
        order = jnp.argsort(sortcode, stable=True)
        sc = sortcode[order]
        val_s = in_range[order]
        head = jnp.concatenate([jnp.array([True]), sc[1:] != sc[:-1]]) & val_s
        pos = jnp.arange(n, dtype=jnp.int32)
        seg_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(head, pos, 0))
        q_rank = pos - seg_start
        u_rank = jnp.cumsum(head) - 1
        return order, rel, val_s, head, pos, q_rank, u_rank

    chain("sort + ranks", lambda q: stage_sort(q)[6], query)

    def stage_grid(q):
        order, rel, val_s, head, pos, q_rank, u_rank = stage_sort(q)
        q_s = q[order]
        rel_s = rel[order]
        is_ov = val_s & (q_rank >= P)
        ov_rank = jnp.cumsum(is_ov) - 1
        u_src = jnp.where(head & (u_rank < Q), u_rank, Q)
        hp = jnp.full((Q + 1,), n, jnp.int32).at[u_src].set(
            pos, mode="drop", unique_indices=True)[:Q]
        ov_src = jnp.where(is_ov & (ov_rank < OV), ov_rank, OV)
        op = jnp.full((OV + 1,), n, jnp.int32).at[ov_src].set(
            pos, mode="drop", unique_indices=True)[:OV]
        start = jnp.concatenate([hp, op])
        row_live = start < n
        start_c = jnp.minimum(start, n - 1)
        row_rel = jnp.where(row_live[:, None], rel_s[start_c], 0)
        row_origin_abs = (
            (row_rel + tables.center[None, :]).astype(q.dtype) * voxel_size)
        rec = jnp.concatenate(
            [q_s, jnp.where(val_s, u_rank, -1).astype(q.dtype)[:, None]],
            axis=1)
        col_iota = jnp.arange(P, dtype=jnp.int32)[None, :]
        spQ = hp[:, None] + col_iota
        spO = jnp.where(col_iota == 0, op[:, None], n)
        sp = jnp.concatenate([spQ, spO], axis=0)
        oob = sp >= n
        g = rec[jnp.minimum(sp, n - 1)]
        row_uid = jnp.arange(R, dtype=jnp.int32)[:, None]
        grid_used = jnp.where(
            row_uid < Q, ~oob & (g[..., 4].astype(jnp.int32) == row_uid),
            ~oob & row_live[:, None])
        grid_q = g[..., :3] - row_origin_abs[:, None, :]
        grid_lab = g[..., 3]
        return grid_q, grid_lab, grid_used, row_rel, row_live, row_origin_abs

    chain("+ grid build (gathers)", lambda q: stage_grid(q)[0], query)

    def stage_probe(q):
        out = stage_grid(q)
        row_rel, row_live = out[3], out[4]
        nb_rel = row_rel[:, None, :] + hm._NEIGHBOR_OFFSETS[None, :, :]
        nb_abs = nb_rel + tables.center[None, None, :]
        nb_code = jnp.where(row_live[:, None], cf.pack_rel(nb_rel), -1)
        found, slot = cf.probe(tables, nb_abs, nb_code, cfg.probe_depth)
        return found, slot, cnt, out

    chain("+ probe 27 neighbors", lambda q: stage_probe(q)[2], query)

    def stage_gather(q):
        found, slot, cnt, out = stage_probe(q)
        flat_slot = jnp.where(found, slot, 0).reshape(-1)
        cand = tables.points2[flat_slot].reshape(R, 27, K, 4)
        return cand, found, cnt, out

    chain("+ candidate gather (88MB)", lambda q: stage_gather(q)[0], query)

    def stage_planes(q):
        cand, found, cnt, out = stage_gather(q)
        row_origin_abs = out[5]
        c_xyz = cand[..., :3] - row_origin_abs[:, None, None, :]
        c_lab = cand[..., 3]
        kidx = jnp.arange(K, dtype=jnp.int32)
        cmask = found[..., None] & (kidx[None, None, :] < cnt[..., None])
        M = 27 * K
        c_flat = c_xyz.reshape(R, M, 3)
        cl = c_lab.reshape(R, M)
        cm = cmask.reshape(R, M)
        big = jnp.asarray(1.0e7, q.dtype)
        Mp = pnn._round_up(M, pnn.LANE)
        pad = ((0, 0), (0, Mp - M))

        def plane(a, fill):
            a = jnp.where(cm, a, fill)
            return jnp.pad(a, pad, constant_values=fill)

        return (plane(c_flat[..., 0], big), plane(c_flat[..., 1], big),
                plane(c_flat[..., 2], big), plane(cl, 0.0), out)

    chain("+ planar planes (mask+pad)", lambda q: stage_planes(q)[0], query)

    def full(q):
        return cf.get_correspondences_fast(
            state.map, tables, q, valid, voxel_size, 0.75, cfg.sem_th,
            cfg.probe_depth, Q, P, OV)

    chain("FULL pass (incl fused kernel + unsort)", full, query)


if __name__ == "__main__":
    main()

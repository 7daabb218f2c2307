"""Pallas TPU kernel: fused semantic nearest-neighbor selection.

The TPU-optimized correspondence engine (ops/correspondence_fast.py)
groups ICP queries by voxel into R rows, each with P query slots and
M = 27*K gathered candidate points. The naive XLA lowering of

    d2[r,p,m] -> semantic weighting -> argmin -> winner gather

materializes several (R, P, M) f32 temporaries (~176 MB each at KITTI
scale) in HBM per ICP iteration — measured at ~3.3 s/iteration on a
v5e tile, 95% of the whole odometry step. This kernel fuses the entire
selection in VMEM: each grid step streams a (TR, M) tile of candidate
planes (x/y/z/label as separate rank-2 arrays for clean tiling),
computes all P query distances on the VPU, reduces to the winner, and
writes only (TR, P) outputs. HBM traffic drops to exactly one read of
the candidate planes per iteration — and the planes are INT16
quantized voxel-local offsets (ops/hashmap.py storage format), so that
read is half the f32 bytes. Dequantization to row-local f32
(c = neighbor_offset + int16 * scale) happens lane-wise in VMEM.

Semantics are identical to the reference nearest-neighbor rule
(/root/reference cpp/sage_icp/core/VoxelHashMap.cpp:88,111): argmin on
the sem_th-scaled squared distance where labels match or either is 0,
with the UNWEIGHTED winner distance returned for the acceptance gate
(applied by the caller). Invalid/padded lanes carry label -1: they are
pushed to +inf weighted metric (lose every argmin) and to a huge true
distance (an all-invalid row fails the acceptance gate naturally).

Coordinates: queries and returned targets are ROW-LOCAL (relative to
each row's voxel origin); the caller adds the row origin back. Local
values span ~2-3 voxel sizes, where f32 is exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
BIG_D2 = 1.0e12  # true-distance for invalid lanes: fails any sane gate


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(smem_ref, cx_ref, cy_ref, cz_ref, cl_ref, ox_ref, oy_ref,
            oz_ref, q_ref, tx_ref, ty_ref, tz_ref, tl_ref, d2_ref, *,
            n_queries: int, m_valid: int):
    sem_th = smem_ref[0, 0]
    scale = smem_ref[0, 1]
    iota = jax.lax.broadcasted_iota(jnp.int32, cx_ref.shape, 1)
    # tile-padding lanes hold undefined memory — the label plane carries
    # the caller's invalid sentinel (-1) but only inside m_valid; gate the
    # padding lanes on the lane index
    lane_ok = iota < m_valid
    clf = cl_ref[:].astype(jnp.float32)  # (TR, M)
    invalid = ~lane_ok | (clf < 0.0)
    # dequantize to row-local f32: offset planes are broadcast (1, M)
    cx = cx_ref[:].astype(jnp.float32) * scale + ox_ref[0, :][None, :]
    cy = cy_ref[:].astype(jnp.float32) * scale + oy_ref[0, :][None, :]
    cz = cz_ref[:].astype(jnp.float32) * scale + oz_ref[0, :][None, :]

    txs, tys, tzs, tls, d2s = [], [], [], [], []
    for p in range(n_queries):  # static unroll; P is small (4-16)
        qx = q_ref[:, 4 * p + 0][:, None]  # (TR, 1)
        qy = q_ref[:, 4 * p + 1][:, None]
        qz = q_ref[:, 4 * p + 2][:, None]
        ql = q_ref[:, 4 * p + 3][:, None]
        dx = cx - qx
        dy = cy - qy
        dz = cz - qz
        d2 = dx * dx + dy * dy + dz * dz  # (TR, M)
        d2 = jnp.where(invalid, BIG_D2, d2)
        sem = (clf == ql) | ((clf * ql) == 0.0)
        d2w = jnp.where(sem, d2 * sem_th, d2)
        d2w = jnp.where(invalid, jnp.finfo(jnp.float32).max, d2w)
        best = jnp.argmin(d2w, axis=1)  # (TR,) first minimum, like the ref
        oh = (iota == best[:, None]).astype(jnp.float32)  # one-hot winner
        txs.append(jnp.sum(cx * oh, axis=1, keepdims=True))
        tys.append(jnp.sum(cy * oh, axis=1, keepdims=True))
        tzs.append(jnp.sum(cz * oh, axis=1, keepdims=True))
        tls.append(jnp.sum(clf * oh, axis=1, keepdims=True))
        d2s.append(jnp.sum(d2 * oh, axis=1, keepdims=True))
    tx_ref[:] = jnp.concatenate(txs, axis=1)
    ty_ref[:] = jnp.concatenate(tys, axis=1)
    tz_ref[:] = jnp.concatenate(tzs, axis=1)
    tl_ref[:] = jnp.concatenate(tls, axis=1)
    d2_ref[:] = jnp.concatenate(d2s, axis=1)


@functools.partial(
    jax.jit, static_argnames=("rows_per_block", "interpret")
)
def fused_semantic_nn(
    cx: jax.Array,  # (R, M) int16 candidate x, own-voxel-local quantized
    cy: jax.Array,
    cz: jax.Array,
    cl: jax.Array,  # (R, M) int16 candidate labels; -1 = invalid lane
    offx: jax.Array,  # (1, M) f32 per-lane neighbor offset, meters
    offy: jax.Array,
    offz: jax.Array,
    queries: jax.Array,  # (R, 4*P) f32 packed [x y z label], ROW-LOCAL xyz
    sem_th,
    scale,  # voxel_size / QSCALE dequantization factor
    rows_per_block: int = 128,
    interpret: bool = False,
):
    """Returns (tx, ty, tz, tl, d2_true), each (R, P) f32, ROW-LOCAL xyz.

    d2_true is the UNWEIGHTED squared distance of the per-slot winner;
    the caller applies the acceptance gate sqrt(d2) < max_corr_dist.
    M need not be 128-aligned: Mosaic pads the trailing tile and the
    kernel masks the padding lanes via the lane index.
    """
    R, M = cx.shape
    P4 = queries.shape[1]
    assert P4 % 4 == 0
    P = P4 // 4
    TR = min(rows_per_block, R)
    assert R % TR == 0, f"rows {R} not divisible by block {TR}"
    smem = jnp.stack(
        [jnp.asarray(sem_th, jnp.float32), jnp.asarray(scale, jnp.float32)]
    ).reshape(1, 2)

    grid = (R // TR,)
    cand_spec = pl.BlockSpec(
        (TR, M), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    off_spec = pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((TR, P4), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TR, P), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((R, P), jnp.float32)

    return pl.pallas_call(
        functools.partial(_kernel, n_queries=P, m_valid=M),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            cand_spec,
            cand_spec,
            cand_spec,
            cand_spec,
            off_spec,
            off_spec,
            off_spec,
            q_spec,
        ],
        out_specs=[out_spec] * 5,
        out_shape=[out_shape] * 5,
        interpret=interpret,
    )(smem, cx, cy, cz, cl, offx, offy, offz, queries)


# ---------------------------------------------------------------------------
# Fully fused GN iteration: one kernel = transform + movers + semantic NN +
# robust weights + partial normal equations.
# ---------------------------------------------------------------------------
#
# JTJ/JTr for J = [I | -hat(s)] decompose into 17 weighted sums
# (reference cpp/sage_icp/core/Registration.cpp:62-90):
#   JTJ upper-left  = (sum w) I
#   JTJ upper-right = -hat(sum w s)
#   JTJ lower-right = delta_ij (Sxx+Syy+Szz) - S_ij,  S_ij = sum w s_i s_j
#   JTr             = [sum w r ; sum w (s x r)]
# plus the accepted-correspondence count. Each grid tile emits its
# partials into one (1, 32) row; the caller sums rows and assembles the
# 6x6 system. Per ICP iteration the only XLA work left is that scalar
# assembly, the unrolled Cholesky, and the SE3 exp/compose.

N_SUMS = 18  # w, w*s(3), w*s_i*s_j(6), w*r(3), w*(s x r)(3), ncorr, used


def _gn_kernel(tile_ref, smem_ref, T_ref, cx_ref, cy_ref, cz_ref, cl_ref,
               ox_ref, oy_ref, oz_ref, q0_ref, org_ref, rabs_ref, used_ref,
               out_ref, *, n_queries: int, m_valid: int):
    sem_th = smem_ref[0, 0]
    scale = smem_ref[0, 1]
    vox = smem_ref[0, 2]
    max_corr2 = smem_ref[0, 3] * smem_ref[0, 3]
    kth = smem_ref[0, 4]
    iota = jax.lax.broadcasted_iota(jnp.int32, cx_ref.shape, 1)
    lane_ok = iota < m_valid
    clf = cl_ref[:].astype(jnp.float32)  # (TR, M)
    invalid = ~lane_ok | (clf < 0.0)
    cx = cx_ref[:].astype(jnp.float32) * scale + ox_ref[0, :][None, :]
    cy = cy_ref[:].astype(jnp.float32) * scale + oy_ref[0, :][None, :]
    cz = cz_ref[:].astype(jnp.float32) * scale + oz_ref[0, :][None, :]

    ox_org = org_ref[:, 0][:, None]  # (TR, 1) row origin, world
    oy_org = org_ref[:, 1][:, None]
    oz_org = org_ref[:, 2][:, None]

    acc = [jnp.zeros_like(ox_org) for _ in range(N_SUMS)]
    for p in range(n_queries):
        x0 = q0_ref[:, 4 * p + 0][:, None]
        y0 = q0_ref[:, 4 * p + 1][:, None]
        z0 = q0_ref[:, 4 * p + 2][:, None]
        ql = q0_ref[:, 4 * p + 3][:, None]
        # s = T . q0 (world frame), T from SMEM
        sx = T_ref[0, 0] * x0 + T_ref[0, 1] * y0 + T_ref[0, 2] * z0 + T_ref[0, 3]
        sy = T_ref[0, 4] * x0 + T_ref[0, 5] * y0 + T_ref[0, 6] * z0 + T_ref[0, 7]
        sz = T_ref[0, 8] * x0 + T_ref[0, 9] * y0 + T_ref[0, 10] * z0 + T_ref[0, 11]
        # movers: queries may drift up to ONE voxel from the setup row
        # (their NN stays inside the row's 27-neighborhood; see
        # correspondence_fast.corr_apply) — only farther moves drop
        mvx = jnp.abs(
            jnp.trunc(sx / vox).astype(jnp.int32) - rabs_ref[:, 0][:, None]
        ) <= 1
        mvy = jnp.abs(
            jnp.trunc(sy / vox).astype(jnp.int32) - rabs_ref[:, 1][:, None]
        ) <= 1
        mvz = jnp.abs(
            jnp.trunc(sz / vox).astype(jnp.int32) - rabs_ref[:, 2][:, None]
        ) <= 1
        used = (used_ref[:, p][:, None] != 0) & mvx & mvy & mvz

        qx = sx - ox_org  # row-local query
        qy = sy - oy_org
        qz = sz - oz_org
        dx = cx - qx
        dy = cy - qy
        dz = cz - qz
        d2 = dx * dx + dy * dy + dz * dz  # (TR, M)
        sem = (clf == ql) | ((clf * ql) == 0.0)
        d2w = jnp.where(sem, d2 * sem_th, d2)
        d2w = jnp.where(invalid, jnp.finfo(jnp.float32).max, d2w)
        best = jnp.argmin(d2w, axis=1)
        oh = (iota == best[:, None]).astype(jnp.float32)
        inv_w = jnp.sum(jnp.where(invalid, oh, 0.0), axis=1, keepdims=True)
        tx = jnp.sum(cx * oh, axis=1, keepdims=True)  # winner, row-local
        ty = jnp.sum(cy * oh, axis=1, keepdims=True)
        tz = jnp.sum(cz * oh, axis=1, keepdims=True)
        rx = qx - tx  # residual r = s - t (translation-invariant)
        ry = qy - ty
        rz = qz - tz
        r2 = rx * rx + ry * ry + rz * rz
        accept = used & (inv_w == 0.0) & (r2 < max_corr2)
        w = jnp.where(accept, (kth * kth) / ((kth + r2) * (kth + r2)), 0.0)

        acc[0] += w
        acc[1] += w * sx
        acc[2] += w * sy
        acc[3] += w * sz
        acc[4] += w * sx * sx
        acc[5] += w * sy * sy
        acc[6] += w * sz * sz
        acc[7] += w * sx * sy
        acc[8] += w * sx * sz
        acc[9] += w * sy * sz
        acc[10] += w * rx
        acc[11] += w * ry
        acc[12] += w * rz
        acc[13] += w * (sy * rz - sz * ry)
        acc[14] += w * (sz * rx - sx * rz)
        acc[15] += w * (sx * ry - sy * rx)
        acc[16] += accept.astype(jnp.float32)
        acc[17] += used.astype(jnp.float32)

    # accumulate this tile's partials into the single (8, 128) output
    # block (index_map pins every grid step to the same block; the TPU
    # grid is sequential, so += is race-free — the standard Pallas
    # reduction pattern). Row 0, lane j holds sum j.
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros((8, 128), jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    total = jnp.zeros((8, 128), jnp.float32)
    for j in range(N_SUMS):
        s = jnp.sum(acc[j])
        total = total + jnp.where((row == 0) & (lane == j), s, 0.0)
    out_ref[:] += total


@functools.partial(
    jax.jit, static_argnames=("rows_per_block", "interpret")
)
def fused_gn_iteration(
    cx: jax.Array,  # (R, M) int16 candidate planes (see fused_semantic_nn)
    cy: jax.Array,
    cz: jax.Array,
    cl: jax.Array,
    offx: jax.Array,  # (1, M) f32 per-lane neighbor offsets, meters
    offy: jax.Array,
    offz: jax.Array,
    q0: jax.Array,  # (R, 4*P) f32 packed [x y z label], WORLD at setup
    origin: jax.Array,  # (R, 3) f32 row voxel origin, world
    row_abs: jax.Array,  # (R, 3) int32 absolute row voxel coords
    used: jax.Array,  # (R, P) int32 grid_used
    T: jax.Array,  # (4, 4) f32 pose increment since setup
    sem_th,
    scale,
    voxel_size,
    max_corr,
    kernel_th,
    rows_per_block: int = 128,
    interpret: bool = False,
    tile_map: jax.Array | None = None,  # (R//rows_per_block,) i32: block
    #   index per tile; dead tiles point at 0 (see redirection note)
):
    """One FULLY FUSED Gauss-Newton iteration over the frozen rows.

    Returns (sums (18,) f32): the weighted normal-equation partials in
    the order documented at N_SUMS. The caller assembles JTJ/JTr via
    assemble_normal_equations."""
    R, M = cx.shape
    P4 = q0.shape[1]
    P = P4 // 4
    TR = min(rows_per_block, R)
    assert R % TR == 0
    smem = jnp.stack([
        jnp.asarray(sem_th, jnp.float32),
        jnp.asarray(scale, jnp.float32),
        jnp.asarray(voxel_size, jnp.float32),
        jnp.asarray(max_corr, jnp.float32),
        jnp.asarray(kernel_th, jnp.float32),
    ]).reshape(1, 5)
    Tf = T.astype(jnp.float32).reshape(1, 16)

    # dead-tile redirection: rows are seated in u_rank order, so live
    # rows form prefixes and whole trailing tiles are often DEAD (the
    # grid is sized for worst-case demand). Redirecting a dead tile's
    # block index to 0 makes its HBM fetch a cheap re-read of block 0;
    # its contributions are zeroed through `used`, which deliberately
    # keeps the TRUE tile index (a dead tile's own used flags are all
    # zero — redirecting `used` too would double-count tile 0). The
    # per-iteration stream then scales with DEMAND, not grid capacity.
    n_tiles = R // TR
    if tile_map is None:
        tile_map = jnp.arange(n_tiles, dtype=jnp.int32)
    cand = pl.BlockSpec((TR, M), lambda i, s: (s[i], 0))
    off = pl.BlockSpec((1, M), lambda i, s: (0, 0))
    redir = lambda i, s: (s[i], 0)
    true_i = lambda i, s: (i, 0)
    out = pl.pallas_call(
        functools.partial(_gn_kernel, n_queries=P, m_valid=M),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 5), lambda i, s: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 16), lambda i, s: (0, 0),
                             memory_space=pltpu.SMEM),
                cand, cand, cand, cand,
                off, off, off,
                pl.BlockSpec((TR, P4), redir),
                pl.BlockSpec((TR, 3), redir),
                pl.BlockSpec((TR, 3), redir),
                pl.BlockSpec((TR, P), true_i),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i, s: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(tile_map, smem, Tf, cx, cy, cz, cl, offx, offy, offz, q0, origin,
      row_abs, used)
    return out[0, :N_SUMS]


def assemble_normal_equations(sums: jax.Array):
    """(18,) partials -> (JTJ (6,6), JTr (6,), ncorr, nused)."""
    w = sums[0]
    wsx, wsy, wsz = sums[1], sums[2], sums[3]
    sxx, syy, szz = sums[4], sums[5], sums[6]
    sxy, sxz, syz = sums[7], sums[8], sums[9]
    wr = sums[10:13]
    wsr = sums[13:16]
    z = jnp.zeros(())
    # upper-right block -hat(sum w s)
    ur = jnp.array([[z, wsz, -wsy], [-wsz, z, wsx], [wsy, -wsx, z]])
    tr = sxx + syy + szz
    lr = jnp.array([
        [tr - sxx, -sxy, -sxz],
        [-sxy, tr - syy, -syz],
        [-sxz, -syz, tr - szz],
    ])
    ul = w * jnp.eye(3)
    JTJ = jnp.block([[ul, ur], [ur.T, lr]])
    JTr = jnp.concatenate([wr, wsr])
    return JTJ, JTr, sums[16].astype(jnp.int32), sums[17].astype(jnp.int32)


# ---------------------------------------------------------------------------
# Fused radius-count kernel (dynamic-vehicle filter, ops/dynamic_filter.py):
# for each query slot, count candidate points within a radius. The XLA
# lowering materializes (R, 27, K) f32 temporaries (~200 MB at KITTI
# vehicle counts); here each grid step streams a (TR, M) candidate tile
# once and the counting is VMEM-resident VPU work.
# ---------------------------------------------------------------------------


def _count_kernel(smem_ref, cx_ref, cy_ref, cz_ref, q_ref, used_ref,
                  out_ref, *, n_queries: int, m_valid: int):
    r2 = smem_ref[0, 0]
    iota = jax.lax.broadcasted_iota(jnp.int32, cx_ref.shape, 1)
    lane_ok = iota < m_valid  # Mosaic tile-padding lanes hold garbage
    cx = cx_ref[:]
    cy = cy_ref[:]
    cz = cz_ref[:]
    outs = []
    for p in range(n_queries):
        qx = q_ref[:, 3 * p + 0][:, None]
        qy = q_ref[:, 3 * p + 1][:, None]
        qz = q_ref[:, 3 * p + 2][:, None]
        dx = cx - qx
        dy = cy - qy
        dz = cz - qz
        d2 = dx * dx + dy * dy + dz * dz
        near = lane_ok & (d2 <= r2)  # invalid lanes carry 1e9 coords
        cnt = jnp.sum(near.astype(jnp.float32), axis=1, keepdims=True)
        used = used_ref[:, p][:, None].astype(jnp.float32)
        outs.append(cnt * used)
    out_ref[:] = jnp.concatenate(outs, axis=1)


@functools.partial(jax.jit, static_argnames=("rows_per_block", "interpret"))
def radius_count(
    cx: jax.Array,  # (R, M) f32 candidate coords; invalid lanes >= 1e9
    cy: jax.Array,
    cz: jax.Array,
    queries: jax.Array,  # (R, 3*P) f32 packed [x y z]
    used: jax.Array,  # (R, P) int32 query-slot validity
    r2,  # squared radius
    rows_per_block: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Returns (R, P) f32: per query slot, the number of candidates in
    its row within sqrt(r2) (0 for unused slots)."""
    R, M = cx.shape
    P = used.shape[1]
    TR = min(rows_per_block, R)
    assert R % TR == 0, f"rows {R} not divisible by block {TR}"
    smem = jnp.asarray(r2, jnp.float32).reshape(1, 1)
    cand = pl.BlockSpec((TR, M), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_count_kernel, n_queries=P, m_valid=M),
        grid=(R // TR,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            cand, cand, cand,
            pl.BlockSpec((TR, 3 * P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, P), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, P), jnp.float32),
        interpret=interpret,
    )(smem, cx, cy, cz, queries, used)

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

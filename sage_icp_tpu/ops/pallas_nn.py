"""Pallas TPU kernel: fused semantic nearest-neighbor selection.

The TPU-optimized correspondence engine (ops/correspondence_fast.py)
groups ICP queries by voxel into R rows, each with P query slots and
M = 27*K gathered candidate points. The naive XLA lowering of

    d2[r,p,m] -> semantic weighting -> argmin -> winner gather

materializes several (R, P, M) f32 temporaries (~176 MB each at KITTI
scale) in HBM per ICP iteration — measured at ~3.3 s/iteration on a
v5e tile, 95% of the whole odometry step. This kernel fuses the entire
selection in VMEM: each grid step streams a (TR, M) tile of candidate
planes (x/y/z/label stored as separate rank-2 arrays for clean (8,128)
tiling), computes all P query distances on the VPU, reduces to the
winner, and writes only (TR, P) outputs. HBM traffic drops to exactly
one read of the candidate planes.

Semantics are identical to the reference nearest-neighbor rule
(/root/reference cpp/sage_icp/core/VoxelHashMap.cpp:88,111): argmin on
the sem_th-scaled squared distance where labels match or either is 0,
with the UNWEIGHTED winner distance returned for the acceptance gate
(applied by the caller). Invalid/padded candidates carry coordinates
INVALID_COORD = 1e7, so they lose every argmin and any "winner" from an
empty neighborhood fails the distance gate naturally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(sem_ref, cx_ref, cy_ref, cz_ref, cl_ref, q_ref,
            tx_ref, ty_ref, tz_ref, tl_ref, d2_ref, *, n_queries: int,
            m_valid: int):
    sem_th = sem_ref[0, 0]
    cx = cx_ref[:]  # (TR, M) — Mosaic pads the trailing tile internally
    cy = cy_ref[:]
    cz = cz_ref[:]
    cl = cl_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, cx.shape, 1)
    # tile-padding lanes hold undefined memory — only the x plane carries
    # the caller's invalid-candidate sentinel, so gate on the lane index
    # and on cx for everything that could win the argmin
    lane_ok = iota < m_valid
    big = jnp.asarray(1.0e7, cx.dtype)
    cxm = jnp.where(lane_ok, cx, big)

    txs, tys, tzs, tls, d2s = [], [], [], [], []
    for p in range(n_queries):  # static unroll; P is small (4-16)
        qx = q_ref[:, 4 * p + 0][:, None]  # (TR, 1)
        qy = q_ref[:, 4 * p + 1][:, None]
        qz = q_ref[:, 4 * p + 2][:, None]
        ql = q_ref[:, 4 * p + 3][:, None]
        dx = cxm - qx
        dy = cy - qy
        dz = cz - qz
        d2 = dx * dx + dy * dy + dz * dz  # (TR, M)
        sem = (cl == ql) | ((cl * ql) == 0.0)
        d2w = jnp.where(sem, d2 * sem_th, d2)
        d2w = jnp.where(lane_ok, d2w, jnp.finfo(cx.dtype).max)
        best = jnp.argmin(d2w, axis=1)  # (TR,) first minimum, like the ref
        oh = (iota == best[:, None]).astype(cx.dtype)  # one-hot winner
        txs.append(jnp.sum(cxm * oh, axis=1, keepdims=True))
        tys.append(jnp.sum(cy * oh, axis=1, keepdims=True))
        tzs.append(jnp.sum(cz * oh, axis=1, keepdims=True))
        tls.append(jnp.sum(cl * oh, axis=1, keepdims=True))
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
    cx: jax.Array,  # (R, Mp) f32 candidate x, voxel-local; invalid = 1e7
    cy: jax.Array,
    cz: jax.Array,
    cl: jax.Array,  # (R, Mp) f32 candidate labels
    queries: jax.Array,  # (R, 4*P) f32 packed [x y z label] per query slot
    sem_th,
    rows_per_block: int = 128,
    interpret: bool = False,
):
    """Returns (tx, ty, tz, tl, d2_true), each (R, P) f32.

    d2_true is the UNWEIGHTED squared distance of the per-slot winner;
    the caller applies the acceptance gate sqrt(d2) < max_corr_dist.
    M (the candidate lane count) need not be 128-aligned: Mosaic pads the
    trailing tile and the kernel masks the padding lanes. Only the X
    plane needs the caller's invalid-candidate masking (1e7 sentinel).
    """
    R, Mp = cx.shape
    P4 = queries.shape[1]
    assert P4 % 4 == 0
    P = P4 // 4
    TR = min(rows_per_block, R)
    assert R % TR == 0, f"rows {R} not divisible by block {TR}"
    sem = jnp.asarray(sem_th, cx.dtype).reshape(1, 1)

    grid = (R // TR,)
    cand_spec = pl.BlockSpec(
        (TR, Mp), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    q_spec = pl.BlockSpec((TR, P4), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TR, P), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((R, P), cx.dtype)

    return pl.pallas_call(
        functools.partial(_kernel, n_queries=P, m_valid=Mp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            cand_spec,
            cand_spec,
            cand_spec,
            cand_spec,
            q_spec,
        ],
        out_specs=[out_spec] * 5,
        out_shape=[out_shape] * 5,
        interpret=interpret,
    )(sem, cx, cy, cz, cl, queries)

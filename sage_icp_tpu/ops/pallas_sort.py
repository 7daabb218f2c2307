"""Pallas TPU kernel: in-VMEM bitonic sort over key/payload planes.

XLA's TPU sort is latency-bound here: ~2.8 ms whether sorting 16k or 135k
elements (measured; see docs/PERF.md), and the odometry step sorts FOUR
times per frame (two downsamples, map insert, correspondence grouping).
This kernel runs the whole Batcher bitonic network in one pallas_call with
every plane resident in VMEM: compare-exchange partners (index XOR j) are
materialized with two static lane/sublane rolls + a select, so a full
N=2^16 sort is ~150 VMEM passes with no HBM round trips.

Interface: planes are (N,) arrays with N a power of two; the first
`num_keys` planes are uint32/int32 keys compared lexicographically, the
rest move as payload. Callers append an iota plane as the LAST key to get
a total order — which makes the (unstable) bitonic network produce exactly
the stable-sort permutation.

Layout: each plane is viewed as (N/128, 128); flat index = row*128 + lane.
Exchanges at distance j < 128 are lane rolls, j >= 128 are sublane rolls.
The (k, j) stage schedule is static Python, but the network is driven by a
fori_loop over a prefetched stage table with a lax.switch over the log2(j)
roll distances, so the kernel body stays small (~log2(N) branches).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _stage_table(n: int) -> np.ndarray:
    """(S, 2) int32 rows of (k, j) for the bitonic network on n = 2^m."""
    rows = []
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            rows.append((k, j))
            j //= 2
        k *= 2
    return np.asarray(rows, dtype=np.int32)


def _kernel(stage_ref, *refs, num_keys: int, n_planes: int, n: int):
    rows = n // LANE
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0)
    idx = row * LANE + lane  # flat element index

    in_refs = refs[:n_planes]
    out_refs = refs[n_planes:]
    planes0 = tuple(r[:] for r in in_refs)

    log_lane = LANE.bit_length() - 1  # 7

    def partner_of(planes, logj):
        """Partner values at distance j = 2^logj, for every plane."""
        if logj < log_lane:
            j = 1 << logj
            sel = (lane & j) == 0

            def sw(p):  # roll shifts must be non-negative: -j == LANE - j
                return jnp.where(
                    sel,
                    pltpu.roll(p, LANE - j, 1),
                    pltpu.roll(p, j, 1),
                )

        else:
            jr = 1 << (logj - log_lane)
            sel = (row & jr) == 0

            def sw(p):
                return jnp.where(
                    sel,
                    pltpu.roll(p, rows - jr, 0),
                    pltpu.roll(p, jr, 0),
                )

        return tuple(sw(p) for p in planes)

    n_stages = stage_ref.shape[0]
    max_logj = (n.bit_length() - 1) - 1  # j ranges 1 .. n/2

    def stage(s, planes):
        k = stage_ref[s, 0]
        j = stage_ref[s, 1]
        logj = 31 - jax.lax.clz(j)

        def do(lg):
            return lambda pl_: partner_of(pl_, lg)

        partners = jax.lax.switch(
            logj, [do(lg) for lg in range(max_logj + 1)], planes
        )

        # element i keeps the minimum of the pair iff its "ascending block"
        # bit and its "left of pair" bit agree. All mask math in int32 —
        # Mosaic cannot truncate packed i8 vectors to i1.
        one = jnp.int32(1)
        zero = jnp.int32(0)
        want_min = jnp.where(
            ((idx & k) == 0) == ((idx & j) == 0), one, zero
        )

        # lexicographic strict less (partner < self) over the key planes;
        # the caller's iota tiebreak key makes this a total order
        lt = jnp.zeros_like(idx)
        eq = jnp.ones_like(idx)
        for kk in range(num_keys):
            a, b = partners[kk], planes[kk]
            lt = lt | (eq * jnp.where(a < b, one, zero))
            eq = eq * jnp.where(a == b, one, zero)
        take = (want_min * lt + (1 - want_min) * (1 - lt)) != 0
        return tuple(
            jnp.where(take, pp, p) for pp, p in zip(partners, planes)
        )

    planes = jax.lax.fori_loop(0, n_stages, stage, planes0)
    for r, p in zip(out_refs, planes):
        r[:] = p


@functools.partial(
    jax.jit, static_argnames=("num_keys", "interpret")
)
def bitonic_sort_planes(planes, num_keys: int, interpret: bool = False):
    """Sort (N,)-shaped planes lexicographically by the first num_keys
    planes (uint32/int32). N must be a power of two and >= 256. Append an
    iota plane as the last key for stability. Returns the sorted planes."""
    n = planes[0].shape[0]
    assert n & (n - 1) == 0 and n >= 2 * LANE, f"N must be 2^k >= 256, got {n}"
    for p in planes[:num_keys]:
        assert p.dtype in (jnp.uint32, jnp.int32), "keys must be 32-bit ints"
    table = jnp.asarray(_stage_table(n))
    shaped = [p.reshape(n // LANE, LANE) for p in planes]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n // LANE, LANE), lambda i, s: (0, 0))
            for _ in shaped
        ],
        out_specs=[
            pl.BlockSpec((n // LANE, LANE), lambda i, s: (0, 0))
            for _ in shaped
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, num_keys=num_keys, n_planes=len(shaped), n=n
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n // LANE, LANE), p.dtype) for p in shaped
        ],
        interpret=interpret,
    )(table, *shaped)
    return tuple(o.reshape(n) for o in out)

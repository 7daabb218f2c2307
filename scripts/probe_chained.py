"""Template for TRUSTWORTHY phase timing on the tunneled TPU.

The two traps that produced wrong numbers in round 5 (docs/PERF.md
"Round-5 measurement lessons"):
  1. Python-loop timings (dispatch N times, block once) amortize ~27 ms
     tunnel RTTs unpredictably — the same op measured 28 ms and 10 ms.
  2. A chained fori_loop whose carry consumes only one tiny output lets
     XLA dead-code the heavy part (corr_setup "measured" 1.5 ms while
     its candidate planes — the actual 21 ms — were eliminated).

Pattern: chain the op inside ONE jitted lax.fori_loop, perturb an input
from the carry (defeats loop-invariant hoisting), and fold a sample of
EVERY heavy output into the carry (defeats DCE). One dispatch, one
fetch; per-iteration time resolves to ~27/n ms.

    python scripts/probe_chained.py        # demo: times corr_setup
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


def chain_time(make_step, n=20, name="op"):
    """make_step: carry (f32 scalar) -> new carry that CONSUMES every
    heavy output of the op under test. Returns ms per iteration."""

    def body(i, carry):
        return make_step(carry)

    f = jax.jit(lambda: jax.lax.fori_loop(0, n, body, jnp.float32(0.0)))
    out = f()
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    out = f()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:44s} {dt:8.2f} ms  (chained x{n})", flush=True)
    return dt


def main():
    from sage_icp_tpu.models import pipeline as pl
    from sage_icp_tpu.ops import correspondence_fast as cf
    from sage_icp_tpu.ops import geometry as geo
    from sage_icp_tpu.ops import scan as scan_ops
    from sage_icp_tpu.utils import synthetic

    cfg = pl.PRESETS["kitti"]
    print("devices:", jax.devices(), flush=True)
    world = synthetic.build_city_world(seed=0, size=420.0, density=1.3)
    gt = synthetic.make_trajectory(12, step=1.0)
    rng = np.random.default_rng(0)
    odom = pl.SageICP(cfg)
    for i in range(10):
        odom.register_frame(
            synthetic.render_scan(world[0], world[1], gt[i], rng,
                                  n_target=120000)
        )
    state = odom.state
    s = synthetic.render_scan(world[0], world[1], gt[10], rng,
                              n_target=120000)
    cap = cfg.scan_capacity
    buf = np.full((cap, 4), scan_ops.INVALID_COORD, np.float32)
    buf[: len(s)] = s[:, :4]
    val = np.zeros((cap,), bool)
    val[: len(s)] = True
    prep = jax.jit(lambda st, p, v, t: pl.prepare_icp_inputs(
        st, p, v, t, cfg))(state, jnp.asarray(buf), jnp.asarray(val),
                           jnp.zeros((cap,), jnp.float32))
    jax.block_until_ready(prep)
    src = geo.transform_points(prep["initial_guess"], prep["source"])

    def setup_step(carry):
        q = src.at[0, 0].add(carry * 1e-6)  # carry-perturbed input
        st = cf.corr_setup(
            state.map, prep["tables"], q, prep["source_valid"],
            cfg.voxel_size_map, cfg.probe_depth,
            unique_voxel_rows=cfg.corr_unique_voxel_rows,
            queries_per_voxel=cfg.corr_queries_per_voxel,
            overflow_rows=cfg.corr_overflow_rows,
        )
        # consume EVERY heavy output — without these sums the candidate
        # planes (the dominant cost) are dead-coded
        return (
            carry * 0
            + jnp.float32(st.q0[0, 0, 0])
            + st.cxp[::997, ::97].astype(jnp.float32).sum() * 1e-12
            + st.clp[::997, ::97].astype(jnp.float32).sum() * 1e-12
            + st.grid_used[::512, 0].astype(jnp.float32).sum() * 1e-12
        )

    chain_time(setup_step, n=10, name="corr_setup (planes consumed)")


if __name__ == "__main__":
    main()

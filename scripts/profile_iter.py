"""Ablate the per-ICP-iteration cost: fused NN kernel vs corr_apply
wrapper vs normal equations vs full loop body, at KITTI and synthetic
capacities. Chained fori_loop methodology (docs/PERF.md)."""

import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sage_icp_tpu.models import pipeline as pl
from sage_icp_tpu.ops import correspondence_fast as cf
from sage_icp_tpu.ops import pallas_nn as pnn
from sage_icp_tpu.ops import registration as reg


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
    print(f"{name:56s} {(time.perf_counter()-t0)/n*1e3:9.3f} ms", flush=True)


def run(tag, R, P, K, sem_th=0.4, vox=0.8):
    M = 27 * K
    rng = np.random.default_rng(0)
    cx = jnp.asarray(rng.integers(-32000, 32000, (R, M)), jnp.int16)
    cy = jnp.asarray(rng.integers(-32000, 32000, (R, M)), jnp.int16)
    cz = jnp.asarray(rng.integers(-32000, 32000, (R, M)), jnp.int16)
    cl = jnp.asarray(rng.integers(-1, 50, (R, M)), jnp.int16)
    q = jnp.asarray(rng.normal(0, 0.5, (R, 4 * P)), jnp.float32)
    offs = jnp.asarray(
        np.repeat(
            np.array([[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                      for k in (-1, 0, 1)], np.float32), K, axis=0
        ) * vox
    )
    scale = vox / 32767.0

    chain(f"[{tag}] fused NN kernel (R={R}, M={M}, P={P})",
          lambda cx: pnn.fused_semantic_nn(
              cx, cy, cz, cl, offs[None, :, 0], offs[None, :, 1],
              offs[None, :, 2], q, sem_th, scale), cx)

    src = jnp.asarray(rng.normal(0, 30, (R * P, 4)), jnp.float32)
    tgt = src + jnp.asarray(rng.normal(0, 0.1, (R * P, 4)), jnp.float32)
    acc = jnp.asarray(rng.random((R * P,)) < 0.8)

    chain(f"[{tag}] normal equations (N={R*P})",
          lambda s: reg.build_normal_equations(s, tgt, acc, 0.1), src)

    def gn_step(s):
        JTJ, JTr = reg.build_normal_equations(s, tgt, acc, 0.1)
        x = reg.solve_increment(JTJ, JTr)
        return x

    chain(f"[{tag}] normal eq + 6x6 solve", gn_step, src)

    # full while_loop with a FIXED trip count to isolate loop overhead:
    # same body as registration's fast path, fed by the raw kernel
    def loop_body_only(q):
        def body(c):
            T, it = c
            tx, ty, tz, tl, d2 = pnn.fused_semantic_nn(
                cx, cy, cz, cl, offs[None, :, 0], offs[None, :, 1],
                offs[None, :, 2], q + T[0, 0] * 1e-30, sem_th, scale)
            s4 = jnp.stack([tx, ty, tz, tl], -1).reshape(-1, 4)
            JTJ, JTr = reg.build_normal_equations(
                s4, tgt, acc & (d2.reshape(-1) < 4.0), 0.1)
            x = reg.solve_increment(JTJ, JTr)
            import sage_icp_tpu.ops.geometry as geo
            T = jnp.matmul(geo.se3_exp(x), T)
            return T, it + 1

        def cond(c):
            return c[1] < 10

        T, _ = jax.lax.while_loop(cond, body, (jnp.eye(4), jnp.asarray(0)))
        return T

    @jax.jit
    def loop10(q):
        return loop_body_only(q)

    jax.block_until_ready(loop10(q))
    t0 = time.perf_counter()
    jax.block_until_ready(loop10(q))
    jax.block_until_ready(loop10(q))
    print(f"[{tag}] 10-iter while_loop (kernel+GN+exp)          "
          f"{(time.perf_counter()-t0)/20*1e3:9.3f} ms/iter", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    run("kitti", R=5120, P=8, K=40)
    run("synth", R=3584, P=8, K=40)


if __name__ == "__main__":
    main()

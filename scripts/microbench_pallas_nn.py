"""Microbench: fused Pallas NN selection vs the XLA einsum path at
production scale (R=5120 rows, P=8, M=1080), plus the full
get_correspondences_fast stage both ways. Run on the real TPU."""

import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sage_icp_tpu.ops import pallas_nn as pnn


def timeit(name, fn, *args, n=20):
    """Chained fori_loop timing: through the axon tunnel, repeated
    identical dispatches are cached and block_until_ready does not
    synchronize — so iterations are serialized by threading a
    data-dependent perturbation through the loop and fetching a scalar
    (PERF.md methodology note)."""

    @jax.jit
    def loop(*a):
        def body(i, acc):
            # acc-dependent input perturbation defeats CSE/hoisting;
            # 1e-30 is far below any meaningful coordinate difference
            first = a[0] + acc * 1e-30
            out = fn(first, *a[1:])
            leaf = out[0] if isinstance(out, (tuple, list)) else out
            return acc + leaf.reshape(-1)[0] * 1e-30

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(loop(*args))  # compile + warm
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    print(jax.devices(), flush=True)
    R, P, M = 5120, 8, 27 * 40
    Mp = pnn._round_up(M, 128)
    rng = np.random.default_rng(0)
    big = 1.0e7
    mask = rng.random((R, Mp)) < 0.3
    mask[:, M:] = False

    def plane(scale, fill):
        a = rng.normal(size=(R, Mp)).astype(np.float32) * scale
        return jnp.asarray(np.where(mask, a, fill).astype(np.float32))

    cx, cy, cz = plane(1.0, big), plane(1.0, big), plane(1.0, big)
    cl = jnp.asarray(
        np.where(mask, rng.integers(0, 50, (R, Mp)), 0).astype(np.float32)
    )
    q4 = jnp.asarray(rng.normal(size=(R, 4 * P)).astype(np.float32))

    fused = lambda *a: pnn.fused_semantic_nn(*a, 0.4)
    timeit("fused pallas NN (R=5120, M=1080)", fused, cx, cy, cz, cl, q4)

    # XLA reference of the same math
    def xla_path(cx, cy, cz, cl, q4):
        q = q4.reshape(R, P, 4)
        c = jnp.stack([cx, cy, cz], axis=-1)  # (R, Mp, 3)
        d2 = jnp.sum(
            (q[:, :, None, :3] - c[:, None, :, :]) ** 2, axis=-1
        )  # (R, P, Mp)
        sem = (cl[:, None, :] == q[:, :, 2:3 + 1][..., 0:1]) | (
            cl[:, None, :] * q[:, :, 3:4] == 0
        )
        d2w = jnp.where(sem, d2 * 0.4, d2)
        best = jnp.argmin(d2w, axis=-1)
        tx = jnp.take_along_axis(cx, best.reshape(R, P), axis=1)
        d2t = jnp.take_along_axis(
            d2.reshape(R, P * Mp),
            (best + jnp.arange(P)[None] * Mp).reshape(R, P), axis=1)
        return tx, d2t

    timeit("XLA einsum-style path (same shapes)", xla_path,
           cx, cy, cz, cl, q4, n=5)


if __name__ == "__main__":
    main()

"""Sharded-step smoke on REAL TPU silicon.

Round-1 gap (VERDICT.md): every multi-device validation ran the Pallas
kernels in interpreter mode on the virtual CPU mesh — whether
make_sharded_step even COMPILES with compiled pallas_call under GSPMD had
never been tested. This script runs the full sharded step on a 1-device
mesh on the attached TPU chip (compiled kernels, real partitioner) and
checks the result against the unsharded step.

    python scripts/tpu_sharded_smoke.py

One TPU process at a time (CLAUDE.md) — do not run concurrently with
bench.py or the profile scripts.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax

    from sage_icp_tpu.models import pipeline as pl
    from sage_icp_tpu.parallel import sharding as sh
    from sage_icp_tpu.utils import synthetic

    assert jax.default_backend() in ("tpu", "axon") or any(
        d.platform == "tpu" for d in jax.devices()
    ), f"need a TPU; got {jax.devices()}"
    print(f"devices: {jax.devices()}")

    config = pl.PRESETS["synthetic"]
    mesh = sh.make_mesh(n_devices=1)
    config = sh.pad_config_for_mesh(config, mesh)
    step = sh.make_sharded_step(config, mesh, donate=False)

    world_pts, world_labs = synthetic.build_world(seed=0, length=120.0,
                                                  density=2)
    gt = synthetic.make_trajectory(6, step=1.0)
    rng = np.random.default_rng(0)
    state = pl.init_state(config)
    ref_state = pl.init_state(config)
    ref_step = pl.make_step(config, donate=False)

    cap = config.scan_capacity
    t_compile = None
    for i in range(6):
        scan = synthetic.render_scan(world_pts, world_labs, gt[i], rng,
                                     n_target=60000)
        buf = np.full((cap, 4), 1.0e7, dtype=np.float32)
        buf[: len(scan)] = scan
        valid = np.zeros((cap,), dtype=bool)
        valid[: len(scan)] = True
        ts = np.zeros((cap,), dtype=np.float32)
        t0 = time.perf_counter()
        state, pose, aux = step(state, buf, valid, ts)
        pose = np.asarray(pose)
        if i == 0:
            t_compile = time.perf_counter() - t0
        ref_state, ref_pose, _ = ref_step(ref_state, buf, valid, ts)
        d = np.abs(pose - np.asarray(ref_pose)).max()
        print(
            f"frame {i}: sharded pose t={pose[:3, 3].round(3)} "
            f"|sharded - unsharded|_max = {d:.2e}"
        )
        assert np.isfinite(pose).all()
        assert d < 1e-4, "sharded step diverged from the unsharded step"
    print(
        f"OK: sharded step with COMPILED pallas_call runs under GSPMD on "
        f"real TPU (first-call {t_compile:.1f}s incl. compile)"
    )


if __name__ == "__main__":
    main()

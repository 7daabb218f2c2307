"""Regenerate the committed golden trajectory for
tests/test_robustness.py::test_golden_trajectory_regression.

Run ONLY when a semantic change is intended and documented in
docs/ARCHITECTURE.md — the golden file exists so performance work cannot
silently move the answer between rounds.

    JAX_PLATFORMS=cpu python scripts/make_golden.py
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # the env var is shadowed by
# this environment's sitecustomize — force CPU like tests/conftest.py
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_test_cache")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from test_robustness import drive, small_config  # noqa: E402

from sage_icp_tpu.utils import synthetic  # noqa: E402


def main():
    world = synthetic.build_world(seed=1, length=80.0)
    gt = synthetic.make_trajectory(12, step=1.0)
    est, _ = drive(small_config(), world, gt, seed=3)
    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "data", "golden_traj.npz"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, poses=est)
    print(f"wrote {out}: {est.shape}, final t={est[-1][:3, 3]}")


if __name__ == "__main__":
    main()

"""Multi-chip sharding tests on the 8-device virtual CPU mesh: the sharded
step must compile, run, and agree with the single-device step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sage_icp_tpu.models import pipeline as pl
from sage_icp_tpu.parallel import sharding as sh
from sage_icp_tpu.utils import synthetic


def tiny_config():
    return pl.SageConfig(
        scan_capacity=4096,
        frame_capacity=4096,
        source_capacity=1024,
        map_capacity=8192,
        max_icp_iterations=30,
        dynamic_vehicle_filter=False,
        min_range=1.0,
        # shrink the correspondence-engine tiles to the test scale — the
        # production defaults (4096+1024 rows x 27K candidates) dominate
        # CPU compile+run time without adding coverage
        corr_unique_voxel_rows=512,
        corr_overflow_rows=128,
        insert_unique_capacity=2048,
        max_incoming_per_voxel=16,
        probe_depth=8,
    )


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_single_device():
    cfg = tiny_config()
    mesh = sh.make_mesh()
    pts, labs = synthetic.build_world(seed=1, length=60.0)
    gt = synthetic.make_trajectory(3, step=0.5)
    rng = np.random.default_rng(0)
    scans = [
        synthetic.render_scan(pts, labs, gt[i], rng, n_target=3000)
        for i in range(3)
    ]

    single = pl.SageICP(cfg)
    multi = sh.ShardedSageICP(cfg, mesh)
    for s in scans:
        p1 = single.register_frame(s)
        p2 = multi.register_frame(s)
    # identical math (replicated map, psum-reduced normal equations):
    # poses agree to f32 reduction-order noise
    np.testing.assert_allclose(p1, p2, atol=5e-4)


def test_sharded_capacities_are_divisible():
    cfg = tiny_config()
    mesh = sh.make_mesh(n_devices=8)
    padded = sh.pad_config_for_mesh(cfg, mesh)
    assert padded.scan_capacity % 8 == 0
    assert padded.source_capacity % 8 == 0

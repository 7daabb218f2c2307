"""Checkpoint round-trip and PLY dump tests."""

import numpy as np
import jax.numpy as jnp

from sage_icp_tpu.models import pipeline as pl
from sage_icp_tpu.runtime import checkpoint as ckpt
from sage_icp_tpu.utils import synthetic, visualization as viz


def tiny_cfg():
    return pl.SageConfig(
        scan_capacity=4096, frame_capacity=4096, source_capacity=1024,
        map_capacity=8192, max_icp_iterations=20,
        dynamic_vehicle_filter=False, min_range=1.0,
        corr_unique_voxel_rows=512, corr_overflow_rows=128,
        insert_unique_capacity=2048, max_incoming_per_voxel=16,
        probe_depth=8,
    )


def test_checkpoint_roundtrip(tmp_path, rng):
    pts, labs = synthetic.build_world(seed=4, length=50.0)
    gt = synthetic.make_trajectory(4, step=0.5)
    odom = pl.SageICP(tiny_cfg())
    for i in range(3):
        odom.register_frame(
            synthetic.render_scan(pts, labs, gt[i], rng, n_target=2500)
        )
    path = str(tmp_path / "state.npz")
    ckpt.save_state(path, odom)

    # continue original
    scan3 = synthetic.render_scan(pts, labs, gt[3], rng, n_target=2500)
    pose_cont = odom.register_frame(scan3).copy()

    # restore into a fresh object and replay the same frame
    odom2 = pl.SageICP(tiny_cfg())
    ckpt.load_state(path, odom2)
    assert len(odom2.poses) == 3
    pose_resumed = odom2.register_frame(scan3)
    np.testing.assert_allclose(pose_resumed, pose_cont, atol=1e-5)


def test_ply_dump(tmp_path, rng):
    pts = np.concatenate(
        [rng.normal(size=(100, 3)), np.full((100, 1), 40.0)], axis=1
    ).astype(np.float32)
    path = str(tmp_path / "cloud.ply")
    viz.write_ply(path, pts)
    data = open(path, "rb").read()
    assert data.startswith(b"ply")
    assert b"element vertex 100" in data
    # header + 100 * 15-byte records
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    assert len(data) - header_end == 100 * 15

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


def test_project_to_image():
    from sage_icp_tpu.utils import visualization as viz

    # camera at origin looking down +z of its own frame; lidar frame = cam
    T = np.eye(4)
    f, cx, cy = 100.0, 64.0, 48.0
    P = np.array([[f, 0, cx, 0], [0, f, cy, 0], [0, 0, 1, 0]])
    pts = np.array([
        [0.0, 0.0, 10.0, 40.0],   # straight ahead -> principal point
        [1.0, 0.0, 10.0, 40.0],   # 1m right at 10m -> +10px in u
        [0.0, 0.0, -5.0, 40.0],   # behind the camera -> masked
    ])
    uv, mask = viz.project_to_image(pts, T, P, (96, 128))
    assert mask.tolist() == [True, True, False]
    np.testing.assert_allclose(uv[0], [cx, cy], atol=1e-6)
    np.testing.assert_allclose(uv[1], [cx + 10.0, cy], atol=1e-6)

    img = np.zeros((96, 128, 3), np.uint8)
    out = viz.overlay_scan_on_image(img, pts, T, P, radius=0)
    assert out[int(cy), int(cx)].any()  # painted with the label color
    assert not img.any()  # original untouched

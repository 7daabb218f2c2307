"""End-to-end integration: run the full jitted odometry step over a
synthetic semantic world and check the recovered trajectory against ground
truth — the same verification style as the reference's eval harness
(reference eval/kitti_pub.py replaying KITTI with GT comparison)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sage_icp_tpu.models import pipeline as pl
from sage_icp_tpu.utils import synthetic


def small_config(**kw):
    defaults = dict(
        scan_capacity=16384,
        frame_capacity=16384,
        source_capacity=4096,
        map_capacity=32768,
        max_icp_iterations=100,
        dynamic_vehicle_filter=False,
        min_range=1.0,
        # row demand ~= num_source with the P=2 grid (most queries are
        # alone in their 0.8 m voxel; see SageConfig.corr_unique_voxel_rows)
        corr_unique_voxel_rows=4096,
        corr_overflow_rows=512,
        insert_unique_capacity=4096,
    )
    defaults.update(kw)
    return pl.SageConfig(**defaults)


@pytest.fixture(scope="module")
def world():
    return synthetic.build_world(seed=1, length=80.0)


def run_sequence(config, world, n_frames=12, step=1.0, n_target=14000, seed=3):
    """n_target 14000 matches the robustness/golden fixtures. 9000-point
    corridor scans are BELOW the round-4 renderer's in-domain density:
    with per-frame fresh sampling and surface-aware falloff the corridor's
    forward DoF is only marginally constrained, and at 9000 points the
    solve slips ~0.7 m/frame from frame 2 (round-5 bisect,
    scripts/r5_corridor_bisect.py: ATE 2.897 @ 9000 vs 0.004 @ 14000 with
    the IDENTICAL config — density, not capacities, is the domain edge)."""
    pts, labs = world
    rng = np.random.default_rng(seed)
    gt = synthetic.make_trajectory(n_frames, step=step)
    odom = pl.SageICP(config)
    for i in range(n_frames):
        scan = synthetic.render_scan(pts, labs, gt[i], rng, n_target=n_target)
        odom.register_frame(scan)
    return np.stack(odom.poses), gt, odom


@pytest.fixture(scope="module")
def base_run(world):
    """One shared 12-frame run of the default small config — several tests
    assert different properties of the same trajectory."""
    return run_sequence(small_config(), world)


def test_full_pipeline_tracks_synthetic_trajectory(base_run, world):
    est, gt, odom = base_run
    # relative normalization (both start near identity already)
    err = []
    for e, g in zip(est, gt):
        g0inv = np.linalg.inv(gt[0])
        e0inv = np.linalg.inv(est[0])
        err.append(np.linalg.norm((e0inv @ e)[:3, 3] - (g0inv @ g)[:3, 3]))
    ate = np.sqrt(np.mean(np.square(err)))
    assert ate < 0.15, f"trajectory ATE too large: {ate:.3f} m, errs={err}"
    # sanity: the map grew and ICP converged within iteration budget
    assert int(odom.last_aux.num_frame_ds) > 500
    assert int(odom.last_aux.icp_iterations) < 100
    # a healthy config must not silently drop work
    assert int(odom.last_aux.overflow_total()) == 0


# NOTE: the geometric (KISS-mode) tracking test lives in
# test_robustness.py::test_geometric_preset_tracks_city — geometric mode
# has ~1/3 the sources of semantic mode (single 1.0 m class grid) and the
# corridor world's forward DoF is below its constraint budget under the
# round-4 fresh-sampling renderer (round-5 bisect: slips ~0.4 m/frame at
# ANY tested density); the city world constrains all six DoF.


def test_reinitialize_resets(world):
    cfg = small_config()
    est, gt, odom = run_sequence(cfg, world, n_frames=3)
    odom.reinitialize()
    assert odom.poses == []
    assert int(odom.state.num_poses) == 0
    assert not bool(jnp.any(odom.state.map.counts > 0))


def test_first_frame_pose_is_identity(world):
    pts, labs = world
    rng = np.random.default_rng(0)
    gt = synthetic.make_trajectory(1)
    odom = pl.SageICP(small_config())
    scan = synthetic.render_scan(pts, labs, gt[0], rng, n_target=6000)
    pose = odom.register_frame(scan)
    np.testing.assert_allclose(pose, np.eye(4), atol=1e-5)


def test_adaptive_threshold_engages(base_run):
    est, gt, odom = base_run
    # after 12 frames of 1 m steps the vehicle has moved; sigma must have
    # adapted away from the initial threshold at least once
    assert int(odom.state.threshold.num_samples) >= 1
    assert float(odom.last_aux.sigma) != pytest.approx(2.0)


def test_chunked_step_matches_single_frames(world):
    """register_chunk (lax.scan offline mode) must produce the same
    trajectory as frame-by-frame register_frame."""
    pts, labs = world
    rng = np.random.default_rng(7)
    gt = synthetic.make_trajectory(6, step=0.8)
    scans = [
        synthetic.render_scan(pts, labs, gt[i], rng, n_target=6000)
        for i in range(6)
    ]
    cfg = small_config()
    a = pl.SageICP(cfg)
    for s in scans:
        a.register_frame(s)
    b = pl.SageICP(cfg)
    b.register_chunk(scans[:3])
    b.register_chunk(scans[3:])
    np.testing.assert_allclose(a.trajectory(), b.trajectory(), atol=1e-5)


def test_chunked_aux_catches_mid_chunk_overflow():
    """The chunked step's aux must AGGREGATE counters over the lax.scan:
    an overflow on a MIDDLE frame that self-heals by the last frame was
    invisible when aux reported frame W-1 only (VERDICT r3 weak #5 — the
    bench honesty guard inspected 1 frame in 30)."""

    def patch_scan(seed):
        # ~500 points in a 3 m patch: a handful of source voxels, far
        # under the 64-row correspondence grid below
        rng = np.random.default_rng(seed)
        xyz = np.stack(
            [
                rng.uniform(4.0, 7.0, 500),
                rng.uniform(-1.5, 1.5, 500),
                rng.uniform(0.0, 1.0, 500),
            ],
            axis=1,
        )
        lab = np.full((500, 1), 40.0)
        return np.concatenate([xyz, lab], 1).astype(np.float32)

    rng = np.random.default_rng(2)
    wide = np.concatenate(
        [
            rng.uniform(-50.0, 50.0, (3000, 3)),
            np.full((3000, 1), 40.0),
        ],
        axis=1,
    ).astype(np.float32)  # thousands of unique source voxels

    cfg = small_config(corr_unique_voxel_rows=64, corr_overflow_rows=32)
    scans = [patch_scan(0), wide, patch_scan(1)]

    chunked = pl.SageICP(cfg)
    chunked.register_chunk(scans)
    assert int(chunked.last_aux.corr_dropped) > 0
    assert int(chunked.last_aux.overflow_total()) > 0

    # the same frames per-frame: the LAST frame alone reports clean —
    # proving last-frame-only aux would have masked the mid-chunk drop
    per_frame = pl.SageICP(cfg)
    for s in scans:
        per_frame.register_frame(s)
    assert int(per_frame.last_aux.corr_dropped) == 0


def test_quantized_upload_matches_f32(world):
    """int16 scan upload (3.9 mm xyz quantization) must track the f32
    path within quantization noise — it halves the serial host->device
    bytes on the remote-TPU link (docs/PERF.md)."""
    import dataclasses

    pts, labs = world
    rng = np.random.default_rng(11)
    gt = synthetic.make_trajectory(5, step=0.8)
    scans = [
        synthetic.render_scan(pts, labs, gt[i], rng, n_target=6000)
        for i in range(5)
    ]
    a = pl.SageICP(small_config())
    b = pl.SageICP(
        dataclasses.replace(small_config(), quantized_scan_upload=True)
    )
    for s in scans:
        a.register_frame(s)
        b.register_frame(s)
    ta, tb = a.trajectory(), b.trajectory()
    d = np.linalg.norm(ta[:, :3, 3] - tb[:, :3, 3], axis=-1)
    assert d.max() < 0.02, f"quantized upload drifted {d.max():.4f} m"

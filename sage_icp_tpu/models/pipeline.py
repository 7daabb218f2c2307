"""The SAGE-ICP odometry pipeline as one jitted, fixed-shape step function.

TPU-native re-design of the reference's stateful orchestrator
(cpp/sage_icp/pipeline/sageICP.{hpp,cpp}): instead of a mutable C++ object
driven per-ROS-message, the whole per-scan pipeline

    deskew -> preprocess -> double voxel downsample -> adaptive threshold
    -> constant-velocity prediction -> semantic ICP -> map update

is a pure function (OdomState, scan) -> (OdomState', pose) traced once and
compiled by XLA. The host keeps only the trajectory log.

Reference behaviors reproduced (file:line in /root/reference):
  * deskew gated on config && >= 3 poses (pipeline/sageICP.cpp:38-50)
  * double downsample: map frame at 0.5x group size, ICP source at a
    further 1.5x (pipeline/sageICP.cpp:97-101)
  * sigma plumbing: max_corr_dist = 3*sigma, robust kernel = sigma/3
    (pipeline/sageICP.cpp:80-85)
  * adaptive threshold: sigma = initial until HasMoved; ComputeThreshold
    accumulates SSE of the model error when error > min_motion_th
    (pipeline/sageICP.cpp:103-108, core/Threshold.cpp:39-50)
  * HasMoved = ||(first^-1 last).t|| > 5 * min_motion_th
    (pipeline/sageICP.cpp:117-121)
  * prediction = poses[N-2]^-1 poses[N-1]; initial_guess = last * pred
    (pipeline/sageICP.cpp:74-76,110-115)
  * map update with the new pose, cull by local_map_range
    (pipeline/sageICP.cpp:92, core/VoxelHashMap.cpp:144-160)
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sage_icp_tpu.ops import geometry as geo
from sage_icp_tpu.ops import hashmap as hm
from sage_icp_tpu.ops import registration as reg
from sage_icp_tpu.ops import scan as scan_ops


@dataclasses.dataclass(frozen=True)
class SageConfig:
    """All tunables; defaults = the reference's KITTI/Cylinder3D variant
    (ros/launch/odometry.launch.py:14-97 + pipeline/sageICP.hpp:39-65)."""

    # semantic class groups for the adaptive downsampler
    voxel_labels: tuple = (
        (40, 44, 48, 49),  # road
        (50, 51, 52),  # building
        (70, 72),  # plant
        (60, 71, 80, 81, 99),  # object
        (0,),  # unlabelled
        (10, 11, 13, 15, 16, 18, 20),  # vehicle
    )
    voxel_size: tuple = (0.6, 1.0, 0.9, 0.8, 1.0, 0.6)

    # map
    voxel_size_map: float = 0.8
    local_map_range: float = 100.0
    basic_points_per_voxel: int = 20
    critical_points_per_voxel: int = 20
    basic_parts_labels: tuple = (40, 44, 48, 49, 50, 70, 72)

    # preprocessing
    max_range: float = 100.0
    min_range: float = 5.0
    label_max_range: float = 50.0
    deskew: bool = False

    # dynamic vehicle filter (reference core/Preprocessing.cpp:95-172)
    dynamic_vehicle_filter: bool = True
    dynamic_vehicle_filter_th: float = 0.5
    dynamic_vehicle_voxid: int = 5
    dynamic_remove_landmark: tuple = (44, 48)

    # semantic association + adaptive threshold
    sem_th: float = 0.4
    initial_threshold: float = 2.0
    min_motion_th: float = 0.1

    # --- TPU capacities (fixed shapes; no reference analog) ---
    scan_capacity: int = 135_168  # raw points per scan (KITTI ~130k)
    frame_capacity: int = 65_536  # after 0.5x class-adaptive downsample
    source_capacity: int = 20_480  # after further 1.5x downsample (ICP
    # src). Real KITTI runs at ~5-10k; the bench city world saturates at
    # ~15.4k sources (surfaces fill the whole 100 m disc), which left only
    # 6% headroom at the old 16384 — sized for the measured worst case
    # with margin (scripts/world_occupancy.py)
    map_capacity: int = 262_144  # voxel slots (power of two)
    # bounded linear-probe window. With the Fibonacci-mixed hash
    # (ops/hashmap.py::hash_keys) a depth-12 window yields ZERO claim
    # failures at the steady-state load factor (~80k live voxels in 262k
    # slots, simulated on the bench city world; docs/PERF.md) — the
    # insert_claim_failures counter in StepAux verifies this per frame
    probe_depth: int = 12
    # per-frame per-voxel incoming cap: the 0.5x class-adaptive downsample
    # feeding the insert emits up to ~(2*v_map/v_class)^3 points per map
    # voxel (road class 0.3 m cells in a 0.8 m voxel -> measured frame max
    # 39); 48 covers it with margin, and the policy kernel's round loop is
    # bounded by the frame's ACTUAL max rank, so an oversized cap costs
    # only window-table bytes, not rounds
    max_incoming_per_voxel: int = 48
    # distinct voxels touched by one frame's insert (compaction bound);
    # typical steady state is frame points / 2-4. A multiple of 3*256
    # lets the policy kernel pack 3 K=40 blocks per 128-lane row
    # (ops/pallas_insert.py)
    insert_unique_capacity: int = 33_024
    # TPU-optimized correspondence engine (ops/correspondence_fast.py):
    # packed-key probe windows + unique-query-voxel compaction + MXU
    # distance matrices. Falls back to the reference-shaped path when the
    # map extent does not fit the 10-bit packing.
    use_fast_correspondences: bool = True
    # toroidal dense voxel->slot index (ops/hashmap.py grid_probe),
    # geometrically valid while the culled map spans < 256 voxels in x/y
    # and < 64 in z. MEASURED NET-NEGATIVE at current capacities (bench
    # 32.1 vs 42.6 scans/s): the one-row-gather probe does beat the
    # hash-window gather, but the per-insert index maintenance (stale
    # clears + row scatters) costs more than the probe saves. Kept
    # correct and tested for larger-map regimes where probing dominates.
    dense_grid: bool = False
    # int16 host->device scan upload: xyz quantized at 2^-8 m (3.9 mm —
    # below LiDAR noise, range +-128 m), labels/timestamps in int16 lanes.
    # Halves the per-chunk upload bytes, which ride the host link
    # serially with compute (docs/PERF.md). Default off: the f32 path is
    # bit-identical to the reference's input; this is a deployment choice.
    quantized_scan_upload: bool = False
    # vertical extent (m) the mapped world may span when dense_grid is on:
    # the 64-voxel z torus period must hold every LIVE voxel (the
    # spherical cull alone allows 2*local_map_range in z, which would
    # alias) — a declared deployment bound like the capacities above
    dense_grid_z_extent: float = 40.0
    # Correspondence grid sizing. The 1.5x source downsample emits at
    # most one query per 1.2 m cell while map voxels are 0.8 m, so MOST
    # QUERIES ARE ALONE IN THEIR VOXEL: row demand ~= num_source, and
    # queries_per_voxel beyond 2 is padding the NN kernel multiplies
    # into wasted VPU work. Round-2's 4096x8 grid (sized by the shared-
    # voxel intuition) could seat only 4096 of ~14k unique source voxels
    # at KITTI scale — the dropped queries were the corr_dropped counter
    # that killed the round-2 bench and the city-world divergence at
    # frame ~20 (ncorr collapsed 4702 -> 0 while nsrc held 15k).
    # Measured demand: scripts/world_occupancy.py. (rows + overflow)
    # must stay a multiple of 128 (NN kernel tiling). NOTE (round 5): a
    # refit to 12288+1024 from the frame-10 steady-state count (9,050
    # unique source voxels) LOST TRACKING at bench frames 40+ — source
    # demand grows to ~15k as the drive covers fresh territory; size
    # from the full-sequence max, not an early-trajectory snapshot.
    # Every correspondence-phase cost is R-proportional (the (R*27)-row
    # candidate gather runs at the ~18 GB/s random-row ceiling), so
    # right-sizing this is worth ~25% of the solve — per DEPLOYMENT,
    # with the corr_dropped counter as the guard.
    corr_unique_voxel_rows: int = 16_384
    corr_queries_per_voxel: int = 2
    corr_overflow_rows: int = 2048
    max_icp_iterations: int = 500
    # Solve-health guard escape hatch (ADVICE r4): after this many
    # CONSECUTIVE rejected frames the next finite solve is force-accepted
    # (and its points inserted) even if its correspondence count is below
    # the 5% floor — a sustained legitimately-low-overlap stretch
    # (occlusion, re-entering a culled area) must not latch into
    # permanent coasting: the reference always accepts and can
    # re-converge; with the hatch, so can we. Forced accepts are counted
    # in StepAux.icp_forced and ride overflow_total().
    reject_streak_limit: int = 5
    dtype: str = "float32"

    def jax_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def points_per_voxel(self) -> int:
        return self.basic_points_per_voxel + self.critical_points_per_voxel


# Per-dataset presets (SURVEY.md section 5 config table; diffs verified
# against ros/launch/odometry_360.launch.py, odometry_gt.launch.py,
# odometry_raw.launch.py).
PRESETS = {
    "kitti": SageConfig(),
    "kitti360": SageConfig(
        voxel_size=(1.0, 0.5, 1.0, 0.5, 1.0, 0.5),
        voxel_size_map=1.0,
        sem_th=0.8,
    ),
    "kitti_gt": SageConfig(
        sem_th=0.05,
        dynamic_vehicle_filter=False,
    ),
    "kitti_raw": SageConfig(
        voxel_size=(1.2, 1.0, 1.2, 0.2, 1.0, 0.5),
        voxel_size_map=1.0,
        sem_th=0.2,
    ),
    # the synthetic benchmark world (utils/synthetic.py at density 2):
    # identical ALGORITHM parameters to the kitti preset, with capacities
    # fitted to measured occupancy x ~1.5-4 margin (raw scan ~46k, frame
    # downsample ~22k, ICP source ~3.7k, live map voxels ~5k) — fixed
    # shapes are a per-dataset deployment choice, exactly like sizing for
    # a known sensor. The dynamic filter is off (the _gt-variant setting)
    # because synthetic labels are ground truth.
    "synthetic": SageConfig(
        dynamic_vehicle_filter=False,
        min_range=2.0,
        scan_capacity=65_536,
        frame_capacity=32_768,
        source_capacity=8_192,
        # ~21k voxels stay live under the 100 m cull once the trajectory
        # covers the corridor; 65k slots keep the open-addressing load at
        # ~0.31 where a 12-deep probe window never exhausts (measured
        # zero claim failures; 32k slots ran at load 0.63 and failed
        # ~700 claims per frame — docs/PERF.md round 2)
        map_capacity=65_536,
        insert_unique_capacity=8_448,  # 3 * 256 * 11: packed policy rows
        # measured unique source voxels peak at 3154 on the corridor
        # (scripts/world_occupancy.py); 3072 rows could drop queries at
        # healthy poses — resized with margin
        corr_unique_voxel_rows=4096,
        corr_overflow_rows=512,
    ),
    # Manhattan-grid city world (utils/synthetic.py::build_city_world) at
    # density 0.7 — the benchmark's fitted-capacity phase-1 preset. The
    # corridor world behind the original "synthetic" preset is FORWARD-
    # DEGENERATE for this class of odometry (the road direction is only
    # weakly constrained; the closed loop amplifies whichever way noise
    # tips — reference-exact semantics and f64 normal equations diverge
    # on it identically, scripts/divergence_bisect.py), so the bench runs
    # on the city world, whose structure constrains all six DoF.
    # Capacities from measured occupancy (scripts/world_occupancy.py,
    # d=0.7 on the round-4 world + render: enriched geometry (multi-
    # scale facade relief, parking rows, sidewalk clutter), per-frame
    # fresh sampling, surface-aware falloff (walls dense to 40 m):
    # raw 26.6k, ds1 22.5k, src 10.1k, unique src voxels 9.3k, insert
    # voxels 15.5k, live map 39.4k) x 1.1-3 margin. 131k slots keep the
    # hash load at ~0.30 where the depth-12 probe window never exhausts.
    "city": SageConfig(
        dynamic_vehicle_filter=False,
        min_range=2.0,
        scan_capacity=32_768,
        frame_capacity=28_672,
        source_capacity=12_288,
        map_capacity=131_072,
        insert_unique_capacity=16_896,  # 3 * 256 * 22: packed policy rows
        corr_unique_voxel_rows=10_240,
        corr_overflow_rows=1_024,
    ),
    # geometric KISS-ICP mode: single class group holding every label,
    # semantics disabled (BASELINE.json config #1)
    "geometric": SageConfig(
        voxel_labels=(tuple(range(260)),),
        voxel_size=(1.0,),
        voxel_size_map=1.0,
        sem_th=1.0,
        label_max_range=0.0,  # zero all labels
        dynamic_vehicle_filter=False,
        basic_points_per_voxel=20,
        critical_points_per_voxel=0,
    ),
}


class ThresholdState(NamedTuple):
    """Functional AdaptiveThreshold (reference core/Threshold.hpp:29-52)."""

    model_deviation: jax.Array  # (4, 4)
    sse: jax.Array  # f32 scalar
    num_samples: jax.Array  # i32 scalar


class OdomState(NamedTuple):
    map: hm.MapState
    last_pose: jax.Array  # (4, 4) poses_[N-1]
    prev_pose: jax.Array  # (4, 4) poses_[N-2]
    first_pose: jax.Array  # (4, 4) poses_.front()
    num_poses: jax.Array  # i32
    threshold: ThresholdState
    reject_streak: jax.Array  # i32 consecutive frames the solve-health
    #   guard rejected; feeds the force-accept escape hatch
    #   (SageConfig.reject_streak_limit)


class StepAux(NamedTuple):
    sigma: jax.Array
    icp_iterations: jax.Array
    num_correspondences: jax.Array
    num_source: jax.Array
    num_frame_ds: jax.Array
    # --- overflow counters: a fixed-shape pipeline must make every silent
    # drop observable (all i32, 0 = healthy) ---
    corr_dropped: jax.Array  # ICP queries with no correspondence-grid seat
    ds_truncated: jax.Array  # downsample outputs beyond capacity (both
    #                          voxelize stages summed)
    insert_unique_overflow: jax.Array  # voxels beyond insert_unique_capacity
    insert_claim_failures: jax.Array  # probe-window-exhausted new voxels
    insert_incoming_truncated: jax.Array  # points > max_incoming_per_voxel
    dynfilter_overflow: jax.Array  # vehicle points beyond the filter cap
    nonfinite_pose: jax.Array  # 1 iff ICP returned an INVALID pose this
    #   frame: non-finite entries (singular geometry / teleported input)
    #   OR a non-orthonormal rotation (f32 denormalization after a
    #   garbage many-increment solve — ADVICE r4: both signatures share
    #   this counter); the step then falls back to the motion-model
    #   guess so the map is never polluted
    icp_rejected: jax.Array  # 1 iff a FINITE solve was rejected because
    #   its correspondence count collapsed below the health floor (a lost
    #   frame: garbage scan, teleport, or an out-of-basin guess). The step
    #   coasts on the motion model and skips the map insert so one bad
    #   frame cannot poison the map or the carried pose (VERDICT r3 #3)
    icp_forced: jax.Array  # 1 iff a below-floor finite solve was
    #   FORCE-ACCEPTED because the guard had rejected
    #   reject_streak_limit consecutive frames (the escape hatch that
    #   keeps rejection from latching; ADVICE r4)

    def overflow_total(self):
        """Sum of every silent-drop channel — assert == 0 in benchmarks."""
        return (
            self.corr_dropped + self.ds_truncated
            + self.insert_unique_overflow + self.insert_claim_failures
            + self.insert_incoming_truncated + self.dynfilter_overflow
            + self.nonfinite_pose + self.icp_rejected + self.icp_forced
        )


def init_state(config: SageConfig) -> OdomState:
    dt = config.jax_dtype()
    if config.dense_grid:
        span = 2.0 * config.local_map_range / config.voxel_size_map + 4
        assert span < (1 << hm.GRID_XY_BITS), (
            "dense_grid requires the culled map to span < 256 voxels; "
            "lower local_map_range, raise voxel_size_map, or set "
            "dense_grid=False"
        )
        # z torus period is only 64 voxels and the spherical cull alone
        # does NOT bound z that tightly (51 m at 0.8 m voxels): two live
        # voxels sharing a torus cell make the unique-indices grid scatter
        # undefined (silent entry loss -> duplicate-slot claims). The user
        # asserts the real vertical extent of the mapped world instead.
        zspan = config.dense_grid_z_extent / config.voxel_size_map + 4
        assert zspan < (1 << hm.GRID_Z_BITS), (
            f"dense_grid z period (64 voxels = "
            f"{64 * config.voxel_size_map:.0f} m) cannot hold "
            f"dense_grid_z_extent={config.dense_grid_z_extent} m; raise "
            "voxel_size_map, lower dense_grid_z_extent (and ensure the "
            "terrain truly fits), or set dense_grid=False"
        )

    # distinct device buffers per leaf: the step donates the whole state,
    # and donating one buffer twice is a runtime error
    def eye():
        return jnp.asarray(np.eye(4), dtype=dt)

    return OdomState(
        map=hm.create(
            config.map_capacity, config.points_per_voxel, dt,
            dense_grid=config.dense_grid,
        ),
        last_pose=eye(),
        prev_pose=eye(),
        first_pose=eye(),
        num_poses=jnp.asarray(0, jnp.int32),
        threshold=ThresholdState(
            model_deviation=eye(),
            sse=jnp.asarray(0.0, dt),
            num_samples=jnp.asarray(0, jnp.int32),
        ),
        reject_streak=jnp.asarray(0, jnp.int32),
    )


def compute_model_error(deviation: jax.Array, max_range) -> jax.Array:
    """reference core/Threshold.cpp:29-34."""
    theta = geo.rotation_angle(deviation[:3, :3])
    delta_rot = 2.0 * max_range * jnp.sin(theta / 2.0)
    delta_trans = jnp.linalg.norm(deviation[:3, 3])
    return delta_trans + delta_rot


def _adaptive_sigma(
    ts: ThresholdState, has_moved: jax.Array, config: SageConfig
) -> tuple[jax.Array, ThresholdState]:
    """sigma + threshold-state update. GetAdaptiveThreshold returns the
    initial threshold until motion exceeds 5*min_motion_th; afterwards
    ComputeThreshold() both accumulates and returns (stateful in the
    reference: Threshold.cpp:39-50 — only invoked when HasMoved,
    pipeline/sageICP.cpp:103-108)."""
    err = compute_model_error(ts.model_deviation, config.max_range)
    take = has_moved & (err > config.min_motion_th)
    sse = jnp.where(take, ts.sse + err * err, ts.sse)
    n = jnp.where(take, ts.num_samples + 1, ts.num_samples)
    sigma_adaptive = jnp.where(
        n < 1,
        jnp.asarray(config.initial_threshold, ts.sse.dtype),
        jnp.sqrt(sse / jnp.maximum(n, 1).astype(ts.sse.dtype)),
    )
    sigma = jnp.where(
        has_moved, sigma_adaptive, jnp.asarray(config.initial_threshold, ts.sse.dtype)
    )
    return sigma, ThresholdState(ts.model_deviation, sse, n)


def voxelize(points, valid, config: SageConfig, with_stats: bool = False):
    """Double downsample (reference pipeline/sageICP.cpp:97-101)."""
    lut = scan_ops.make_label_group_lut(list(map(list, config.voxel_labels)))
    sizes = jnp.asarray(config.voxel_size, dtype=points.dtype)
    frame_ds, frame_valid, trunc1 = scan_ops.voxel_downsample(
        points, valid, lut, sizes, 0.5, config.frame_capacity,
        voxel_labels=config.voxel_labels, with_stats=True,
    )
    source, source_valid, trunc2 = scan_ops.voxel_downsample(
        frame_ds, frame_valid, lut, sizes, 1.5, config.source_capacity,
        voxel_labels=config.voxel_labels, with_stats=True,
    )
    if with_stats:
        return (source, source_valid), (frame_ds, frame_valid), trunc1 + trunc2
    return (source, source_valid), (frame_ds, frame_valid)


def prepare_icp_inputs(
    state: OdomState,
    points: jax.Array,
    valid: jax.Array,
    timestamps: jax.Array,
    config: SageConfig,
) -> dict:
    """Everything of the step BEFORE the ICP solve (reference
    pipeline/sageICP.cpp:36-76): deskew, preprocess, dynamic filter,
    double downsample, adaptive threshold, constant-velocity prediction,
    and the shared probe tables. Split out so the runner's timed mode can
    clock the ICP solve as its own device dispatch (the reference times
    exactly that span with std::chrono, sageICP.cpp:79-88)."""
    dt = config.jax_dtype()
    eye = jnp.eye(4, dtype=dt)

    # --- deskew (gated: config flag && >= 3 poses) -------------------------
    if config.deskew:
        deskewed = scan_ops.deskew(points, timestamps, state.prev_pose, state.last_pose)
        use = state.num_poses > 2
        points = jnp.where(use, deskewed, points)

    # --- preprocess ---------------------------------------------------------
    cropped, crop_valid = scan_ops.preprocess(
        points, valid, config.max_range, config.min_range, config.label_max_range
    )
    # NOTE: dynamic vehicle filter (reference Preprocessing.cpp:95-172) is
    # applied here when enabled — see sage_icp_tpu.ops.dynamic_filter.
    dyn_overflow = jnp.asarray(0, jnp.int32)
    if config.dynamic_vehicle_filter:
        from sage_icp_tpu.ops import dynamic_filter as dyn

        cropped, crop_valid, dyn_overflow = dyn.filter_dynamic_vehicles(
            cropped, crop_valid, config, with_stats=True
        )

    # --- voxelize ------------------------------------------------------------
    (source, source_valid), (frame_ds, frame_valid), ds_trunc = voxelize(
        cropped, crop_valid, config, with_stats=True
    )

    # --- adaptive threshold --------------------------------------------------
    motion = jnp.linalg.norm(
        (geo.se3_inverse(state.first_pose) @ state.last_pose)[:3, 3]
    )
    has_moved = (state.num_poses > 0) & (motion > 5.0 * config.min_motion_th)
    sigma, thr = _adaptive_sigma(state.threshold, has_moved, config)

    # --- prediction + initial guess ------------------------------------------
    prediction = jnp.where(
        state.num_poses < 2,
        eye,
        geo.se3_inverse(state.prev_pose) @ state.last_pose,
    )
    # Teleport clamp: a constant-velocity prediction larger than the sensor
    # range is never physical (10 Hz LiDAR at max_range m/frame = 3600 km/h)
    # — it means the carried poses are corrupted. Coast in place instead of
    # extrapolating: unbounded extrapolation is exactly how a lost run
    # overflowed f32 and latched NaN (round-4 bisect, frames 27-30; the
    # NaN-pred comparison is False, so NaN also falls back to eye).
    # The check covers the WHOLE matrix: a prediction with garbage
    # ROTATION lanes but small translation (inf*0=NaN products from a
    # corrupted carried pose) must fall back too — checking only the
    # translation norm let NaN rotations through (round-4 repro f030-31).
    pred_ok = jnp.all(jnp.isfinite(prediction)) & (
        jnp.linalg.norm(prediction[:3, 3]) <= config.max_range
    )
    prediction = jnp.where(pred_ok, prediction, eye)
    last = jnp.where(state.num_poses > 0, state.last_pose, eye)
    # induction guard: a finite step output requires a finite carried pose
    last = jnp.where(jnp.all(jnp.isfinite(last)), last, eye)
    initial_guess = jnp.matmul(last, prediction, precision="highest")

    from sage_icp_tpu.ops.correspondence_fast import fast_path_supported

    fast_ok = config.use_fast_correspondences and fast_path_supported(
        config.voxel_size_map, config.local_map_range, config.max_range
    )
    # one probe-table build per step, shared by the ICP solve and the map
    # insert (packed offsets cover both centers: fast_path_supported bounds
    # map extent + scan extent within the 10-bit range)
    shared_tables = None
    if fast_ok:
        from sage_icp_tpu.ops import correspondence_fast as cf
        from sage_icp_tpu.ops.scan import trunc_div

        shared_tables = cf.build_probe_tables(
            state.map,
            trunc_div(initial_guess[:3, 3], config.voxel_size_map),
            config.probe_depth,
        )
    return dict(
        source=source,
        source_valid=source_valid,
        frame_ds=frame_ds,
        frame_valid=frame_valid,
        sigma=sigma,
        thr=thr,
        initial_guess=initial_guess,
        tables=shared_tables,
        fast_ok=fast_ok,
        dyn_overflow=dyn_overflow,
        ds_trunc=ds_trunc,
    )


def run_icp(map_state, prep: dict, config: SageConfig) -> reg.IcpResult:
    """The ICP solve on prepared inputs (reference sageICP.cpp:80-85 ->
    core/Registration.cpp:113-141): max_corr_dist = 3*sigma, robust
    kernel = sigma/3. fast_ok is recomputed from config (static) so a
    `prep` dict that crossed a jit boundary (timed mode) still works."""
    from sage_icp_tpu.ops.correspondence_fast import fast_path_supported

    fast_ok = config.use_fast_correspondences and fast_path_supported(
        config.voxel_size_map, config.local_map_range, config.max_range
    )
    fast_params = (
        dict(
            unique_voxel_rows=config.corr_unique_voxel_rows,
            queries_per_voxel=config.corr_queries_per_voxel,
            overflow_rows=config.corr_overflow_rows,
        )
        if fast_ok
        else None
    )
    sigma = prep["sigma"]
    return reg.register_frame(
        map_state,
        prep["source"],
        prep["source_valid"],
        prep["initial_guess"],
        config.voxel_size_map,
        3.0 * sigma,
        sigma / 3.0,
        config.sem_th,
        max_iterations=config.max_icp_iterations,
        probe_depth=config.probe_depth,
        fast_params=fast_params,
        tables=prep["tables"],
    )


def odometry_step(
    state: OdomState,
    points: jax.Array,
    valid: jax.Array,
    timestamps: jax.Array,
    config: SageConfig,
    mesh=None,
) -> tuple[OdomState, jax.Array, StepAux]:
    """One full odometry step (reference pipeline/sageICP.cpp:36-95).

    points: (scan_capacity, 4) sensor-frame xyz+label; valid: mask;
    timestamps: (scan_capacity,) in [0,1] (used iff config.deskew).
    Returns (new_state, pose (4,4), aux).

    mesh: optional jax.sharding.Mesh with a "points" axis — enables the
    row-sharded insert-policy phase (ops/hashmap.insert multi-chip note);
    everything else is partitioned by GSPMD from the in_shardings
    (parallel/sharding.make_sharded_step).
    """
    prep = prepare_icp_inputs(state, points, valid, timestamps, config)
    (source, source_valid) = prep["source"], prep["source_valid"]
    (frame_ds, frame_valid) = prep["frame_ds"], prep["frame_valid"]
    sigma, thr = prep["sigma"], prep["thr"]
    initial_guess, shared_tables = prep["initial_guess"], prep["tables"]
    dyn_overflow, ds_trunc = prep["dyn_overflow"], prep["ds_trunc"]

    icp = run_icp(state.map, prep, config)
    # Solve-health guard (VERDICT r3 #3). Two failure signatures:
    #   * non-finite pose — Gauss-Newton on singular geometry or a
    #     teleported input can overflow se3_exp (reference leaves this
    #     undefined);
    #   * correspondence collapse — a FINITE solve that matched almost
    #     nothing (garbage scan, out-of-basin guess) is a fit to noise;
    #     accepting it corrupts the carried pose and, worse, inserts a
    #     misregistered frame into the map, which is how one bad frame
    #     snowballed into NaN by frame 30 on the round-3 bench workload.
    # On either: coast on the motion-model guess AND skip this frame's map
    # insert, so a single bad frame costs one frame, not the sequence.
    # initial_guess is always finite (poses stay finite by induction and
    # the teleport clamp above bounds the prediction), so the fallback
    # cannot latch. Both signatures ride overflow_total().
    num_source = jnp.sum(source_valid.astype(jnp.int32))
    # pose_ok also demands an orthonormal rotation: a garbage solve can
    # compose so many large increments that f32 rounding denormalizes R
    # (observed ~20x scale after a lost 29-iteration solve); accepting it
    # makes the next prediction amplify instead of translate, which is
    # how the round-4 fresh-world replay teleported 236 m in one frame.
    R = icp.pose[:3, :3]
    ortho = jnp.sum(jnp.square(jnp.matmul(R.T, R) - jnp.eye(3, dtype=R.dtype)))
    pose_ok = jnp.all(jnp.isfinite(icp.pose)) & (ortho < 1e-3)
    corr_floor = num_source // 20  # 5% of valid sources
    corr_ok = icp.num_correspondences >= corr_floor
    # frame 0 legitimately has zero correspondences (empty map)
    healthy = pose_ok & ((state.num_poses == 0) | corr_ok)
    # Escape hatch (ADVICE r4): rejection must not latch. After
    # reject_streak_limit consecutive rejections, accept the next FINITE
    # solve even below the correspondence floor — a sustained low-overlap
    # stretch (occlusion, re-entering a culled area) then re-seeds the
    # map instead of coasting forever; the reference always accepts
    # (sageICP.cpp:90-93), so this is still strictly more protective.
    forced = (
        pose_ok
        & ~healthy
        & (state.reject_streak >= config.reject_streak_limit)
    )
    healthy = healthy | forced
    new_pose = jnp.where(healthy, icp.pose, initial_guess)
    # Sophus parity (geo.renormalize docstring): the carried pose must be
    # re-projected onto SE(3) every frame, or f32 scale drift compounds
    # exponentially through the prediction recursion
    new_pose = geo.renormalize(new_pose)

    # --- threshold deviation + map update ---------------------------------------
    model_deviation = jnp.matmul(
        geo.se3_inverse(initial_guess), new_pose, precision="highest"
    )
    thr = ThresholdState(model_deviation, thr.sse, thr.num_samples)

    world_frame = geo.transform_points(new_pose, frame_ds)
    # an unhealthy frame's points are NOT inserted (mask them out): the
    # pose is a guess, and a misregistered insert poisons every future
    # frame's correspondences
    new_map, ins_stats = hm.insert(
        state.map,
        world_frame,
        frame_valid & healthy,
        config.voxel_size_map,
        config.basic_points_per_voxel,
        _basic_label_mask(config),
        max_incoming_per_voxel=config.max_incoming_per_voxel,
        probe_depth=config.probe_depth,
        unique_voxel_capacity=min(
            config.insert_unique_capacity, config.frame_capacity
        ),
        tables=shared_tables,
        basic_labels=config.basic_parts_labels,
        with_stats=True,
        mesh=mesh,
    )
    new_map = hm.remove_far(new_map, new_pose[:3, 3], config.local_map_range)

    new_state = OdomState(
        map=new_map,
        last_pose=new_pose,
        prev_pose=jnp.where(state.num_poses > 0, state.last_pose, new_pose),
        first_pose=jnp.where(state.num_poses == 0, new_pose, state.first_pose),
        num_poses=state.num_poses + 1,
        threshold=thr,
        reject_streak=jnp.where(healthy, 0, state.reject_streak + 1),
    )
    aux = StepAux(
        sigma=sigma,
        icp_iterations=icp.iterations,
        num_correspondences=icp.num_correspondences,
        num_source=num_source,
        num_frame_ds=jnp.sum(frame_valid.astype(jnp.int32)),
        corr_dropped=icp.dropped_queries,
        ds_truncated=ds_trunc,
        insert_unique_overflow=ins_stats.unique_overflow,
        insert_claim_failures=ins_stats.claim_failures,
        insert_incoming_truncated=ins_stats.incoming_truncated,
        dynfilter_overflow=dyn_overflow,
        nonfinite_pose=(~pose_ok).astype(jnp.int32),
        icp_rejected=(pose_ok & ~healthy).astype(jnp.int32),
        icp_forced=forced.astype(jnp.int32),
    )
    return new_state, new_pose, aux


def _basic_label_mask(config: SageConfig, num_labels: int = 260):
    m = np.zeros((num_labels,), dtype=bool)
    for lab in config.basic_parts_labels:
        m[lab] = True
    return jnp.asarray(m)


def make_step(config: SageConfig, jit: bool = True, donate: bool = True):
    """Build the compiled step: (state, points, valid, timestamps) ->
    (state', pose, aux). State buffers are donated (the map is updated
    in place on device — no HBM copy per frame)."""
    fn = partial(odometry_step, config=config)
    if not jit:
        return fn
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


# int16 upload quantization: xyz lanes in units of 2^-8 m; the invalid-row
# sentinel is 32767 in lane 0 (no real coordinate reaches +127.996 m after
# the range crop). Timestamps scale by 2^15 - 1.
QSCAN_SCALE = 1.0 / 256.0
QSCAN_INVALID = 32767
QTS_SCALE = 32767.0


def _split_packed(pts):
    """(cap, 4|5) packed buffer -> (points (cap,4), valid, timestamps).
    Lane 4, when present, carries per-point timestamps (deskew mode); the
    validity mask is derived from the pad sentinel either way. int16
    buffers are the quantized-upload format (see quantized_scan_upload)."""
    if pts.dtype == jnp.int16:
        valid = pts[:, 0] != QSCAN_INVALID
        xyz = pts[:, :3].astype(jnp.float32) * QSCAN_SCALE
        lab = pts[:, 3].astype(jnp.float32)
        out = jnp.where(
            valid[:, None],
            jnp.concatenate([xyz, lab[:, None]], axis=-1),
            jnp.float32(scan_ops.INVALID_COORD),
        )
        if pts.shape[1] == 5:
            ts = jnp.where(
                valid, pts[:, 4].astype(jnp.float32) / QTS_SCALE, 0.0
            )
        else:
            ts = jnp.zeros((pts.shape[0],), jnp.float32)
        return out, valid, ts
    valid = pts[:, 0] < 1.0e6  # INVALID_COORD sentinel
    if pts.shape[1] == 5:
        return pts[:, :4], valid, jnp.where(valid, pts[:, 4], 0.0)
    return pts, valid, jnp.zeros((pts.shape[0],), pts.dtype)


def _quantize_scan_host(rows: np.ndarray, out: np.ndarray) -> None:
    """Host-side int16 packing of (n, 4|5) float rows into `out[:n]`."""
    n = len(rows)
    out[:n, :3] = np.clip(
        np.round(rows[:, :3] / QSCAN_SCALE), -32700, 32700
    ).astype(np.int16)
    out[:n, 3] = rows[:, 3].astype(np.int16)
    if out.shape[1] == 5 and rows.shape[1] >= 5:
        out[:n, 4] = np.clip(
            np.round(rows[:, 4] * QTS_SCALE), 0, 32767
        ).astype(np.int16)


def make_step_packed(config: SageConfig, donate: bool = True):
    """Single-upload step: (state, points) -> (state', pose, aux).

    The validity mask is derived on device from the pad sentinel
    (pad_scan fills INVALID_COORD rows), so the host uploads ONE array
    per frame instead of three — the remote-tunnel round trip per upload
    (~15-45 ms) dominates the per-frame cost otherwise. With deskew on,
    the packed buffer carries a 5th timestamp lane (still one upload)."""

    def fn(state, points):
        pts, valid, ts = _split_packed(points)
        return odometry_step(state, pts, valid, ts, config=config)

    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def make_chunk_step(config: SageConfig, chunk: int):
    """Offline-throughput step: (state, scans (W, cap, 4|5)) ->
    (state', poses (W, 4, 4), (iterations (W,), aux)). One upload
    and one dispatch drive W sequential frames via lax.scan — the
    per-frame remote-dispatch overhead (~10-30 ms through the tunnel) is
    amortized W-fold. Frame semantics are identical to W single steps
    (the scan carries the state). Deskew rides the packed 5th lane.
    Per-frame ICP iteration counts are returned for the whole chunk so
    time.txt can carry a real per-frame ICP estimate. The returned aux
    AGGREGATES across the chunk: overflow counters are SUMMED over the W
    frames (a transient mid-chunk overflow must trip the bench honesty
    guard, VERDICT r3 weak #5), occupancy stats (num_source/num_frame_ds)
    take the chunk MAX (they feed capacity-headroom asserts), and
    sigma/iterations/num_correspondences report the last frame."""

    def fn(state, scans):
        def body(st, pts):
            p, valid, ts = _split_packed(pts)
            st2, pose, aux = odometry_step(st, p, valid, ts, config=config)
            return st2, (pose, aux)

        state, (poses, auxs) = jax.lax.scan(body, state, scans)
        agg = StepAux(
            sigma=auxs.sigma[-1],
            icp_iterations=auxs.icp_iterations[-1],
            num_correspondences=auxs.num_correspondences[-1],
            num_source=jnp.max(auxs.num_source),
            num_frame_ds=jnp.max(auxs.num_frame_ds),
            corr_dropped=jnp.sum(auxs.corr_dropped),
            ds_truncated=jnp.sum(auxs.ds_truncated),
            insert_unique_overflow=jnp.sum(auxs.insert_unique_overflow),
            insert_claim_failures=jnp.sum(auxs.insert_claim_failures),
            insert_incoming_truncated=jnp.sum(
                auxs.insert_incoming_truncated
            ),
            dynfilter_overflow=jnp.sum(auxs.dynfilter_overflow),
            nonfinite_pose=jnp.sum(auxs.nonfinite_pose),
            icp_rejected=jnp.sum(auxs.icp_rejected),
            icp_forced=jnp.sum(auxs.icp_forced),
        )
        return state, poses, (auxs.icp_iterations, agg)

    return jax.jit(fn, donate_argnums=(0,))


class SageICP:
    """Stateful convenience wrapper — the host-side equivalent of the
    reference's pipeline object (pipeline/sageICP.hpp:67-109). Handles
    padding to fixed capacities and keeps the trajectory log."""

    def __init__(self, config: SageConfig | str = "kitti"):
        if isinstance(config, str):
            config = PRESETS[config]
        self.config = config
        # one-upload step: the remote-tunnel RPC per host->device transfer
        # dominates per-frame latency otherwise. Deskew rides a packed
        # 5th timestamp lane, so the packed path covers every config.
        self._packed = True
        self._step = make_step_packed(
            config,
            donate=os.environ.get("SAGE_DONATE", "1") == "1",
        )
        self.state = init_state(config)
        self.poses: list = []  # np or device arrays (see block=)
        self.timings: list[float] = []
        self.icp_iters: list = []  # per-frame ICP iteration counts
        #   (device arrays in chunked mode; fetched with the trajectory)
        self._aux_log: list = []  # per-call device StepAux (no sync)

    def register_frame(
        self,
        points: np.ndarray,
        timestamps: np.ndarray | None = None,
        block: bool = True,
    ) -> np.ndarray:
        """points: (n, 4) float array (xyz + label); returns the 4x4 pose.

        block=False returns the pose as a device array without waiting —
        successive frames pipeline on device and only the final
        trajectory() fetch synchronizes (the offline-throughput mode; the
        reference's per-message loop is inherently synchronous)."""
        import time

        cfg = self.config
        cap = cfg.scan_capacity
        n = min(len(points), cap)
        lanes = 5 if cfg.deskew else 4
        quant = cfg.quantized_scan_upload and self._packed
        if lanes == 4 and not quant:
            try:
                from sage_icp_tpu import _native

                buf, val = _native.pad_scan(
                    np.ascontiguousarray(points, dtype=np.float32), cap
                )
            except ImportError:
                buf = np.full(
                    (cap, 4), scan_ops.INVALID_COORD, dtype=np.float32
                )
                buf[:n] = points[:n]
        else:
            rows = np.asarray(points[:n, :4], dtype=np.float32)
            if lanes == 5:
                if timestamps is not None:
                    ts_rows = np.asarray(timestamps[:n], np.float32)
                else:
                    # spinning-LiDAR sweep phase from azimuth (the standard
                    # fallback when the sensor provides no time field)
                    from sage_icp_tpu.datasets.kitti import azimuth_timestamps

                    ts_rows = azimuth_timestamps(rows[:, :3]).astype(
                        np.float32
                    )
                rows = np.concatenate([rows, ts_rows[:, None]], axis=1)
            if quant:
                buf = np.full((cap, lanes), QSCAN_INVALID, dtype=np.int16)
                _quantize_scan_host(rows, buf)
            else:
                buf = np.full(
                    (cap, lanes), scan_ops.INVALID_COORD, dtype=np.float32
                )
                buf[:n] = rows
        t0 = time.perf_counter()
        if self._packed:
            self.state, pose, aux = self._step(self.state, jnp.asarray(buf))
        else:
            # unpacked (state, points, valid, ts) signature — the sharded
            # step (parallel.sharding) declares per-argument shardings
            val = np.zeros((cap,), dtype=bool)
            val[:n] = True
            ts = np.zeros((cap,), dtype=np.float32)
            if lanes == 5:
                ts = buf[:, 4].copy()
            self.state, pose, aux = self._step(
                self.state, jnp.asarray(buf[:, :4]), jnp.asarray(val),
                jnp.asarray(ts),
            )
        self._last_aux_dev = aux
        self._aux_log.append(aux)
        self.icp_iters.append(aux.icp_iterations)
        if block:
            pose = np.asarray(pose)
        self.timings.append(time.perf_counter() - t0)
        self.poses.append(pose)
        return pose

    @property
    def last_aux(self):
        return jax.tree.map(np.asarray, self._last_aux_dev)

    def aux_totals(self) -> StepAux:
        """Counters AGGREGATED over every frame registered so far (one
        fetch): overflow counters are summed, occupancy stats take the
        max, sigma/iterations/num_correspondences report the last frame —
        the same aggregation the chunked step applies across its window.
        A transient overflow mid-sequence is invisible in last_aux (e.g.
        the solve-health guard masks a starved insert once the solve is
        rejected — the undersized frames still show up here)."""
        if not self._aux_log:
            return self.last_aux
        logs = [jax.tree.map(np.asarray, a) for a in self._aux_log]
        last = logs[-1]
        return StepAux(
            sigma=last.sigma,
            icp_iterations=last.icp_iterations,
            num_correspondences=last.num_correspondences,
            num_source=np.max([a.num_source for a in logs]),
            num_frame_ds=np.max([a.num_frame_ds for a in logs]),
            corr_dropped=np.sum([a.corr_dropped for a in logs]),
            ds_truncated=np.sum([a.ds_truncated for a in logs]),
            insert_unique_overflow=np.sum(
                [a.insert_unique_overflow for a in logs]
            ),
            insert_claim_failures=np.sum(
                [a.insert_claim_failures for a in logs]
            ),
            insert_incoming_truncated=np.sum(
                [a.insert_incoming_truncated for a in logs]
            ),
            dynfilter_overflow=np.sum([a.dynfilter_overflow for a in logs]),
            nonfinite_pose=np.sum([a.nonfinite_pose for a in logs]),
            icp_rejected=np.sum([a.icp_rejected for a in logs]),
            icp_forced=np.sum([a.icp_forced for a in logs]),
        )

    def trajectory(self) -> np.ndarray:
        """(N, 4, 4) trajectory; synchronizes any in-flight frames.

        Entries are (4, 4) poses or (W, 4, 4) chunk arrays (register_chunk
        appends whole chunks). Device-held entries are concatenated ON
        DEVICE and fetched in ONE transfer: fetching them one by one costs
        a full remote round trip (~27 ms) per frame through a tunneled
        TPU."""
        if not self.poses:
            return np.zeros((0, 4, 4))
        dev = [
            p.reshape(-1, 4, 4) for p in self.poses if isinstance(p, jax.Array)
        ]
        fetched = iter(np.asarray(jnp.concatenate(dev))) if dev else None
        out = []
        for p in self.poses:
            if isinstance(p, jax.Array):
                for _ in range(1 if p.ndim == 2 else p.shape[0]):
                    out.append(next(fetched))
            else:
                out.append(np.asarray(p).reshape(4, 4))
        return np.stack(out)

    def pad_chunk(
        self, scans: list[np.ndarray], timestamps: list | None = None
    ) -> np.ndarray:
        """(W, scan_capacity, 4|5) padded host buffer for register_chunk.
        With deskew on, lane 4 carries per-point timestamps (explicit or
        the azimuth-phase fallback)."""
        cap = self.config.scan_capacity
        W = len(scans)
        lanes = 5 if self.config.deskew else 4
        quant = self.config.quantized_scan_upload
        if lanes == 4 and not quant:
            buf = np.full(
                (W, cap, 4), scan_ops.INVALID_COORD, dtype=np.float32
            )
            try:
                from sage_icp_tpu import _native

                for i, s in enumerate(scans):
                    buf[i], _ = _native.pad_scan(
                        np.ascontiguousarray(s, dtype=np.float32), cap
                    )
                return buf
            except ImportError:
                pass
            for i, s in enumerate(scans):
                n = min(len(s), cap)
                buf[i, :n] = s[:n, :4]
            return buf
        buf = (
            np.full((W, cap, lanes), QSCAN_INVALID, dtype=np.int16)
            if quant
            else np.full(
                (W, cap, lanes), scan_ops.INVALID_COORD, dtype=np.float32
            )
        )
        for i, s in enumerate(scans):
            n = min(len(s), cap)
            rows = np.asarray(s[:n, :4], dtype=np.float32)
            if lanes == 5:
                if timestamps is not None and timestamps[i] is not None:
                    ts_rows = np.asarray(timestamps[i][:n], np.float32)
                else:
                    from sage_icp_tpu.datasets.kitti import azimuth_timestamps

                    ts_rows = azimuth_timestamps(rows[:, :3]).astype(
                        np.float32
                    )
                rows = np.concatenate([rows, ts_rows[:, None]], axis=1)
            if quant:
                _quantize_scan_host(rows, buf[i])
            else:
                buf[i, :n] = rows
        return buf

    def register_chunk(self, scans, timestamps=None) -> jax.Array:
        """Offline mode: register a chunk of frames with ONE device
        dispatch (lax.scan over the chunk). Appends device poses to the
        trajectory log and returns them (W, 4, 4) without blocking.

        scans: a list of (n, 4) arrays, a padded (W, cap, 4|5) host buffer
        from pad_chunk, or a pre-staged device array (jax.device_put of a
        padded buffer) — pre-staging lets the host overlap the next
        chunk's upload with the current chunk's compute."""
        if isinstance(scans, list):
            scans = self.pad_chunk(scans, timestamps)
        dev = jnp.asarray(scans)  # no-op for already-staged device arrays
        W = dev.shape[0]
        if not hasattr(self, "_chunk_steps"):
            self._chunk_steps = {}
        if W not in self._chunk_steps:
            self._chunk_steps[W] = make_chunk_step(self.config, W)
        self.state, poses, (iters, aux) = self._chunk_steps[W](
            self.state, dev
        )
        self._last_aux_dev = aux
        self._aux_log.append(aux)
        # keep the whole (W, 4, 4) device array: per-frame slicing would
        # dispatch W ops, and trajectory() flattens chunks on device anyway
        self.poses.append(poses)
        self.icp_iters.append(iters)
        return poses

    def iteration_counts(self) -> np.ndarray:
        """(N,) per-frame ICP iteration counts; synchronizes like
        trajectory() (chunked entries fetch in one transfer)."""
        if not self.icp_iters:
            return np.zeros((0,), np.int32)
        flat = [jnp.asarray(x).reshape(-1) for x in self.icp_iters]
        return np.asarray(jnp.concatenate(flat))

    def local_map(self) -> np.ndarray:
        pts, mask = hm.pointcloud(self.state.map, self.config.voxel_size_map)
        return np.asarray(pts)[np.asarray(mask)]

    def reinitialize(self):
        """reference pipeline/sageICP.hpp:94-99."""
        self.state = init_state(self.config)
        self.poses = []
        self.timings = []
        self.icp_iters = []
        self._aux_log = []

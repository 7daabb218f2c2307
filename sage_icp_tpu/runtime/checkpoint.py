"""Odometry state checkpoint/resume.

The reference has no persistence at all (SURVEY.md section 5: state lives
in RAM, only trajectory text dumps at SIGINT). For a production framework,
long sequences / fault recovery need the full odometry state — pose
history head, adaptive-threshold accumulators, and the entire voxel map —
to round-trip. The state is a flat pytree of arrays, so a .npz captures it
exactly; the trajectory log is saved alongside.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from sage_icp_tpu.models.pipeline import OdomState, SageICP, ThresholdState
from sage_icp_tpu.ops import hashmap
from sage_icp_tpu.ops.hashmap import MapState


def save_state(path: str, odom: SageICP) -> None:
    s = odom.state
    np.savez_compressed(
        path,
        map_keys=np.asarray(s.map.keys),
        map_counts=np.asarray(s.map.counts),
        map_points=np.asarray(s.map.points),
        map_first=np.asarray(s.map.first_pts),
        **(
            dict(map_grid=np.asarray(s.map.grid))
            if s.map.grid is not None
            else {}
        ),
        last_pose=np.asarray(s.last_pose),
        prev_pose=np.asarray(s.prev_pose),
        first_pose=np.asarray(s.first_pose),
        num_poses=np.asarray(s.num_poses),
        reject_streak=np.asarray(s.reject_streak),
        thr_deviation=np.asarray(s.threshold.model_deviation),
        thr_sse=np.asarray(s.threshold.sse),
        thr_n=np.asarray(s.threshold.num_samples),
        trajectory=odom.trajectory(),
        # layout parameters the arrays are only valid under: entries are
        # placed by probe distance, so loading under a different
        # probe_depth makes deep entries unfindable; the grid toggle must
        # come from the config, not from file contents
        probe_depth=np.asarray(odom.config.probe_depth),
        dense_grid=np.asarray(odom.config.dense_grid),
        hash_layout=np.asarray(hashmap.HASH_LAYOUT_VERSION),
    )


def load_state(path: str, odom: SageICP) -> SageICP:
    """Restore a checkpoint into an odometry object built with the SAME
    config (capacities must match)."""
    z = np.load(path)
    assert z["map_counts"].shape[0] == odom.config.map_capacity, (
        "checkpoint capacity mismatch"
    )
    assert z["map_points"].dtype == np.int16, (
        "pre-quantization (f32 block storage) checkpoints are not loadable"
    )
    # slot positions depend on the hash function itself, not just the
    # probe depth — a checkpoint written under an older hash loads with
    # every entry silently unfindable, so refuse version mismatches
    got_layout = int(z["hash_layout"]) if "hash_layout" in z else 1
    assert got_layout == hashmap.HASH_LAYOUT_VERSION, (
        f"checkpoint hash layout v{got_layout} != runtime "
        f"v{hashmap.HASH_LAYOUT_VERSION}: map slots were placed by a "
        "different hash function and would be unfindable; re-build the "
        "map from scans instead of loading this checkpoint"
    )
    if "probe_depth" in z:
        assert int(z["probe_depth"]) == odom.config.probe_depth, (
            f"checkpoint probe_depth {int(z['probe_depth'])} != config "
            f"{odom.config.probe_depth}: entries placed at deeper probe "
            "offsets would be unfindable"
        )
        assert bool(z["dense_grid"]) == odom.config.dense_grid, (
            "checkpoint dense_grid flag does not match the loading config"
        )
    else:  # pre-metadata checkpoints: refuse rather than silently corrupt
        raise AssertionError(
            "checkpoint lacks probe_depth/dense_grid metadata; re-save it"
        )
    odom.state = OdomState(
        map=MapState(
            keys=jnp.asarray(z["map_keys"]),
            counts=jnp.asarray(z["map_counts"]),
            points=jnp.asarray(z["map_points"]),
            first_pts=jnp.asarray(z["map_first"]),
            grid=jnp.asarray(z["map_grid"]) if "map_grid" in z else None,
        ),
        last_pose=jnp.asarray(z["last_pose"]),
        prev_pose=jnp.asarray(z["prev_pose"]),
        first_pose=jnp.asarray(z["first_pose"]),
        num_poses=jnp.asarray(z["num_poses"]),
        threshold=ThresholdState(
            model_deviation=jnp.asarray(z["thr_deviation"]),
            sse=jnp.asarray(z["thr_sse"]),
            num_samples=jnp.asarray(z["thr_n"]),
        ),
        # pre-round-5 checkpoints lack the guard streak; 0 = no history
        reject_streak=jnp.asarray(
            z["reject_streak"] if "reject_streak" in z else 0, jnp.int32
        ),
    )
    odom.poses = [p for p in z["trajectory"]]
    return odom

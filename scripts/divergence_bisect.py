"""Bisect the frame-16+ divergence: run 40 per-frame steps with one
component disabled at a time. REPRO_MODE env:
  base       — as the bench runs it (quantized upload, all kernels on)
  noquant    — f32 scan upload
  nopolicy   — XLA while_loop retention policy instead of the Pallas kernel
  nopallas   — XLA einsum NN path instead of the fused Pallas kernels
  cpu        — force the CPU backend (interpret Pallas), otherwise base
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import dataclasses

MODE = os.environ.get("REPRO_MODE", "base")
if os.environ.get("REPRO_F64", "0") == "1":
    os.environ["JAX_ENABLE_X64"] = "1"
import jax

if MODE == "cpu" or os.environ.get("REPRO_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
if os.environ.get("REPRO_F64", "0") == "1":
    jax.config.update("jax_enable_x64", True)

import numpy as np

from sage_icp_tpu.models import pipeline as pl
from sage_icp_tpu.ops import hashmap as hm
from sage_icp_tpu.utils import synthetic

if MODE == "r1hash":  # round-1 low-bits hash instead of Fibonacci mixing
    import jax.numpy as jnp

    def _r1_hash(keys, capacity):
        k = keys.astype(jnp.uint32)
        h = (
            k[..., 0] * jnp.uint32(73856093)
            ^ k[..., 1] * jnp.uint32(19349663)
            ^ k[..., 2] * jnp.uint32(83492791)
        )
        return (h & jnp.uint32(capacity - 1)).astype(jnp.int32)

    hm.hash_keys = _r1_hash
if MODE == "r1cull":  # round-1 remove_far (counts only, keys stay)
    import jax.numpy as jnp

    def _r1_remove_far(state, origin, max_distance):
        first = state.first_pts
        d2 = jnp.sum((first - origin[None, :]) ** 2, axis=-1)
        live = state.counts > 0
        kill = live & (d2 > max_distance * max_distance)
        return state._replace(counts=jnp.where(kill, 0, state.counts))

    hm.remove_far = _r1_remove_far
    pl.hm.remove_far = _r1_remove_far
if MODE == "nopolicy" or os.environ.get("REPRO_F64", "0") == "1":
    _orig_insert = hm.insert

    def _patched(*a, **k):
        k["policy_kernel"] = False
        return _orig_insert(*a, **k)

    hm.insert = _patched
    pl.hm.insert = _patched
if MODE == "nopallas" or os.environ.get("REPRO_F64", "0") == "1":
    from sage_icp_tpu.ops import correspondence_fast as cf

    cf._pallas_mode = lambda: "off"

n_frames = 40
cfg = dataclasses.replace(
    pl.PRESETS["synthetic"],
    quantized_scan_upload=(MODE not in ("noquant", "r1cfg")),
)
if os.environ.get("REPRO_F64", "0") == "1":
    # surgical f64: ONLY the normal equations + 6x6 solve run in double
    # (the reference is double throughout); everything else stays f32.
    # Tests whether the mm-level systematic bias is numerical.
    import jax.numpy as jnp

    from sage_icp_tpu.ops import registration as reg

    _orig_bne = reg.build_normal_equations
    _orig_solve = reg.solve_increment

    def _bne64(src, tgt, weight_mask, kernel):
        return _orig_bne(
            src.astype(jnp.float64), tgt.astype(jnp.float64), weight_mask,
            jnp.asarray(kernel, jnp.float64),
        )

    def _solve64(JTJ, JTr):
        return _orig_solve(
            JTJ.astype(jnp.float64), JTr.astype(jnp.float64)
        ).astype(jnp.float32)

    reg.build_normal_equations = _bne64
    reg.solve_increment = _solve64
if MODE == "r1cfg":  # round-1 capacities/probe parameters (code unchanged)
    cfg = dataclasses.replace(
        cfg, probe_depth=8, max_incoming_per_voxel=24,
        map_capacity=32_768, insert_unique_capacity=8_192,
    )
if MODE == "nofast":  # reference-shaped path: re-search every iteration
    cfg = dataclasses.replace(cfg, use_fast_correspondences=False)
render_range = float(os.environ.get("REPRO_RANGE", "100"))
if os.environ.get("REPRO_WORLD", "corridor") == "city":
    cfg = dataclasses.replace(
        pl.PRESETS["kitti"],
        quantized_scan_upload=cfg.quantized_scan_upload,
    )
    world_pts, world_labs = synthetic.build_city_world(
        seed=0, size=420.0,
        density=float(os.environ.get("REPRO_DENSITY", "2.0")),
    )
else:
    world_pts, world_labs = synthetic.build_world(
        seed=0, length=260.0,
        density=float(os.environ.get("REPRO_DENSITY", "2.0")),
    )
gt = synthetic.make_trajectory(n_frames, step=1.0)
if os.environ.get("REPRO_JITTER", "0") == "1":
    # realistic per-frame motion jitter (vehicle vibration / road texture):
    # keeps the constant-velocity model honestly imperfect, so the
    # adaptive threshold sees real deviations like on a real car
    jrng = np.random.default_rng(7)
    for i in range(n_frames):
        ang = jrng.normal(0, 0.002, 3)  # rad, roll/pitch/yaw
        cr, sr = np.cos(ang), np.sin(ang)
        Rx = np.array([[1, 0, 0], [0, cr[0], -sr[0]], [0, sr[0], cr[0]]])
        Ry = np.array([[cr[1], 0, sr[1]], [0, 1, 0], [-sr[1], 0, cr[1]]])
        Rz = np.array([[cr[2], -sr[2], 0], [sr[2], cr[2], 0], [0, 0, 1]])
        gt[i][:3, :3] = gt[i][:3, :3] @ (Rz @ Ry @ Rx)
        gt[i][:3, 3] += jrng.normal(0, [0.01, 0.01, 0.015])
rng = np.random.default_rng(0)


def render_random(pose):
    """Like render_scan but with per-frame RANDOM thinning (real spinning
    LiDAR resamples surfaces fresh every sweep — no persistent twins)."""
    Rinv = pose[:3, :3].T
    tinv = -Rinv @ pose[:3, 3]
    local = world_pts @ Rinv.T + tinv
    r = np.linalg.norm(local, axis=1)
    sel = (r < render_range) & (r > 1.0)
    local, labs, r = local[sel], world_labs[sel], r[sel]
    p = np.minimum(1.0, (12.0 / np.maximum(r, 1e-3)) ** 1.2)
    keep = rng.random(len(local)) < p
    local, labs = local[keep], labs[keep]
    local = local + rng.normal(0, 0.01, local.shape)
    return np.concatenate(
        [local.astype(np.float32), labs[:, None].astype(np.float32)], axis=1
    )


if os.environ.get("REPRO_RANDOM", "0") == "1":
    scans = [render_random(gt[i]) for i in range(n_frames)]
else:
    scans = [synthetic.render_scan(world_pts, world_labs, gt[i], rng,
                                   n_target=120000, max_range=render_range)
             for i in range(n_frames)]

odom = pl.SageICP(cfg)
auxes = []
for i in range(n_frames):
    odom.register_frame(scans[i])
    auxes.append(odom.last_aux)
tr = odom.trajectory()
it = odom.iteration_counts()
err = np.linalg.norm(tr[:, :3, 3] - gt[:, :3, 3], axis=1)
for i in range(n_frames):
    a = auxes[i]
    print(f"[{MODE}] frame{i}: t={np.round(tr[i][:3, 3], 3)} "
          f"err={err[i]:.3f} iters={it[i]} sigma={float(a.sigma):.3f} "
          f"ncorr={int(a.num_correspondences)} nsrc={int(a.num_source)} "
          f"drop={int(a.corr_dropped)} claimf={int(a.insert_claim_failures)} "
          f"uqovf={int(a.insert_unique_overflow)} "
          f"inctr={int(a.insert_incoming_truncated)}",
          flush=True)
print(f"[{MODE}] max_err={np.nanmax(err):.3f} "
      f"final_finite={bool(np.isfinite(tr[-1]).all())}")

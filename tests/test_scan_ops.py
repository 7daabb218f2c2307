"""Tests for preprocess / deskew / class-adaptive voxel downsample against
straightforward numpy oracles that mirror the reference semantics
(reference: cpp/sage_icp/core/Preprocessing.cpp, Deskew.cpp)."""

import numpy as np
import jax.numpy as jnp

from sage_icp_tpu.ops import scan as scan_ops
from sage_icp_tpu.ops import geometry as geo

VOXEL_LABELS = [
    [40, 44, 48, 49],
    [50, 51, 52],
    [70, 72],
    [60, 71, 80, 81, 99],
    [0],
    [10, 11, 13, 15, 16, 18, 20],
]
VOXEL_SIZE = [0.6, 1.0, 0.9, 0.8, 1.0, 0.6]


def np_preprocess(points, max_range, min_range, label_max_range):
    """Oracle: reference Preprocessing.cpp:173-181 (no dynamic filter)."""
    out = []
    for p in points:
        norm = np.linalg.norm(p[:3])
        if min_range < norm < max_range:
            q = p.copy()
            if norm > label_max_range:
                q[3] = 0.0
            out.append(q)
    return np.array(out).reshape(-1, 4)


def np_voxel_downsample(points, voxel_labels, voxel_size, vox_scale):
    """Oracle: reference Preprocessing.cpp:44-84 (first point per
    (group, voxel) in scan order; unmapped labels dropped; truncation)."""
    label2group = {}
    for g, labs in enumerate(voxel_labels):
        for lab in labs:
            label2group[lab] = g
    seen = set()
    kept = []
    for p in points:
        g = label2group.get(int(p[3]), -1)
        if g < 0:
            continue
        s = voxel_size[g] * vox_scale
        v = tuple(np.trunc(p[:3] / s).astype(int))
        key = (g,) + v
        if key in seen:
            continue
        seen.add(key)
        kept.append(p)
    return np.array(kept).reshape(-1, 4)


def make_scan(rng, n=500):
    xyz = rng.normal(size=(n, 3)) * 30.0
    all_labels = [lab for group in VOXEL_LABELS for lab in group] + [30, 31, 254]
    labels = rng.choice(all_labels, size=n).astype(np.float64)
    return np.concatenate([xyz, labels[:, None]], axis=1)


def test_preprocess_matches_oracle(rng):
    pts = make_scan(rng)
    got_pts, got_valid = scan_ops.preprocess(
        jnp.asarray(pts, dtype=jnp.float32),
        jnp.ones((len(pts),), dtype=bool),
        max_range=100.0,
        min_range=5.0,
        label_max_range=50.0,
    )
    got = np.asarray(got_pts)[np.asarray(got_valid)]
    ref = np_preprocess(pts, 100.0, 5.0, 50.0)
    assert got.shape == ref.shape
    # preprocess preserves order of surviving points
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_preprocess_respects_incoming_mask(rng):
    pts = make_scan(rng, n=64)
    valid_in = np.zeros(64, dtype=bool)
    valid_in[:10] = True
    _, got_valid = scan_ops.preprocess(
        jnp.asarray(pts, dtype=jnp.float32),
        jnp.asarray(valid_in),
        100.0,
        5.0,
        50.0,
    )
    assert not np.asarray(got_valid)[10:].any()


def test_voxel_downsample_matches_oracle(rng):
    pts = make_scan(rng, n=800)
    ref = np_voxel_downsample(pts, VOXEL_LABELS, VOXEL_SIZE, 0.5)
    lut = scan_ops.make_label_group_lut(VOXEL_LABELS)
    got_pts, got_valid = scan_ops.voxel_downsample(
        jnp.asarray(pts, dtype=jnp.float32),
        jnp.ones((len(pts),), dtype=bool),
        lut,
        jnp.asarray(VOXEL_SIZE, dtype=jnp.float32),
        0.5,
        out_capacity=1024,
    )
    got = np.asarray(got_pts)[np.asarray(got_valid)]
    # Same point set (order may differ: reference hash-map iteration order
    # is arbitrary; we produce key-sorted order).
    got_sorted = got[np.lexsort(got.T)]
    ref_sorted = ref[np.lexsort(ref.T)]
    np.testing.assert_allclose(got_sorted, ref_sorted.astype(np.float32), atol=1e-5)


def test_voxel_downsample_drops_unmapped_labels(rng):
    # labels 30/31/254 are in no group and must be dropped
    pts = make_scan(rng, n=200)
    lut = scan_ops.make_label_group_lut(VOXEL_LABELS)
    got_pts, got_valid = scan_ops.voxel_downsample(
        jnp.asarray(pts, dtype=jnp.float32),
        jnp.ones((len(pts),), dtype=bool),
        lut,
        jnp.asarray(VOXEL_SIZE, dtype=jnp.float32),
        0.5,
        out_capacity=512,
    )
    got = np.asarray(got_pts)[np.asarray(got_valid)]
    assert not np.isin(got[:, 3].astype(int), [30, 31, 254]).any()


def test_voxel_downsample_capacity_overflow(rng):
    pts = make_scan(rng, n=300)
    lut = scan_ops.make_label_group_lut(VOXEL_LABELS)
    got_pts, got_valid = scan_ops.voxel_downsample(
        jnp.asarray(pts, dtype=jnp.float32),
        jnp.ones((len(pts),), dtype=bool),
        lut,
        jnp.asarray(VOXEL_SIZE, dtype=jnp.float32),
        0.5,
        out_capacity=16,
    )
    v = np.asarray(got_valid)
    assert v.sum() <= 16
    assert np.isfinite(np.asarray(got_pts)[v]).all()


def test_deskew_zero_motion_is_identity(rng):
    pts = make_scan(rng, n=32).astype(np.float32)
    ts = np.linspace(0, 1, 32).astype(np.float32)
    eye = jnp.eye(4, dtype=jnp.float32)
    out = scan_ops.deskew(jnp.asarray(pts), jnp.asarray(ts), eye, eye)
    np.testing.assert_allclose(np.asarray(out), pts, atol=1e-5)


def test_deskew_matches_pointwise_oracle(rng):
    pts = make_scan(rng, n=16).astype(np.float32)
    ts = rng.uniform(size=16).astype(np.float32)
    xi = (rng.normal(size=6) * 0.1).astype(np.float32)
    start = jnp.eye(4, dtype=jnp.float32)
    finish = geo.se3_exp(jnp.asarray(xi))
    out = np.asarray(scan_ops.deskew(jnp.asarray(pts), jnp.asarray(ts), start, finish))
    delta = np.asarray(geo.se3_log(finish))
    for i in range(16):
        T = np.asarray(geo.se3_exp(jnp.asarray((ts[i] - 0.5) * delta)))
        expect = T[:3, :3] @ pts[i, :3] + T[:3, 3]
        np.testing.assert_allclose(out[i, :3], expect, atol=1e-4)
        assert out[i, 3] == pts[i, 3]

"""Parity tests: native C++ loader vs the numpy reference path."""

import os

import numpy as np
import pytest

native = pytest.importorskip("sage_icp_tpu._native")

from sage_icp_tpu.datasets import kitti as kitti_ds


def test_load_scan_matches_numpy_path(tmp_path, rng):
    scan = (rng.normal(size=(500, 4)) * 20).astype(np.float32)
    vp = str(tmp_path / "scan.bin")
    scan.tofile(vp)
    lab = (rng.choice([10, 40, 50, 252], size=500).astype(np.int32) | (9 << 16))
    lp = str(tmp_path / "scan.label")
    lab.tofile(lp)

    got = native.load_scan(vp, lp, correct=True)
    # numpy reference: same file, python correction
    ref_xyz = kitti_ds.correct_kitti_scan(scan[:, :3].astype(np.float64))
    np.testing.assert_allclose(got[:, :3], ref_xyz, atol=1e-4)
    np.testing.assert_allclose(got[:, 3], (lab & 0xFFFF).astype(np.float32))


def test_load_scan_without_labels(tmp_path, rng):
    scan = rng.normal(size=(64, 4)).astype(np.float32)
    vp = str(tmp_path / "s.bin")
    scan.tofile(vp)
    got = native.load_scan(vp, None, correct=False)
    np.testing.assert_allclose(got[:, :3], scan[:, :3])
    assert (got[:, 3] == 0).all()


def test_load_scan_missing_file_raises(tmp_path):
    with pytest.raises(IOError):
        native.load_scan(str(tmp_path / "nope.bin"))


def test_pad_scan(rng):
    scan = rng.normal(size=(10, 4)).astype(np.float32)
    buf, val = native.pad_scan(scan, 32)
    assert buf.shape == (32, 4) and val.shape == (32,)
    np.testing.assert_allclose(buf[:10], scan)
    assert val[:10].all() and not val[10:].any()
    assert (buf[10:] == 1.0e7).all()


def test_pad_scan_truncates(rng):
    scan = rng.normal(size=(64, 4)).astype(np.float32)
    buf, val = native.pad_scan(scan, 16)
    assert buf.shape == (16, 4)
    np.testing.assert_allclose(buf, scan[:16])
    assert val.all()

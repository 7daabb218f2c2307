"""Oracle tests for the SE3/SO3 library against scipy-free numpy references.

The reference uses Sophus (f64); we verify exp/log round trips, composition,
and agreement with a numpy Rodrigues oracle at f64 (x64 via CPU) and f32.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sage_icp_tpu.ops import geometry as geo


def np_rodrigues(phi):
    theta = np.linalg.norm(phi)
    K = np.array(
        [
            [0, -phi[2], phi[1]],
            [phi[2], 0, -phi[0]],
            [-phi[1], phi[0], 0],
        ]
    )
    if theta < 1e-12:
        return np.eye(3) + K
    return (
        np.eye(3)
        + np.sin(theta) / theta * K
        + (1 - np.cos(theta)) / theta**2 * (K @ K)
    )


@pytest.mark.parametrize("scale", [1e-6, 1e-3, 0.1, 1.0, 3.0])
def test_so3_exp_matches_rodrigues(rng, scale):
    for _ in range(10):
        phi = rng.normal(size=3) * scale
        R = np.asarray(geo.so3_exp(jnp.asarray(phi, dtype=jnp.float32)))
        R_ref = np_rodrigues(phi)
        np.testing.assert_allclose(R, R_ref, atol=1e-5)


@pytest.mark.parametrize("scale", [1e-5, 1e-2, 0.5, 2.0, 3.1])
def test_so3_log_roundtrip(rng, scale):
    for _ in range(10):
        phi = rng.normal(size=3)
        phi = phi / np.linalg.norm(phi) * scale
        R = geo.so3_exp(jnp.asarray(phi, dtype=jnp.float32))
        phi2 = np.asarray(geo.so3_log(R))
        np.testing.assert_allclose(phi2, phi, atol=5e-4)


def test_se3_exp_log_roundtrip(rng):
    for scale in [1e-5, 1e-2, 0.5, 2.0]:
        xi = rng.normal(size=6) * scale
        T = geo.se3_exp(jnp.asarray(xi, dtype=jnp.float32))
        xi2 = np.asarray(geo.se3_log(T))
        np.testing.assert_allclose(xi2, xi, atol=5e-4)


def test_se3_identity_log_is_zero():
    xi = np.asarray(geo.se3_log(jnp.eye(4, dtype=jnp.float32)))
    np.testing.assert_allclose(xi, np.zeros(6), atol=1e-6)


def test_se3_inverse_compose(rng):
    xi = rng.normal(size=6) * 0.5
    T = geo.se3_exp(jnp.asarray(xi, dtype=jnp.float32))
    TT = np.asarray(T @ geo.se3_inverse(T))
    np.testing.assert_allclose(TT, np.eye(4), atol=1e-5)


def test_transform_points_preserves_label(rng):
    pts = jnp.asarray(rng.normal(size=(16, 4)), dtype=jnp.float32)
    xi = rng.normal(size=6) * 0.3
    T = geo.se3_exp(jnp.asarray(xi, dtype=jnp.float32))
    out = geo.transform_points(T, pts)
    np.testing.assert_allclose(np.asarray(out[:, 3]), np.asarray(pts[:, 3]))
    # xyz transformed correctly
    expected = np.asarray(pts[:, :3]) @ np.asarray(T[:3, :3]).T + np.asarray(T[:3, 3])
    np.testing.assert_allclose(np.asarray(out[:, :3]), expected, atol=1e-5)


def test_rotation_angle(rng):
    for ang in [1e-4, 0.3, 1.5, 3.0]:
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        R = geo.so3_exp(jnp.asarray(axis * ang, dtype=jnp.float32))
        got = float(geo.rotation_angle(R))
        assert abs(got - ang) < 1e-3


def test_umeyama_recovers_rigid_transform(rng):
    src = rng.normal(size=(50, 3)).astype(np.float32)
    axis = rng.normal(size=3)
    phi = axis / np.linalg.norm(axis) * 0.7
    R = np_rodrigues(phi)
    t = np.array([1.0, -2.0, 0.5])
    dst = src @ R.T + t
    T = np.asarray(
        geo.umeyama_alignment(jnp.asarray(src), jnp.asarray(dst, dtype=jnp.float32))
    )
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-4)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-4)


def test_quat_near_pi_rotation(rng):
    # so3_log must be stable near theta = pi where acos-based formulas fail
    axis = np.array([0.3, -0.5, 0.8])
    axis /= np.linalg.norm(axis)
    phi = axis * (np.pi - 1e-3)
    R = geo.so3_exp(jnp.asarray(phi, dtype=jnp.float32))
    phi2 = np.asarray(geo.so3_log(R))
    np.testing.assert_allclose(phi2, phi, atol=1e-2)

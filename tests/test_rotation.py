"""Golden tests for rotation conversions against independent numpy math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ovmono3d_tpu.ops import rotation as R


def _np_axis_angle_matrix(axis, angle):
    axis = axis / np.linalg.norm(axis)
    x, y, z = axis
    K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def _assert_rotation(mats, atol=1e-5):
    mats = np.asarray(mats)
    eye = np.broadcast_to(np.eye(3), mats.shape)
    np.testing.assert_allclose(mats @ np.swapaxes(mats, -1, -2), eye, atol=atol)
    np.testing.assert_allclose(np.linalg.det(mats), 1.0, atol=atol)


def test_rotation_6d_roundtrip():
    key = jax.random.PRNGKey(0)
    mats = R.random_rotations(key, 64)
    _assert_rotation(mats)
    d6 = R.matrix_to_rotation_6d(mats)
    back = R.rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(back), np.asarray(mats), atol=1e-5)


def test_rotation_6d_arbitrary_input_is_rotation():
    d6 = jax.random.normal(jax.random.PRNGKey(1), (128, 6))
    mats = R.rotation_6d_to_matrix(d6)
    _assert_rotation(mats)


def test_quaternion_roundtrip():
    key = jax.random.PRNGKey(2)
    quat = jax.random.normal(key, (64, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    quat = jnp.where(quat[:, :1] < 0, -quat, quat)
    mats = R.quaternion_to_matrix(quat)
    _assert_rotation(mats)
    back = R.matrix_to_quaternion(mats)
    np.testing.assert_allclose(np.asarray(back), np.asarray(quat), atol=1e-4)


def test_axis_angle_matches_numpy_rodrigues():
    rng = np.random.RandomState(3)
    for _ in range(10):
        axis = rng.randn(3)
        angle = rng.uniform(0.01, np.pi - 0.01)
        aa = angle * axis / np.linalg.norm(axis)
        got = np.asarray(R.axis_angle_to_matrix(jnp.asarray(aa, jnp.float32)))
        want = _np_axis_angle_matrix(axis, angle)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_axis_angle_zero_is_identity():
    got = np.asarray(R.axis_angle_to_matrix(jnp.zeros(3)))
    np.testing.assert_allclose(got, np.eye(3), atol=1e-5)


def test_euler_xyz_roundtrip():
    rng = np.random.RandomState(4)
    euler = jnp.asarray(rng.uniform(-1.2, 1.2, (32, 3)), jnp.float32)
    mats = R.euler_angles_to_matrix(euler, "XYZ")
    _assert_rotation(mats)
    back = R.matrix_to_euler_angles(mats, "XYZ")
    np.testing.assert_allclose(np.asarray(back), np.asarray(euler), atol=1e-4)


def test_euler_single_axis():
    angle = 0.5
    mz = np.asarray(
        R.euler_angles_to_matrix(jnp.array([0.0, 0.0, angle]), "XYZ")
    )
    want = np.array(
        [
            [np.cos(angle), -np.sin(angle), 0],
            [np.sin(angle), np.cos(angle), 0],
            [0, 0, 1],
        ]
    )
    np.testing.assert_allclose(mz, want, atol=1e-6)


def test_so3_relative_angle():
    key = jax.random.PRNGKey(5)
    r1 = R.random_rotations(key, 16)
    angle = 0.7
    rel = R.axis_angle_to_matrix(jnp.array([0.0, angle, 0.0]))
    # Full-precision matmul: the default XLA matmul does bf16 passes.
    r2 = jnp.matmul(rel, r1, precision=jax.lax.Precision.HIGHEST)
    got = R.so3_relative_angle(r2, r1)
    np.testing.assert_allclose(np.asarray(got), angle, atol=1e-3)
    cos = R.so3_relative_angle(r2, r1, cos_angle=True)
    np.testing.assert_allclose(np.asarray(cos), np.cos(angle), atol=1e-3)


def test_jit_and_grad():
    d6 = jax.random.normal(jax.random.PRNGKey(6), (8, 6))

    @jax.jit
    def loss(d6):
        m = R.rotation_6d_to_matrix(d6)
        return jnp.sum(m**2)

    g = jax.grad(loss)(d6)
    assert g.shape == d6.shape
    assert np.all(np.isfinite(np.asarray(g)))

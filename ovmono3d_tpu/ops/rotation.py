"""Rotation representation conversions (pure JAX, fully vectorized).

TPU-native replacements for the pytorch3d.transforms functions the reference
uses (see SURVEY.md §2.3; reference call sites:
cubercnn/modeling/roi_heads/cube_head.py:10-15,176-186 and
cubercnn/util/math_util.py:34). All functions are closed-form, jit/vmap/grad
friendly, and accept arbitrary leading batch dimensions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8
# 3x3 rotation algebra must run at full f32 precision: XLA's default matmul
# precision on TPU does bf16 passes, which breaks orthogonality by ~1e-3.
_PREC = jax.lax.Precision.HIGHEST


def _matmul(a, b):
    return jnp.matmul(a, b, precision=_PREC)


def copysign(a: jax.Array, b: jax.Array) -> jax.Array:
    """Return `a` with the sign of `b` (matching torch._copysign semantics:
    sign(0) treated as positive)."""
    return jnp.where(b < 0, -jnp.abs(a), jnp.abs(a))


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """Convert 6D rotation representation (Zhou et al. 2019) to 3x3 matrices.

    Gram-Schmidt orthogonalization of the two 3-vectors in `d6[..., :3]` and
    `d6[..., 3:]`; rows of the output are (b1, b2, b1 x b2).
    """
    a1 = d6[..., :3]
    a2 = d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2_proj = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2_proj / jnp.maximum(
        jnp.linalg.norm(a2_proj, axis=-1, keepdims=True), _EPS
    )
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jax.Array) -> jax.Array:
    """Inverse of :func:`rotation_6d_to_matrix` (first two rows, flattened)."""
    return matrix[..., :2, :].reshape(*matrix.shape[:-2], 6)


def quaternion_to_matrix(quat: jax.Array) -> jax.Array:
    """Convert quaternions (w, x, y, z) to rotation matrices.

    Quaternions need not be normalized; output uses the standard homogeneous
    form so scale cancels.
    """
    w, x, y, z = (quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3])
    two_s = 2.0 / jnp.maximum(jnp.sum(quat * quat, axis=-1), _EPS)
    m = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(*quat.shape[:-1], 3, 3)


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """Convert rotation matrices to quaternions (w, x, y, z), branch-free.

    Uses the numerically-stable 4-candidate construction: compute all four
    quaternion candidates from the diagonal and pick the one with the largest
    denominator.
    """
    m00 = matrix[..., 0, 0]
    m11 = matrix[..., 1, 1]
    m22 = matrix[..., 2, 2]
    m01, m02 = matrix[..., 0, 1], matrix[..., 0, 2]
    m10, m12 = matrix[..., 1, 0], matrix[..., 1, 2]
    m20, m21 = matrix[..., 2, 0], matrix[..., 2, 1]

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    q_abs = safe_sqrt(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )
    # Candidate quaternions (unnormalized), one per dominant component.
    quat_by_w = jnp.stack(
        [q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1
    )
    quat_by_x = jnp.stack(
        [m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1
    )
    quat_by_y = jnp.stack(
        [m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1
    )
    quat_by_z = jnp.stack(
        [m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1
    )
    quat_candidates = jnp.stack(
        [quat_by_w, quat_by_x, quat_by_y, quat_by_z], axis=-2
    )
    denom = 2.0 * jnp.maximum(q_abs, 0.1)  # floor avoids div-by-~0 off-branch
    quat_candidates = quat_candidates / denom[..., None]
    best = jnp.argmax(q_abs, axis=-1)
    quat = jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    norm = jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), _EPS)
    quat = quat / norm
    # Canonicalize sign: w >= 0.
    return jnp.where(quat[..., :1] < 0, -quat, quat)


def axis_angle_to_matrix(axis_angle: jax.Array) -> jax.Array:
    """Rodrigues' formula: axis-angle vector (angle = norm) -> matrix."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    safe_angle = jnp.maximum(angle, _EPS)
    axis = axis_angle / safe_angle
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    kmat = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    ).reshape(*axis_angle.shape[:-1], 3, 3)
    theta = angle[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), kmat.shape)
    # K^2 = outer(axis, axis) - I for a unit axis: avoids a matmul entirely
    # (and the reduced-precision pass XLA would use for it).
    outer = axis[..., :, None] * axis[..., None, :]
    r = (jnp.cos(theta) * eye
         + jnp.sin(theta) * kmat
         + (1.0 - jnp.cos(theta)) * outer)
    # angle == 0 -> identity (sin(0)=0, cos(0)=1).
    return r


def euler_angles_to_matrix(euler: jax.Array, convention: str = "XYZ") -> jax.Array:
    """Euler angles -> rotation matrix. R = R(c0) @ R(c1) @ R(c2), matching
    pytorch3d semantics (reference use: cube_head.py:186)."""

    def _axis_rot(axis: str, angle: jax.Array) -> jax.Array:
        c, s = jnp.cos(angle), jnp.sin(angle)
        one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
        if axis == "X":
            flat = [one, zero, zero, zero, c, -s, zero, s, c]
        elif axis == "Y":
            flat = [c, zero, s, zero, one, zero, -s, zero, c]
        elif axis == "Z":
            flat = [c, -s, zero, s, c, zero, zero, zero, one]
        else:
            raise ValueError(f"bad axis {axis}")
        return jnp.stack(flat, axis=-1).reshape(*angle.shape, 3, 3)

    mats = [
        _axis_rot(axis, euler[..., i]) for i, axis in enumerate(convention)
    ]
    return _matmul(_matmul(mats[0], mats[1]), mats[2])


def matrix_to_euler_angles(matrix: jax.Array, convention: str = "XYZ") -> jax.Array:
    """Rotation matrix -> euler angles for the XYZ convention."""
    if convention != "XYZ":
        raise NotImplementedError("only XYZ supported")
    # R = Rx @ Ry @ Rz
    sy = matrix[..., 0, 2]
    y = jnp.arcsin(jnp.clip(sy, -1.0, 1.0))
    x = jnp.arctan2(-matrix[..., 1, 2], matrix[..., 2, 2])
    z = jnp.arctan2(-matrix[..., 0, 1], matrix[..., 0, 0])
    return jnp.stack([x, y, z], axis=-1)


def so3_relative_angle(
    r1: jax.Array,
    r2: jax.Array,
    eps: float = 1e-4,
    cos_angle: bool = False,
) -> jax.Array:
    """Relative rotation angle between two batches of rotation matrices.

    Mirrors pytorch3d.so3_relative_angle (reference pose loss,
    roi_heads.py:655-657): angle of r1 @ r2^T via the trace formula. With
    ``cos_angle=True`` returns cos(theta) directly (cheaper, used in the
    reference's `1 - cos` loss).
    """
    r12 = _matmul(r1, jnp.swapaxes(r2, -1, -2))
    trace = r12[..., 0, 0] + r12[..., 1, 1] + r12[..., 2, 2]
    cos = (trace - 1.0) * 0.5
    if cos_angle:
        # pytorch3d returns the RAW cosine here (its eps only guards the
        # acos branch) — clipping would put a floor/dead-zone on the
        # reference's `1 - cos` pose loss near identity.
        return cos
    return jnp.arccos(jnp.clip(cos, -1.0 + eps, 1.0 - eps))


def random_rotations(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """Uniform random rotation matrices (via normalized random quaternions)."""
    quat = jax.random.normal(key, (n, 4), dtype=dtype)
    quat = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), _EPS)
    return quaternion_to_matrix(quat)

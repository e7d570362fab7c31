"""3D cuboid geometry core (pure JAX, fixed-shape, fully batched).

TPU-native re-design of the reference's geometry library
(cubercnn/util/math_util.py — see SURVEY.md §2.1 #22). Everything here is a
pure function over arrays with arbitrary leading batch dims: no Python-side
shape branching, so every caller can jit/vmap/grad through it.

Cuboid convention (matches reference math_util.py:151-181):
  box3d = [X, Y, Z, W, H, L] — camera-space center, dims; the local corner
  template places L along x, H along y, W along z; corners are rotated by R
  then translated by the center.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ovmono3d_tpu.ops.rotation import axis_angle_to_matrix

_EPS = 1e-8
# Small-matrix geometry must not go through XLA's reduced-precision matmul
# default (bf16 passes on TPU) — demand full f32.
_PREC = jax.lax.Precision.HIGHEST

# Local unit-cuboid corner template, shape [8, 3]; row i = corner v_i from the
# reference's vertex diagram (math_util.py:151-167):
#   x in {-1/2 (0,3,4,7), +1/2 (1,2,5,6)} scaled by L
#   y in {-1/2 (0,1,4,5), +1/2 (2,3,6,7)} scaled by H
#   z in {-1/2 (0,1,2,3), +1/2 (4,5,6,7)} scaled by W
CORNER_SIGNS = jnp.array(
    [
        [-1.0, -1.0, -1.0],
        [+1.0, -1.0, -1.0],
        [+1.0, +1.0, -1.0],
        [-1.0, +1.0, -1.0],
        [-1.0, -1.0, +1.0],
        [+1.0, -1.0, +1.0],
        [+1.0, +1.0, +1.0],
        [-1.0, +1.0, +1.0],
    ]
) * 0.5

# 12 triangles over the 8 corners (reference math_util.py:195-213).
CUBOID_FACES = jnp.array(
    [
        [0, 1, 2], [2, 3, 0],  # front
        [1, 5, 6], [6, 2, 1],  # right
        [4, 0, 3], [3, 7, 4],  # left
        [5, 4, 7], [7, 6, 5],  # back
        [4, 5, 1], [1, 0, 4],  # top
        [3, 2, 6], [6, 7, 3],  # bottom
    ],
    dtype=jnp.int32,
)

# The 6 quad faces (for polytope clipping in ops.iou3d); each row is the 4
# corner indices of one face in winding order, normal pointing outward.
CUBOID_QUAD_FACES = jnp.array(
    [
        [0, 1, 2, 3],  # front  (z = -W/2)
        [4, 7, 6, 5],  # back   (z = +W/2)
        [0, 4, 5, 1],  # top    (y = -H/2)
        [3, 2, 6, 7],  # bottom (y = +H/2)
        [0, 3, 7, 4],  # left   (x = -L/2)
        [1, 5, 6, 2],  # right  (x = +L/2)
    ],
    dtype=jnp.int32,
)


def cuboid_corners(box3d: jax.Array, R: jax.Array | None = None) -> jax.Array:
    """Camera-space corners of 3D cuboids.

    Args:
      box3d: [..., 6] as [X, Y, Z, W, H, L].
      R: optional [..., 3, 3] rotation.
    Returns:
      [..., 8, 3] corners (reference: get_cuboid_verts_faces,
      math_util.py:116-219).
    """
    center = box3d[..., :3]
    whl = box3d[..., 3:6]  # (W, H, L)
    # Scale template: x by L, y by H, z by W.
    scale = jnp.stack([whl[..., 2], whl[..., 1], whl[..., 0]], axis=-1)
    local = CORNER_SIGNS * scale[..., None, :]  # [..., 8, 3]
    if R is not None:
        local = jnp.einsum("...ij,...kj->...ki", R, local, precision=_PREC)
    return local + center[..., None, :]


def project_points(K: jax.Array, pts3d: jax.Array) -> jax.Array:
    """Project camera-space points through intrinsics.

    Args:
      K: [..., 3, 3]; pts3d: [..., N, 3].
    Returns:
      [..., N, 3] = (u, v, z) with u,v in pixels (reference:
      get_cuboid_verts, math_util.py:251-253).
    """
    proj = jnp.einsum("...ij,...nj->...ni", K, pts3d, precision=_PREC)
    z = proj[..., 2:3]
    uv = proj[..., :2] / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    return jnp.concatenate([uv, z], axis=-1)


def cuboid_to_2d_box(
    K: jax.Array,
    box3d: jax.Array,
    R: jax.Array,
    clip_w: float = 0.0,
    clip_h: float = 0.0,
    min_z: float = 0.20,
    xywh: bool = True,
):
    """Project a cuboid to its tight 2D box with behind-camera clipping.

    Mirrors reference convert_3d_box_to_2d (math_util.py:498-577): corners
    with z <= min_z are snapped to the image corner matching the sign
    quadrant of their 3D position before the min/max.

    Returns (box2d [..., 4], behind_camera [...], fully_behind [...]).
    """
    corners3d = cuboid_corners(box3d, R)
    corners2d = project_points(K, corners3d)

    behind = corners2d[..., 2] <= min_z  # [..., 8]
    sx = corners3d[..., 0] > 0
    sy = corners3d[..., 1] > 0
    # Bound coordinates per sign quadrant (0 or clip-1).
    bx = jnp.where(sx, clip_w - 1.0, 0.0)
    by = jnp.where(sy, clip_h - 1.0, 0.0)
    u = jnp.where(behind, bx, corners2d[..., 0])
    v = jnp.where(behind, by, corners2d[..., 1])

    x1 = jnp.min(u, axis=-1)
    y1 = jnp.min(v, axis=-1)
    x2 = jnp.max(u, axis=-1)
    y2 = jnp.max(v, axis=-1)

    if xywh:
        box2d = jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)
    else:
        box2d = jnp.stack([x1, y1, x2, y2], axis=-1)
    return box2d, jnp.any(behind, axis=-1), jnp.all(behind, axis=-1)


def virtual_to_real_scale(
    focal: jax.Array,
    height: jax.Array,
    virtual_focal: float | jax.Array,
    virtual_height: jax.Array,
) -> jax.Array:
    """Depth scaling factor from the virtual focal space to the real one.

    compute_virtual_scale_from_focal_spaces(f, H, f0, H0) = H0*f/(f0*H) in the
    reference (math_util.py:581-592). The cube head calls it with
    f=real focal, H=original image height, f0=virtual focal (512),
    H0=network-input height (roi_heads.py:402-411); multiplying a virtual
    depth by the result yields metric depth.
    """
    return (virtual_height * focal) / (virtual_focal * height)


def _viewing_ray_correction(K: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Rotation M aligning the optical axis with the viewing ray of (u, v).

    Shared helper for allocentric<->egocentric conversion (reference
    R_to/from_allocentric, math_util.py:595-705). Returns [..., 3, 3].
    """
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    sx = K[..., 0, 2]
    sy = K[..., 1, 2]
    ray = jnp.stack(
        [(u - sx) / fx, (v - sy) / fy, jnp.ones_like(u)], axis=-1
    )
    ray = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True), _EPS)
    # atan2 formulation: well-conditioned near angle=0, unlike arccos(ray_z).
    xy_norm = jnp.sqrt(ray[..., 0] ** 2 + ray[..., 1] ** 2)
    angle = jnp.arctan2(xy_norm, ray[..., 2])
    axis = jnp.stack(
        [-ray[..., 1], ray[..., 0], jnp.zeros_like(u)], axis=-1
    )
    norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis_angle = angle[..., None] * axis / jnp.maximum(norm, _EPS)
    M = axis_angle_to_matrix(axis_angle)
    # angle == 0 (on-axis): identity.
    eye = jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), M.shape)
    return jnp.where((angle > _EPS)[..., None, None], M, eye)


def R_from_allocentric(
    K: jax.Array, R_view: jax.Array, u: jax.Array, v: jax.Array
) -> jax.Array:
    """Allocentric -> egocentric rotation at pixel (u, v). R = M @ R_view."""
    M = _viewing_ray_correction(K, u, v)
    return jnp.matmul(M, R_view, precision=_PREC)


def R_to_allocentric(
    K: jax.Array, R: jax.Array, u: jax.Array, v: jax.Array
) -> jax.Array:
    """Egocentric -> allocentric rotation at pixel (u, v). R_view = M^T @ R."""
    M = _viewing_ray_correction(K, u, v)
    return jnp.matmul(jnp.swapaxes(M, -1, -2), R, precision=_PREC)


def scaled_sigmoid(
    vals: jax.Array, lo: jax.Array | float = 0.0, hi: jax.Array | float = 1.0
) -> jax.Array:
    """Sigmoid rescaled to the (lo, hi) interval (math_util.py:969-978)."""
    return lo + jax.nn.sigmoid(vals) * (hi - lo)


def backproject(
    K: jax.Array, uv: jax.Array, z: jax.Array
) -> jax.Array:
    """Lift pixel coords + depth to camera space: X = z*(u-cx)/fx etc.

    Reference 3D lifting (roi_heads.py:798-843). uv: [..., 2], z: [...].
    Returns [..., 3].
    """
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    x = z * (uv[..., 0] - cx) / fx
    y = z * (uv[..., 1] - cy) / fy
    return jnp.stack([x, y, z], axis=-1)


def chamfer_corner_distance(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Symmetric chamfer distance between two 8-corner sets.

    Used as the reference's pose loss when CHAMFER_POSE is on
    (roi_heads.py:299-309 chamfer_loss): mean over min-L1 row/col matches.
    pred/gt: [..., 8, 3]. Returns [...].
    """
    # Pairwise L1 distances [..., 8, 8]. The two directed means are SUMMED
    # (NOT averaged) exactly as chamfer_loss does — halving would train the
    # chamfer pose/joint losses at half the reference magnitude.
    diff = jnp.sum(jnp.abs(pred[..., :, None, :] - gt[..., None, :, :]), axis=-1)
    return (jnp.mean(jnp.min(diff, axis=-1), axis=-1)
            + jnp.mean(jnp.min(diff, axis=-2), axis=-1))


def approx_eval_resolution(h, w, scale_min: float = 0, scale_max: float = 1e10):
    """Resolution an (h, w) image runs through the model at given a min/max
    scale constraint (math_util.py:262-289). Host-side helper."""
    orig_h = h
    if scale_min > 0:
        sf = scale_min / min(h, w)
        h, w = h * sf, w * sf
    sf = min(scale_max / max(h, w), 1.0)
    h, w = h * sf, w * sf
    return h, w, h / orig_h

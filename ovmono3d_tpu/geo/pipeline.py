"""OVMono3D-GEO box fitting: masked depth -> oriented 3D cuboid (pure JAX).

TPU-native re-design of the reference's geometric pipeline
(tools/ovmono3d_geo.py:40-258; SURVEY.md §3.4):

  2D box -> SAM mask -> metric depth -> unproject -> PCA yaw (xz plane)
  -> outlier removal -> min/max box in the yaw frame -> corners
  -> (center, dims, pose via SVD Procrustes)

Fixed-shape design: instead of gathering the masked pixels (dynamic count),
every reduction (mean / covariance / extrema / density) is computed as a
mask-weighted reduction over the full [H, W] grid — one jit per image shape,
no data-dependent shapes.

Outlier removal: the reference loops DBSCAN (eps=0.01, min_samples=100,
doubling eps until clusters cover >50% of points). DBSCAN's irregular
region-growing is hostile to XLA; we use the equivalent density-core
criterion on a voxel grid — a point is kept iff its eps-voxel contains
enough masked points — evaluated at the same doubling eps schedule and the
same >50%-coverage acceptance rule, entirely with sort/searchsorted (no
scatters).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ovmono3d_tpu.utils.geometry import cuboid_corners

# Small-matrix geometry must not run through TPU's default bf16 matmul
# passes (CLAUDE.md / ops/rotation.py pattern): box extents are EXTREMA of
# rotated points, so per-point ~0.3% bf16 noise biases them outward.
_PREC = jax.lax.Precision.HIGHEST

# Corner ordering of the reference's gen_8corners (ovmono3d_geo.py:106-113).
_CORNER_FLAGS = jnp.array(
    [
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ],
    jnp.float32,
)

_FLIP = jnp.diag(jnp.array([1.0, -1.0, -1.0]))  # open3d-frame flip


def heading_to_rotmat(yaw: jax.Array) -> jax.Array:
    """Rotation about +y by `yaw` (ovmono3d_geo.py:115-124)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(yaw)
    one = jnp.ones_like(yaw)
    return jnp.stack(
        [c, z, -s, z, one, z, s, z, c], axis=-1
    ).reshape(*yaw.shape, 3, 3)


def unproject_depth(depth: jax.Array, K: jax.Array) -> jax.Array:
    """Per-pixel camera-space points with the reference's open3d flip:
    [x, -y, -z] (ovmono3d_geo.py:131-139). depth: [H, W] -> [H, W, 3]."""
    H, W = depth.shape
    xs = jnp.arange(W, dtype=depth.dtype)
    ys = jnp.arange(H, dtype=depth.dtype)
    u, v = jnp.meshgrid(xs, ys)
    x3 = depth * (u - K[0, 2]) / K[0, 0]
    y3 = depth * (v - K[1, 2]) / K[1, 1]
    return jnp.stack([x3, -y3, -depth], axis=-1)


def _masked_mean(x: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted mean over leading dims; x [..., D], w [...]."""
    tot = jnp.maximum(jnp.sum(w), 1e-6)
    return jnp.sum(x * w[..., None], axis=tuple(range(w.ndim))) / tot


def pca_yaw(points: jax.Array, mask: jax.Array) -> jax.Array:
    """Dominant direction of the masked points on the xz plane -> yaw angle
    (ovmono3d_geo.py:144-150). points: [..., 3], mask: [...]."""
    w = mask.astype(points.dtype)
    xz = jnp.stack([points[..., 0], points[..., 2]], axis=-1)
    mean = _masked_mean(xz, w)
    centered = (xz - mean) * w[..., None]
    flat = centered.reshape(-1, 2)
    cov = jnp.matmul(flat.T, flat, precision=_PREC) / jnp.maximum(
        jnp.sum(w), 1e-6
    )
    # Leading eigenvector of a symmetric 2x2 matrix (closed form).
    a, b, d = cov[0, 0], cov[0, 1], cov[1, 1]
    theta = 0.5 * jnp.arctan2(2 * b, a - d)
    # arctan2 picks the eigenvector of the LARGER eigenvalue when a >= d;
    # verify by comparing projected variances and flip if needed.
    v = jnp.array([jnp.cos(theta), jnp.sin(theta)])
    v_perp = jnp.array([-v[1], v[0]])
    var_v = v @ cov @ v          # 2-vectors: reductions, not MXU matmuls
    var_p = v_perp @ cov @ v_perp
    v = jnp.where(var_v >= var_p, v, v_perp)
    return jnp.arctan2(v[1], v[0])


def _voxel_density_keep(
    points: jax.Array,      # [P, 3]
    mask: jax.Array,        # [P]
    eps: jax.Array,
    min_count: int,
) -> jax.Array:
    """Keep mask of points with >= min_count masked points in their 3x3x3
    eps-voxel neighborhood (covers the DBSCAN eps-ball: the density-core
    criterion of DBSCAN(eps, min_samples)).

    Sort-based counting (no scatter): quantize to voxel ids, sort once, then
    each neighbor voxel's multiplicity = searchsorted(right) - (left).
    """
    # Quantize to voxel coords; 10 bits per axis packed into one int32
    # (points are mean-centered upstream, so +-512 voxels ~ +-5 m at the
    # initial eps=0.01). Points OUTSIDE the grid are treated as outliers
    # (never core, excluded from the count table): clipping them to the
    # border cell would pool every far-away sparse point into one
    # artificial "dense" voxel that survives the filter.
    q_raw = jnp.floor(points / eps).astype(jnp.int32) + 512
    in_range = jnp.all((q_raw >= 0) & (q_raw <= 1023), axis=-1)
    valid = mask & in_range
    q = jnp.clip(q_raw, 0, 1023)

    def pack(qc):
        return qc[:, 0] * (1 << 20) + qc[:, 1] * (1 << 10) + qc[:, 2]

    sentinel = jnp.int32(jnp.iinfo(jnp.int32).max)
    ids = jnp.where(valid, pack(q), sentinel)
    sorted_ids = jnp.sort(ids)
    counts = jnp.zeros(ids.shape, jnp.int32)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                nq = q + jnp.array([dx, dy, dz], jnp.int32)
                nok = jnp.all((nq >= 0) & (nq <= 1023), axis=-1)
                # Out-of-grid neighbor cells can't alias a real border
                # cell: -1 never appears in the table.
                nid = jnp.where(nok, pack(jnp.clip(nq, 0, 1023)),
                                jnp.int32(-1))
                left = jnp.searchsorted(sorted_ids, nid, side="left")
                right = jnp.searchsorted(sorted_ids, nid, side="right")
                counts = counts + (right - left).astype(jnp.int32)
    return valid & (counts >= min_count)


def robust_extent_mask(
    points: jax.Array,      # [P, 3] (already in the yaw-aligned frame)
    mask: jax.Array,        # [P]
    eps0: float = 0.01,
    min_count: int = 100,
    max_tries: int = 4,
) -> jax.Array:
    """Density-core outlier filter with the reference's eps-doubling schedule
    and >50%-coverage acceptance (ovmono3d_geo.py:152-183). Returns the kept
    mask (falls back to the full mask after max_tries, like the reference)."""
    total = jnp.maximum(jnp.sum(mask), 1.0)

    keeps = []
    eps = eps0
    for _ in range(max_tries):
        keeps.append(_voxel_density_keep(points, mask, jnp.asarray(eps), min_count))
        eps *= 2.0
    keeps.append(mask)  # final fallback

    out = keeps[-1]
    # Pick the FIRST schedule entry covering > 50% (evaluate in reverse).
    for k in reversed(keeps[:-1]):
        ok = jnp.sum(k) > 0.5 * total
        out = jnp.where(ok, k, out)
    return out


@partial(jax.jit, static_argnames=())
def fit_box_from_mask_depth(
    mask: jax.Array,   # [H, W] bool/float — instance mask
    depth: jax.Array,  # [H, W] metric depth
    K: jax.Array,      # [3, 3]
):
    """Full GEO fit: masked depth -> (center [3], dims [3] (w,h,l),
    pose [3,3], corners [8,3]) in camera space.

    Mirrors run_one_2dbox_to_3d + build_pseudo_bbox3d_from_mask2d_outlier
    (ovmono3d_geo.py:127-258).
    """
    m = (mask > 0.5) & (depth > 0)
    pts = unproject_depth(depth, K)          # flipped frame
    flat_pts = pts.reshape(-1, 3)
    flat_m = m.reshape(-1)

    offset = _masked_mean(flat_pts, flat_m.astype(flat_pts.dtype))
    centered = flat_pts - offset
    yaw = pca_yaw(centered, flat_m)
    R_align = heading_to_rotmat(-yaw)
    aligned = jnp.matmul(centered, R_align.T, precision=_PREC) + offset

    # Density filter on MEAN-CENTERED coordinates: DBSCAN is translation-
    # invariant, and the voxel grid's +-512-cell range (~5 m at eps=0.01)
    # would otherwise saturate for any object beyond ~5 m depth, silently
    # disabling outlier rejection.
    keep = robust_extent_mask(aligned - offset, flat_m)

    big = jnp.float32(1e9)
    mins = jnp.min(jnp.where(keep[:, None], aligned, big), axis=0)
    maxs = jnp.max(jnp.where(keep[:, None], aligned, -big), axis=0)

    # Corner base/extents exactly as the reference builds them
    # (ovmono3d_geo.py:187-205): y and z are deliberately SWAPPED
    # (base at y_max/z_max with negative extents), which lands corner 0 on
    # the camera-frame (-y, -z) octant after the open3d flip — matching
    # template vertex v0 so the Procrustes correspondence is exact.
    base = jnp.stack([mins[0], maxs[1], maxs[2]])
    extent = jnp.stack(
        [maxs[0] - mins[0], mins[1] - maxs[1], mins[2] - maxs[2]]
    )
    corners = base[None, :] + _CORNER_FLAGS * extent[None, :]
    corners = corners - offset
    corners = jnp.matmul(
        corners, heading_to_rotmat(yaw).T, precision=_PREC
    ) + offset
    # Back to camera frame (undo the open3d flip).
    corners_cam = jnp.matmul(corners, _FLIP, precision=_PREC)

    center = jnp.mean(corners_cam, axis=0)
    # dims per reference get_dims ordering -> (w, h, l) = (|c0-c4|, |c0-c3|,
    # |c0-c1|) (ovmono3d_geo.py:46-50).
    l = jnp.linalg.norm(corners_cam[0] - corners_cam[1])
    h = jnp.linalg.norm(corners_cam[0] - corners_cam[3])
    w = jnp.linalg.norm(corners_cam[0] - corners_cam[4])
    dims = jnp.stack([w, h, l])

    # Pose: Procrustes between the fitted corners and the axis-aligned
    # template corners sharing center/dims (ovmono3d_geo.py:51-63, 243-258).
    template = cuboid_corners(jnp.concatenate([center, dims]))
    A = corners_cam - center
    B = template - center
    U, _, Vt = jnp.linalg.svd(
        jnp.matmul(A.T, B, precision=_PREC), full_matrices=True
    )
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(jnp.sign(det))
    R = U @ D @ Vt

    fitted_corners = cuboid_corners(jnp.concatenate([center, dims]), R)
    # Empty effective mask (no pixel with mask>0.5 AND depth>0): mins/maxs
    # are +-1e9 sentinels and everything downstream is garbage — flag it
    # and zero the outputs so callers can't silently export it.
    ok = jnp.sum(keep) > 0
    eye = jnp.eye(3, dtype=R.dtype)
    return {
        "center": jnp.where(ok, center, 0.0),
        "dims": jnp.where(ok, dims, 0.0),
        "pose": jnp.where(ok, R, eye),
        "corners": jnp.where(ok, fitted_corners, 0.0),
        "yaw": jnp.where(ok, yaw, 0.0),
        "num_points": jnp.sum(keep),
        "valid": ok,
    }

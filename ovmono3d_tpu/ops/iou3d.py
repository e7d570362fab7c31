"""Exact 3D IoU of oriented boxes — fixed-shape polytope clipping in JAX.

TPU-native replacement for pytorch3d's `_C.iou_box3d` CUDA kernel used by the
evaluator's `box3d_overlap` (reference omni3d_evaluation.py:39-41,109-169;
SURVEY.md §2.3 and §5.1 — note the reference fork's AP3D is broken because the
3D computeIoU dispatch is missing; we implement the real thing).

Algorithm (exact for convex boxes, bounded shapes throughout):
  For a box pair (A, B), the intersection volume is computed by clipping the
  12 triangles of A's surface against the 6 half-spaces of B, and vice versa,
  then summing the signed divergence-theorem volume of the two clipped surface
  patches. Clipping one triangle by one plane (Sutherland–Hodgman) turns k
  vertices into at most k+1, so a triangle clipped by 6 planes has at most 9
  vertices — we keep a fixed 12-triangle x MAX_V=10-vertex buffer with a
  validity count, and the whole pipeline is dense tensor math (vmap over
  pairs) with no data-dependent shapes.

This matches pytorch3d's definition: vol(A ∩ B) via convex clipping; IoU =
vol / (volA + volB - vol).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ovmono3d_tpu.utils.geometry import CUBOID_FACES, CUBOID_QUAD_FACES

_PREC = jax.lax.Precision.HIGHEST

_MAX_V = 10  # 3 verts + up to 6 clips (max +1 vertex each), padded to 10.
_EPS = 1e-7


def box_planes(corners: jax.Array):
    """Outward half-space representation of a box from its 8 corners.

    Returns (normals [..., 6, 3], offsets [..., 6]) with plane eq
    n·x <= d inside.
    """
    quads = corners[..., CUBOID_QUAD_FACES, :]  # [..., 6, 4, 3]
    # Normal from the quad's winding (v1-v0) x (v3-v0); for a box these quads
    # are planar rectangles.
    v0 = quads[..., 0, :]
    v1 = quads[..., 1, :]
    v3 = quads[..., 3, :]
    n = jnp.cross(v1 - v0, v3 - v0)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), _EPS)
    center = jnp.mean(corners, axis=-2)  # [..., 3]
    # Orient outward: n·(v0 - center) > 0.
    sign = jnp.sign(
        jnp.sum(n * (v0 - center[..., None, :]), axis=-1, keepdims=True)
    )
    sign = jnp.where(sign == 0, 1.0, sign)
    n = n * sign
    d = jnp.sum(n * v0, axis=-1)
    return n, d


def box_volume(corners: jax.Array) -> jax.Array:
    """Volume of a (possibly rotated) box from its 8 corners: |e1·(e2×e3)|
    with edges from corner 0 (template edges 0->1, 0->3, 0->4)."""
    e1 = corners[..., 1, :] - corners[..., 0, :]
    e2 = corners[..., 3, :] - corners[..., 0, :]
    e3 = corners[..., 4, :] - corners[..., 0, :]
    return jnp.abs(jnp.sum(e1 * jnp.cross(e2, e3), axis=-1))


def _clip_polygon_by_plane(verts, count, normal, offset, tol):
    """Sutherland–Hodgman: clip one padded polygon by one half-space.

    verts: [MAX_V, 3] with `count` valid entries (cyclic order); keeps points
    with n·x - d <= tol. Returns (new_verts [MAX_V, 3], new_count).
    Fully dense: computes candidate output for every input edge slot.
    """
    idx = jnp.arange(_MAX_V)
    next_idx = jnp.where(idx + 1 >= count, 0, idx + 1)
    cur = verts
    nxt = verts[next_idx]
    d_cur = jnp.einsum("vd,d->v", cur, normal, precision=_PREC) - offset
    d_nxt = jnp.einsum("vd,d->v", nxt, normal, precision=_PREC) - offset
    cur_in = d_cur <= tol
    nxt_in = d_nxt <= tol
    denom = d_cur - d_nxt
    # Preserve the denominator's SIGN when clamping: replacing a tiny
    # negative denom with +_EPS flips t's sign and emits an intersection
    # vertex far off the edge for edges nearly parallel to the clip plane.
    safe = jnp.where(
        jnp.abs(denom) < _EPS,
        jnp.where(denom < 0, -_EPS, _EPS),
        denom,
    )
    t = d_cur / safe
    inter = cur + t[:, None] * (nxt - cur)

    slot_active = idx < count
    # Per edge, up to 2 outputs: (cur if cur_in), (inter if cur_in != nxt_in).
    emit_cur = cur_in & slot_active
    emit_int = (cur_in != nxt_in) & slot_active

    # Gather-based compaction (TPU-friendly: no scatters). Edge e's emits
    # occupy output slots [start[e], start[e] + n_emit[e]); invert the map
    # with searchsorted over the cumulative counts.
    n_emit = emit_cur.astype(jnp.int32) + emit_int.astype(jnp.int32)
    csum = jnp.cumsum(n_emit)
    start = csum - n_emit
    src_edge = jnp.searchsorted(csum, idx, side="right")  # [MAX_V]
    src_edge = jnp.minimum(src_edge, _MAX_V - 1)
    is_first = idx == start[src_edge]
    take_cur = is_first & emit_cur[src_edge]
    out = jnp.where(take_cur[:, None], cur[src_edge], inter[src_edge])
    new_count = csum[-1]
    out = jnp.where((idx < new_count)[:, None], out, 0.0)
    return out, new_count


def _clipped_face_volume(tri_verts, planes_n, planes_d, ref_point, tol):
    """Clip one triangle against 6 half-spaces; return the signed volume
    contribution of the clipped polygon as a fan of tetrahedra to ref_point.

    tri_verts: [3, 3]. planes: ([6,3], [6]). Signed contribution uses the
    divergence theorem: V = sum over faces of (1/6) (v0-p)·((v1-p)x(v2-p))
    with outward orientation preserved from the input winding.
    """
    verts = jnp.zeros((_MAX_V, 3), tri_verts.dtype).at[:3].set(tri_verts)
    count = jnp.int32(3)

    def body(i, state):
        v, c = state
        return _clip_polygon_by_plane(v, c, planes_n[i], planes_d[i], tol)

    verts, count = jax.lax.fori_loop(0, 6, body, (verts, count))

    # Fan triangulation from vertex 0: triangles (0, i, i+1), i in 1..count-2.
    idx = jnp.arange(_MAX_V)
    valid_tri = (idx >= 1) & (idx + 1 < count)
    v0 = verts[0] - ref_point
    vi = verts - ref_point
    vi1 = verts[jnp.where(idx + 1 >= _MAX_V, 0, idx + 1)] - ref_point
    # The reference's face winding (math_util.py:195-213) is clockwise seen
    # from outside in the camera frame (x right, y down, z forward), so the
    # raw divergence sum is -V; negate to return +V for outward volumes.
    contrib = -jnp.sum(v0 * jnp.cross(vi, vi1), axis=-1) / 6.0
    return jnp.sum(jnp.where(valid_tri, contrib, 0.0))


def _pair_intersection_volume(corners_a, corners_b):
    """Intersection volume of two boxes given [8,3] corners each."""
    na, da = box_planes(corners_a)
    nb, db = box_planes(corners_b)
    ref = 0.5 * (jnp.mean(corners_a, axis=0) + jnp.mean(corners_b, axis=0))
    # Coplanar-face tie-break: A's faces are kept inclusively (+tol) and B's
    # exclusively (-tol), so a shared/coplanar boundary patch is counted once
    # (pytorch3d's kernel uses the same eps convention; without it, identical
    # boxes would double-count to 2V). tol scales with the pair's extent.
    extent = jnp.max(jnp.abs(jnp.concatenate([corners_a, corners_b])))
    tol = 1e-5 * jnp.maximum(extent, 1.0)

    def surface_volume(corners, pn, pd, tol):
        tris = corners[CUBOID_FACES]  # [12, 3, 3]
        vols = jax.vmap(
            lambda t: _clipped_face_volume(t, pn, pd, ref, tol)
        )(tris)
        return jnp.sum(vols)

    # A's surface clipped by B + B's surface clipped by A closes the
    # intersection polytope; orientation of the reference faces is outward
    # (reference math_util.py faces winding), so the divergence sum is +V.
    v = (surface_volume(corners_a, nb, db, tol)
         + surface_volume(corners_b, na, da, -tol))
    return jnp.maximum(v, 0.0)


@jax.jit
def pairwise_iou3d(corners1: jax.Array, corners2: jax.Array):
    """Exact pairwise 3D IoU.

    Args:
      corners1: [N, 8, 3]; corners2: [M, 8, 3] — cuboid corners in the
        reference's vertex order (utils.geometry.cuboid_corners).
    Returns:
      (vol [N, M] intersection volumes, iou [N, M]).
    """
    vol_fn = jax.vmap(
        jax.vmap(_pair_intersection_volume, in_axes=(None, 0)), in_axes=(0, None)
    )
    inter = vol_fn(corners1, corners2)
    v1 = box_volume(corners1)[:, None]
    v2 = box_volume(corners2)[None, :]
    union = v1 + v2 - inter
    iou = jnp.where(union > _EPS, inter / jnp.maximum(union, _EPS), 0.0)
    return inter, jnp.clip(iou, 0.0, 1.0)


@partial(jax.jit, static_argnames=())
def matched_iou3d(corners1: jax.Array, corners2: jax.Array) -> jax.Array:
    """Elementwise 3D IoU of aligned pairs: [N, 8, 3] x [N, 8, 3] -> [N]."""
    inter = jax.vmap(_pair_intersection_volume)(corners1, corners2)
    union = box_volume(corners1) + box_volume(corners2) - inter
    return jnp.clip(
        jnp.where(union > _EPS, inter / jnp.maximum(union, _EPS), 0.0), 0.0, 1.0
    )

"""Pairwise 2D box overlap ops (pure JAX, fixed-shape).

TPU-native replacements for detectron2's pairwise_iou / pairwise_ioa and the
reference's numpy/torch `iou`/`intersect` helpers (math_util.py:850-966).
Boxes are XYXY, [..., N, 4]. All ops are O(N*M) dense — ideal for the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7


def box_area(boxes: jax.Array) -> jax.Array:
    """[..., N, 4] -> [..., N]. Degenerate boxes get area 0."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def pairwise_intersection(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Intersection areas; boxes1 [..., N, 4] x boxes2 [..., M, 4] -> [..., N, M]."""
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Intersection-over-union [..., N, M]."""
    inter = pairwise_intersection(boxes1, boxes2)
    a1 = box_area(boxes1)[..., :, None]
    a2 = box_area(boxes2)[..., None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, _EPS), 0.0)


def pairwise_ioa(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Intersection-over-area-of-boxes2: [..., N, M].

    Matches detectron2.pairwise_ioa semantics used for ignore-region handling
    (reference rpn.py:93-105): result[n, m] = inter(b1[n], b2[m]) / area(b2[m]).
    """
    inter = pairwise_intersection(boxes1, boxes2)
    a2 = box_area(boxes2)[..., None, :]
    return jnp.where(a2 > 0, inter / jnp.maximum(a2, _EPS), 0.0)


def matched_iou(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Elementwise IoU of aligned box pairs: [..., N, 4] x [..., N, 4] -> [..., N].

    Reference: matched_pairwise_iou (rpn.py:330-354)."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes1) + box_area(boxes2) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, _EPS), 0.0)


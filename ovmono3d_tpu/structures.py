"""Fixed-shape detection pytrees — the XLA-native `Instances` replacement.

The reference threads detectron2 `Instances`/`Boxes` (dynamic per-image
lists) through the model; under XLA everything must be padded + masked
(SURVEY.md §7.1). One registered dataclass pytree carries boxes, scores,
classes, 3D fields and a validity mask with static leading dims [B, N].
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Boxes2D:
    """Padded 2D boxes. xyxy: [..., N, 4]; valid: [..., N] bool."""

    xyxy: jax.Array
    valid: jax.Array

    @property
    def centers(self) -> jax.Array:
        return 0.5 * (self.xyxy[..., :2] + self.xyxy[..., 2:])

    @property
    def widths(self) -> jax.Array:
        return self.xyxy[..., 2] - self.xyxy[..., 0]

    @property
    def heights(self) -> jax.Array:
        return self.xyxy[..., 3] - self.xyxy[..., 1]

    def clip(self, h: float | jax.Array, w: float | jax.Array) -> "Boxes2D":
        x1 = jnp.clip(self.xyxy[..., 0], 0, w)
        y1 = jnp.clip(self.xyxy[..., 1], 0, h)
        x2 = jnp.clip(self.xyxy[..., 2], 0, w)
        y2 = jnp.clip(self.xyxy[..., 3], 0, h)
        return Boxes2D(jnp.stack([x1, y1, x2, y2], axis=-1), self.valid)

    def nonempty(self, threshold: float = 0.0) -> jax.Array:
        return (self.widths > threshold) & (self.heights > threshold)


@struct.dataclass
class Detections:
    """Padded per-image detections, 2D + 3D.

    All arrays share leading dims [..., N]. Invalid slots hold zeros.
    Mirrors the reference's final Instances fields (roi_heads.py:820-843):
    pred_boxes/scores/pred_classes + pred_bbox3D (corners), pred_center_cam,
    pred_center_2D, pred_dimensions, pred_pose.
    """

    boxes: jax.Array          # [..., N, 4] xyxy (original-image coords)
    scores: jax.Array         # [..., N]
    classes: jax.Array        # [..., N] int32
    valid: jax.Array          # [..., N] bool
    scores_full: jax.Array | None = None   # [..., N, C] (fast_rcnn extra)
    center_cam: jax.Array | None = None    # [..., N, 3]
    center_2d: jax.Array | None = None     # [..., N, 2]
    dimensions: jax.Array | None = None    # [..., N, 3] (w, h, l)
    pose: jax.Array | None = None          # [..., N, 3, 3]
    corners3d: jax.Array | None = None     # [..., N, 8, 3]

    @property
    def num_slots(self) -> int:
        return self.boxes.shape[-2]


@struct.dataclass
class GroundTruth:
    """Padded per-image ground truth for training.

    gt_boxes3d layout matches the reference's gt_boxes3D
    (dataset_mapper.py:171-193): [u, v, z, w, h, l, X, Y, Z] where (u, v) is
    the projected 3D center in network-input pixels, z the metric depth,
    (w, h, l) the dimensions and (X, Y, Z) the camera-space center.
    """

    boxes: jax.Array          # [..., M, 4] xyxy 2D boxes (input coords)
    classes: jax.Array        # [..., M] int32 (-1 = ignore region)
    boxes3d: jax.Array        # [..., M, 9]
    poses: jax.Array          # [..., M, 3, 3]
    valid: jax.Array          # [..., M] bool


def concatenate(dets: list[Detections], axis: int = -2) -> Detections:
    """Concatenate along the N axis (fields that are present in all)."""
    def cat(*xs):
        if any(x is None for x in xs):
            return None
        return jnp.concatenate(xs, axis=axis)

    return jax.tree.map(cat, *dets, is_leaf=lambda x: x is None)


def take(det: Detections, idx: jax.Array, valid: jax.Array) -> Detections:
    """Gather detection slots by index (e.g. post-NMS top-k), re-masking."""

    def g(x):
        if x is None:
            return None
        return jnp.take(x, idx, axis=0)

    out = jax.tree.map(g, det, is_leaf=lambda x: x is None)
    return out.replace(valid=out.valid & valid)

"""Anchor generation, box delta transforms, and IoU matching/subsampling.

TPU-native equivalents of detectron2's DefaultAnchorGenerator,
Box2BoxTransform, Matcher and subsample_labels as specialized by the
reference's RPNWithIgnore (cubercnn/modeling/proposal_generator/rpn.py;
SURVEY.md §2.1 #6): ignore regions via IoA, best-GT force-positive,
IoU-weighted multinomial subsampling, IoUness objectness targets.
Everything is fixed-shape and jittable.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ovmono3d_tpu.ops.iou2d import pairwise_ioa, pairwise_iou


def generate_anchors(
    feat_hw: tuple[int, int],
    stride: int,
    sizes: tuple[float, ...],
    aspect_ratios: tuple[float, ...],
    offset: float = 0.0,
) -> jax.Array:
    """Dense anchors for one feature level: [H*W*A, 4] xyxy (image coords).

    Matches detectron2 DefaultAnchorGenerator: cell anchors of area size^2
    with w/h ratio r, centered on (x + offset) * stride.
    """
    cell = []
    for size in sizes:
        area = size * size
        for r in aspect_ratios:
            w = math.sqrt(area / r)
            h = w * r
            cell.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    cell = jnp.asarray(cell, jnp.float32)  # [A, 4]
    h, w = feat_hw
    shift_x = (jnp.arange(w, dtype=jnp.float32) + offset) * stride
    shift_y = (jnp.arange(h, dtype=jnp.float32) + offset) * stride
    sx, sy = jnp.meshgrid(shift_x, shift_y)  # [H, W]
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    anchors = shifts + cell[None, :, :]  # [H*W, A, 4]
    return anchors.reshape(-1, 4)


def apply_deltas(
    deltas: jax.Array,
    boxes: jax.Array,
    weights: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
    scale_clamp: float = math.log(1000.0 / 16),
) -> jax.Array:
    """Box2BoxTransform.apply_deltas: (dx, dy, dw, dh) -> xyxy."""
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, scale_clamp)
    dh = jnp.minimum(deltas[..., 3] / wh, scale_clamp)
    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights
    return jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w,
            pred_ctr_y + 0.5 * pred_h,
        ],
        axis=-1,
    )


def get_deltas(
    src_boxes: jax.Array,
    target_boxes: jax.Array,
    weights: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jax.Array:
    """Box2BoxTransform.get_deltas: regression targets src -> target."""
    src_w = src_boxes[..., 2] - src_boxes[..., 0]
    src_h = src_boxes[..., 3] - src_boxes[..., 1]
    src_cx = src_boxes[..., 0] + 0.5 * src_w
    src_cy = src_boxes[..., 1] + 0.5 * src_h
    tgt_w = jnp.maximum(target_boxes[..., 2] - target_boxes[..., 0], 1e-4)
    tgt_h = jnp.maximum(target_boxes[..., 3] - target_boxes[..., 1], 1e-4)
    tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
    tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h
    wx, wy, ww, wh = weights
    src_w = jnp.maximum(src_w, 1e-4)
    src_h = jnp.maximum(src_h, 1e-4)
    return jnp.stack(
        [
            wx * (tgt_cx - src_cx) / src_w,
            wy * (tgt_cy - src_cy) / src_h,
            ww * jnp.log(tgt_w / src_w),
            wh * jnp.log(tgt_h / src_h),
        ],
        axis=-1,
    )


def match_anchors(
    anchors: jax.Array,
    gt_boxes: jax.Array,
    gt_valid: jax.Array,
    thresholds: tuple[float, float],
    allow_low_quality: bool = True,
):
    """detectron2 Matcher semantics with (lo, hi) thresholds and labels
    (0, -1, 1); invalid GT rows are excluded.

    Returns (matched_idx [N], labels [N] in {-1, 0, 1}, matched_iou [N],
    iou [M, N] — the masked quality matrix, so callers needing per-GT
    argmax logic reuse it instead of rebuilding the O(M*N) matrix).
    Label 1 = positive (iou >= hi), 0 = negative (iou < lo), -1 = ignore.
    `allow_low_quality`: anchors that are the argmax for some GT are forced
    positive (reference rpn.py:71-84 uses its own variant of this).
    """
    iou = pairwise_iou(gt_boxes, anchors)  # [M, N]
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    matched_iou = jnp.max(iou, axis=0)
    matched_idx = jnp.argmax(iou, axis=0)

    lo, hi = thresholds
    labels = jnp.where(matched_iou >= hi, 1, -1)
    labels = jnp.where(matched_iou < lo, 0, labels)

    if allow_low_quality:
        # For each valid gt, its best anchor(s) become positive.
        best_per_gt = jnp.max(iou, axis=1, keepdims=True)  # [M, 1]
        is_best = (iou >= best_per_gt - 1e-7) & (best_per_gt > 0) & gt_valid[:, None]
        force_pos = jnp.any(is_best, axis=0)
        labels = jnp.where(force_pos, 1, labels)

    matched_iou = jnp.maximum(matched_iou, 0.0)
    return matched_idx, labels, matched_iou, iou


def subsample_labels(
    key: jax.Array,
    labels: jax.Array,
    num_samples: int,
    positive_fraction: float,
    matched_ious: jax.Array | None = None,
):
    """Random (optionally IoU-weighted) subsampling of pos/neg labels.

    Fixed-shape version of the reference's subsample_labels
    (rpn.py:275-328): picks up to num_samples * positive_fraction positives
    (weighted by matched IoU when given — "IoU-weighted multinomial") and
    fills the rest with negatives. Returns a weight mask [N] float: 1.0 for
    sampled anchors, 0.0 otherwise (callers use it as a loss mask rather than
    index lists, keeping shapes static).
    """
    k_pos, k_neg = jax.random.split(key)
    positive = labels == 1
    negative = labels == 0

    num_pos_target = int(num_samples * positive_fraction)

    def sample(k, mask, weights, count):
        # Gumbel-top-k trick == weighted sampling without replacement.
        gumbel = -jnp.log(-jnp.log(
            jax.random.uniform(k, mask.shape, minval=1e-10, maxval=1.0)
        ))
        logw = jnp.where(mask, jnp.log(jnp.maximum(weights, 1e-9)), -jnp.inf)
        score = logw + gumbel
        thresh_idx = jnp.argsort(-score)
        ranks = jnp.zeros_like(thresh_idx).at[thresh_idx].set(
            jnp.arange(mask.shape[0])
        )
        avail = jnp.sum(mask)
        return (ranks < jnp.minimum(count, avail)) & mask

    # Both positives AND negatives are weighted by matched IoU + 1e-4 when
    # IoUs are given (rpn.py:315-325: multinomial(matched_ious[...] + eps)
    # for perm1 and perm2) — hard-negative bias, not uniform.
    if matched_ious is not None:
        w = matched_ious + 1e-4
    else:
        w = jnp.ones_like(labels, jnp.float32)
    pos_sampled = sample(k_pos, positive, w, num_pos_target)
    num_pos = jnp.sum(pos_sampled)
    num_neg_target = num_samples - num_pos
    neg_sampled = sample(k_neg, negative, w, num_neg_target)
    return pos_sampled, neg_sampled


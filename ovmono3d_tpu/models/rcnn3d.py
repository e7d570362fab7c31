"""RCNN3D meta-architecture: backbone+SFP -> RPN -> 2D box head -> cube head.

TPU-native re-design of the reference meta-arch
(cubercnn/modeling/meta_arch/rcnn3d.py + roi_heads/roi_heads.py +
proposal_generator/rpn.py — SURVEY.md §2.1 #1-#6): one fixed-shape, jittable
forward for training (returns the loss dict) and inference (returns padded
`Detections`), plus the oracle-2D bypass used by the reference's evaluation
protocol (roi_heads.py:232-243).

Design: parameterized heads are invoked ONCE on [B*N, ...]-flattened tensors
(linen modules can't be vmapped ad hoc); all per-image logic (anchor
labeling, proposal NMS, per-class inference NMS) is pure and vmapped.

Batch contract (all static shapes):
  image           [B, S, S, 3] f32 RGB 0..255 (padded square, S = square_pad)
  K               [B, 3, 3]   original-image intrinsics
  im_hw           [B, 2]      valid (unpadded) network-input height/width
  im_scale_ratio  [B]         original / network-input scale factor
  depth           [B, hd, wd, 1] optional prompt depth
  (train) gt      GroundTruth pytree, padded to M slots per image
  (oracle) oracle_boxes/classes/scores/valid: [B, N, ...] given 2D boxes
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ovmono3d_tpu.config import ModelConfig
from ovmono3d_tpu.models.backbones import build_backbone
from ovmono3d_tpu.models.heads import CubeHead, FastRCNNHead, RPNHead
from ovmono3d_tpu.ops import boxes as box_ops
from ovmono3d_tpu.ops.iou2d import pairwise_ioa, pairwise_iou
from ovmono3d_tpu.ops.nms import batched_nms_mask
from ovmono3d_tpu.ops.roi_align import multilevel_roi_align
from ovmono3d_tpu.structures import Detections, GroundTruth
from ovmono3d_tpu.utils import geometry as geom

SQRT_2 = 1.4142135623730951


# ---------------------------------------------------------------------------
# Pure helpers (vmapped per image)
# ---------------------------------------------------------------------------

def smooth_l1(pred, target, beta: float = 0.0):
    diff = jnp.abs(pred - target)
    if beta <= 0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)


def rpn_proposals_single(
    logits: jax.Array,        # [R] concat over levels
    deltas: jax.Array,        # [R, 4]
    anchors: jax.Array,       # [R, 4]
    level_sizes: tuple[int, ...],
    im_hw: jax.Array,
    pre_nms_topk: int,
    post_nms_topk: int,
    nms_thresh: float,
    min_box_size: float,
):
    """detectron2 find_top_rpn_proposals semantics, fixed-shape:
    per-level top-k -> decode -> clip -> per-level NMS -> global top-k by
    score.

    NMS runs INDEPENDENTLY per level: the reference's level-offset
    batched_nms means boxes from different levels never suppress each
    other, so K separate k^2 problems are bit-identical to one (K*k)^2
    problem at a third of the IoU-matrix/fixpoint cost (the joint matrix
    profiled ~25 ms of the b8 train step)."""
    from ovmono3d_tpu.ops.nms import nms_mask_parallel

    h, w = im_hw[0], im_hw[1]
    sel_boxes, sel_scores, sel_keep = [], [], []
    start = 0
    for size in level_sizes:
        k = min(pre_nms_topk, size)
        lg = jax.lax.dynamic_slice_in_dim(logits, start, size)
        ld = jax.lax.dynamic_slice_in_dim(deltas, start, size)
        la = jax.lax.dynamic_slice_in_dim(anchors, start, size)
        s, idx = jax.lax.top_k(lg, k)
        b = box_ops.apply_deltas(ld[idx], la[idx])
        b = jnp.stack(
            [
                jnp.clip(b[:, 0], 0, w),
                jnp.clip(b[:, 1], 0, h),
                jnp.clip(b[:, 2], 0, w),
                jnp.clip(b[:, 3], 0, h),
            ],
            axis=-1,
        )
        v = (
            (b[:, 2] - b[:, 0] > min_box_size)
            & (b[:, 3] - b[:, 1] > min_box_size)
            & jnp.all(jnp.isfinite(b), axis=-1)
            & jnp.isfinite(s)
        )
        sel_boxes.append(b)
        sel_scores.append(s)
        sel_keep.append(nms_mask_parallel(b, s, nms_thresh, v))
        start += size
    boxes = jnp.concatenate(sel_boxes)
    scores = jnp.concatenate(sel_scores)
    keep = jnp.concatenate(sel_keep)

    neg_inf = jnp.finfo(scores.dtype).min
    masked = jnp.where(keep, scores, neg_inf)
    top_scores, idx = jax.lax.top_k(masked, post_nms_topk)
    return boxes[idx], top_scores, top_scores > neg_inf


def fast_rcnn_inference_single(
    boxes_per_class: jax.Array,  # [N, C, 4]
    scores: jax.Array,           # [N, C] softmax probs (no bg column)
    prop_valid: jax.Array,       # [N]
    im_hw: jax.Array,
    score_thresh: float,
    nms_thresh: float,
    topk: int,
):
    """fast_rcnn_inference_single_image (fast_rcnn.py:57-116), fixed-shape.

    The N*C candidate matrix (e.g. 1000 proposals x 50 classes) is first
    reduced to the top `4 * topk` candidates by score — the reference's
    score-threshold filter leaves far fewer, and a candidate outside the top
    few hundred can only enter the final top-`topk` if NMS kills nearly all
    higher-scoring ones; a dense 50k x 50k IoU matrix would need ~20 GB HBM.

    Returns (boxes [K,4], scores [K], classes [K], valid [K], prop_idx [K]).
    """
    n, c = scores.shape
    h, w = im_hw[0], im_hw[1]
    boxes = boxes_per_class.reshape(n * c, 4)
    boxes = jnp.stack(
        [
            jnp.clip(boxes[:, 0], 0, w),
            jnp.clip(boxes[:, 1], 0, h),
            jnp.clip(boxes[:, 2], 0, w),
            jnp.clip(boxes[:, 3], 0, h),
        ],
        axis=-1,
    )
    flat_scores = scores.reshape(n * c)
    classes = jnp.tile(jnp.arange(c, dtype=jnp.int32), (n,))
    prop_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), c)
    valid = (
        (flat_scores > score_thresh)
        & jnp.repeat(prop_valid, c)
        & jnp.all(jnp.isfinite(boxes), axis=-1)
    )
    # Candidate pre-selection before the O(K^2) NMS.
    n_cand = min(max(4 * topk, 256), n * c)
    neg = jnp.finfo(flat_scores.dtype).min
    cand_scores, cand_idx = jax.lax.top_k(
        jnp.where(valid, flat_scores, neg), n_cand
    )
    boxes = boxes[cand_idx]
    flat_scores = flat_scores[cand_idx]
    classes = classes[cand_idx]
    prop_idx = prop_idx[cand_idx]
    valid = valid[cand_idx]
    keep = batched_nms_mask(boxes, flat_scores, classes, nms_thresh, valid)
    neg_inf = jnp.finfo(flat_scores.dtype).min
    masked = jnp.where(keep, flat_scores, neg_inf)
    top_scores, idx = jax.lax.top_k(masked, topk)
    det_valid = top_scores > score_thresh
    return (
        boxes[idx],
        jnp.where(det_valid, top_scores, 0.0),
        classes[idx],
        det_valid,
        prop_idx[idx],
    )


def label_anchors_single(
    key: jax.Array,
    anchors: jax.Array,          # [R, 4]
    gt: GroundTruth,             # one image, M slots
    iou_thresholds: tuple[float, float],
    batch_size: int,
    positive_fraction: float,
    ignore_threshold: float,
):
    """RPNWithIgnore.label_and_sample_anchors for one image (rpn.py:40-110).

    Returns (fg_mask [R] bool sampled positives, matched_gt_boxes [R, 4],
    iou_targets [R]).
    """
    fg_gt = gt.valid & (gt.classes >= 0)
    ign_gt = gt.valid & (gt.classes < 0)

    matched_idx, labels, matched_iou_v, iou_full = box_ops.match_anchors(
        anchors, gt.boxes, fg_gt, iou_thresholds, allow_low_quality=True
    )
    # IoU-weighted subsampling (rpn.py:275-328) with positive_fraction.
    # The negative sample (and the reference's background-inside-ignore
    # IoA pass, rpn.py:93-105) is NOT computed: the IoUness losses are
    # FG-only in the reference too (rpn.py:206-273), so negatives are dead
    # work there as well — see VERDICT/review note.
    pos_sampled, _ = box_ops.subsample_labels(
        key, labels, batch_size, positive_fraction, matched_iou_v
    )
    # The SINGLE best anchor per GT survives sampling (rpn.py:71-84:
    # best_ious_gt_ind from torch .max — FIRST index on exact ties —
    # intersected with anchors the matcher already labeled 1, applied
    # AFTER subsampling). `iou_full` is the matcher's own masked quality
    # matrix (rows of invalid/ignore GTs are -1).
    best_idx = jnp.argmax(iou_full, axis=1)            # [M], first on ties
    gt_has_best = fg_gt & (jnp.max(iou_full, axis=1) > 0)
    force_anchor = jnp.zeros(
        anchors.shape[0], bool
    ).at[best_idx].max(gt_has_best)
    force_pos = force_anchor & (labels == 1)
    fg_mask = pos_sampled | force_pos
    del ign_gt  # ignore regions only affect the (unused) negative sample

    matched_boxes = gt.boxes[matched_idx]
    return fg_mask, matched_boxes, matched_iou_v


def sample_proposals_single(
    key: jax.Array,
    prop_boxes: jax.Array,       # [P, 4] (gt already appended)
    prop_valid: jax.Array,       # [P]
    gt: GroundTruth,
    num_samples: int,
    positive_fraction: float,
    iou_threshold: float,
    ignore_threshold: float,
    num_classes: int,
):
    """ROIHeads3D.label_and_sample_proposals for one image
    (roi_heads.py:850-953), fixed-shape.

    Returns dict with sampled slots [S]: boxes, classes (bg = num_classes),
    fg (bool), valid (bool), gt_idx (matched gt slot).
    """
    fg_gt = gt.valid & (gt.classes >= 0)
    ign_gt = gt.valid & (gt.classes < 0)

    iou = pairwise_iou(gt.boxes, prop_boxes)          # [M, P]
    iou = jnp.where(fg_gt[:, None], iou, -1.0)
    matched_iou_v = jnp.maximum(jnp.max(iou, axis=0), 0.0)
    matched_idx = jnp.argmax(iou, axis=0)

    labels = jnp.where(matched_iou_v >= iou_threshold, 1, 0)
    # Only BACKGROUND proposals inside ignore regions are excluded — the
    # reference applies the IoA override to matched_labels==0 only
    # (roi_heads.py:909-917); a foreground match overlapping an ignore
    # region stays a positive.
    ioa = pairwise_ioa(gt.boxes, prop_boxes)
    ioa = jnp.where(ign_gt[:, None], ioa, 0.0)
    in_ignore = jnp.max(ioa, axis=0) >= ignore_threshold
    labels = jnp.where((in_ignore & (labels == 0)) | ~prop_valid, -1, labels)

    pos_sampled, neg_sampled = box_ops.subsample_labels(
        key, labels, num_samples, positive_fraction, matched_iou_v
    )

    # Compact sampled slots to the front: rank by (pos=2, neg=1, other=0).
    rank = pos_sampled.astype(jnp.int32) * 2 + neg_sampled.astype(jnp.int32)
    # Stable order within class by score-free index: top_k on rank*P - idx.
    p = prop_boxes.shape[0]
    order_score = rank * (p + 1) - jnp.arange(p)
    _, sel = jax.lax.top_k(order_score, num_samples)
    sel_rank = rank[sel]
    valid = sel_rank > 0
    fg = sel_rank == 2

    classes = jnp.where(
        fg, gt.classes[matched_idx[sel]], num_classes
    ).astype(jnp.int32)
    return {
        "boxes": prop_boxes[sel],
        "classes": jnp.where(valid, classes, num_classes),
        "fg": fg,
        "valid": valid,
        "gt_idx": matched_idx[sel],
    }


def decode_cube(
    cfg,
    outputs: dict[str, jax.Array],
    src_boxes: jax.Array,     # [N, 4] input-resolution boxes
    classes: jax.Array,       # [N]
    K_scaled: jax.Array,      # [N, 3, 3] network-resolution intrinsics
    focal: jax.Array,         # [N] original-image fy
    im_h: jax.Array,          # [N] network-input height
    im_ratio: jax.Array,      # [N] original / network scale
    priors_dims: jax.Array | None = None,      # [C, 2, 3]
    priors_z_scales: jax.Array | None = None,  # [C, B] 2D-scale bin centers
    priors_z_stats: jax.Array | None = None,   # [C, B, 2] depth (mean, std)
):
    """Cube head decode -> camera-space cuboids (roi_heads.py:329-848)."""
    n = src_boxes.shape[0]
    idx = jnp.arange(n)

    def percls(x):
        return x[idx, classes] if cfg.dims_priors_enabled else x

    deltas_2d = percls(outputs["deltas_2d"])
    dims_norm = percls(outputs["dims"])
    pose_allo = percls(outputs["pose"])
    uncert = outputs["uncert"]
    if uncert is not None:
        uncert = percls(uncert).reshape(n)

    src_w = src_boxes[:, 2] - src_boxes[:, 0]
    src_h = src_boxes[:, 3] - src_boxes[:, 1]

    # Z selection. With cluster bins the head predicts one z per (bin, class)
    # and the bin is picked by the proposal's 2D scale against the per-class
    # scale cluster centers (roi_heads.py:436-449).
    z_assign = None
    if cfg.cluster_bins > 1:
        assert priors_z_scales is not None, "cluster_bins needs priors"
        src_scale = jnp.sqrt(src_w**2 + src_h**2)
        if cfg.dims_priors_enabled:
            scales = priors_z_scales[classes]                 # [N, B]
            z_all = outputs["z"][idx, :, classes]             # [N, B]
        else:
            scales = jnp.broadcast_to(
                priors_z_scales[0][None], (n, cfg.cluster_bins)
            )
            z_all = outputs["z"]                              # [N, B]
        z_assign = jnp.argmin(
            jnp.abs(scales - src_scale[:, None]), axis=1
        )
        z_raw = jnp.take_along_axis(z_all, z_assign[:, None], axis=1)[:, 0]
    else:
        z_raw = percls(outputs["z"]).reshape(n)

    x = src_boxes[:, 0] + 0.5 * src_w + src_w * deltas_2d[:, 0]
    y = src_boxes[:, 1] + 0.5 * src_h + src_h * deltas_2d[:, 1]

    dims_prior_mean = None
    if cfg.dims_priors_enabled:
        # Assert like the cluster-bins path above: silently decoding
        # prior-relative dims_norm with plain exp would be wrong by the
        # per-class prior mean with no error raised.
        assert priors_dims is not None, "dims_priors_enabled needs priors"
        pd = priors_dims[classes]
        mean, std = pd[:, 0], pd[:, 1]
        dims_prior_mean = mean
        if cfg.dims_priors_func == "sigmoid":
            dims = geom.scaled_sigmoid(
                dims_norm, jnp.clip(mean - 3 * std, 0.0), mean + 3 * std
            )
        else:
            dims = jnp.exp(jnp.clip(dims_norm, max=5)) * mean
    else:
        dims = jnp.exp(jnp.clip(dims_norm, max=5))

    if cfg.allocentric_pose:
        pose = geom.R_from_allocentric(
            K_scaled, pose_allo, jax.lax.stop_gradient(x),
            jax.lax.stop_gradient(y),
        )
    else:
        pose = pose_allo

    if cfg.z_type == "sigmoid":
        z_norm = jax.nn.sigmoid(z_raw)
        z = z_norm * 100.0
    elif cfg.z_type == "log":
        z_norm = z_raw
        z = jnp.exp(z_raw)
    elif cfg.z_type == "clusters":
        # Bounded decode around the assigned cluster's depth statistics
        # (roi_heads.py:525-546): z in [mean-3*std, mean+3*std].
        assert priors_z_stats is not None and z_assign is not None
        if cfg.dims_priors_enabled:
            stats = priors_z_stats[classes]       # [N, B, 2]
        else:
            stats = jnp.broadcast_to(
                priors_z_stats[0][None], (n,) + priors_z_stats[0].shape
            )
        stats = jnp.take_along_axis(
            stats, z_assign[:, None, None].repeat(2, -1), axis=1
        )[:, 0]
        z_mean, z_std = stats[:, 0], stats[:, 1]
        z_norm = z_raw
        z = geom.scaled_sigmoid(
            z_raw, jnp.clip(z_mean - 3 * z_std, 0.0), z_mean + 3 * z_std
        )
    else:  # direct
        z_norm = z_raw
        z = z_raw
    if cfg.z_type != "clusters":
        z_mean = jnp.zeros_like(z)
        z_std = jnp.ones_like(z)

    if cfg.virtual_depth:
        v2r = geom.virtual_to_real_scale(
            focal, im_h * im_ratio, cfg.virtual_focal, im_h
        )
        z = z * v2r
    else:
        v2r = jnp.ones_like(z)

    center_cam = geom.backproject(K_scaled, jnp.stack([x, y], -1), z)
    conf = jnp.exp(-uncert) if uncert is not None else jnp.ones_like(z)
    corners = geom.cuboid_corners(
        jnp.concatenate([center_cam, dims], axis=-1), pose
    )
    return {
        "x": x,
        "y": y,
        "z": z,
        "z_norm": z_norm,
        "dims": dims,
        "dims_norm": dims_norm,
        "pose": pose,
        "pose_allocentric": pose_allo,
        "uncert": uncert,
        "conf": conf,
        "center_cam": center_cam,
        "corners": corners,
        "virtual_to_real": v2r,
        "deltas_2d": deltas_2d,
        "z_mean": z_mean,
        "z_std": z_std,
        # Per-sample prior dim means (None without priors): the entangled
        # dims loss trains dims_norm in PRIOR-NORMALIZED log space
        # (roi_heads.py:645 log(gt/prior)).
        "dims_prior_mean": dims_prior_mean,
    }


def masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean over slots where mask > 0 AND the value is finite
    (safely_reduce_losses, roi_heads.py:956-964)."""
    finite = jnp.isfinite(x)
    w = mask.astype(x.dtype) * finite.astype(x.dtype)
    x = jnp.where(finite, x, 0.0)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def box_head_losses(
    box_cfg,
    num_classes: int,
    scores_logits: jax.Array,
    box_deltas: jax.Array,
    flat_classes: jax.Array,
    flat_valid: jax.Array,
    flat_fg: jax.Array,
    flat_boxes: jax.Array,
    matched_gt_boxes: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Fast R-CNN box-head losses (reference fast_rcnn.py:145-260).

    loss_cls: softmax cross-entropy over ALL sampled proposals, mean
    reduction (fast_rcnn.py:185). loss_reg: smooth-L1 on the per-class
    (or class-agnostic) deltas of FG proposals vs encoded GT deltas,
    summed then normalized by the TOTAL number of proposals R, not the
    FG count (fast_rcnn.py:179, 186-187, 238-243). Padded slots are
    excluded via `flat_valid`; the reference has no padding, so at full
    validity the two reductions coincide.
    """
    log_probs = jax.nn.log_softmax(scores_logits, axis=-1)
    ce = -jnp.take_along_axis(
        log_probs, flat_classes[:, None], axis=-1
    )[:, 0]
    loss_cls = masked_mean(ce, flat_valid)

    reg_targets = box_ops.get_deltas(
        flat_boxes, matched_gt_boxes, box_cfg.bbox_reg_weights
    )
    n, c = flat_classes.shape[0], num_classes
    if box_cfg.cls_agnostic_bbox_reg:
        pred_reg = box_deltas
    else:
        cls_for_reg = jnp.minimum(flat_classes, c - 1)
        pred_reg = jnp.take_along_axis(
            box_deltas.reshape(n, c, 4),
            cls_for_reg[:, None, None].repeat(4, -1),
            axis=1,
        )[:, 0]
    reg_loss = smooth_l1(
        pred_reg, reg_targets, box_cfg.smooth_l1_beta
    ).sum(-1)
    fg_f = flat_fg.astype(jnp.float32)
    loss_reg = jnp.sum(reg_loss * fg_f) / jnp.maximum(
        jnp.sum(flat_valid), 1.0
    )
    return loss_cls, loss_reg


def cube_losses(
    cfg,
    dec: dict[str, jax.Array],
    gt_boxes3d: jax.Array,   # [N, 9] (u, v, z, w, h, l, X, Y, Z)
    gt_poses: jax.Array,     # [N, 3, 3]
    K_scaled: jax.Array,     # [N, 3, 3]
    fg_mask: jax.Array,      # [N] 1.0 = supervised slot
    src_boxes: jax.Array | None = None,  # [N, 4] (non-disentangled xy loss)
):
    """Cube losses, fixed-shape, masked-mean reduced over fg slots.

    Disentangled corner losses (roi_heads.py:551-627) by default; the
    non-disentangled variants (roi_heads.py:630-673: delta/log-space l1 +
    `1 - so3_relative_angle` pose loss) when cfg.disentangled_loss=False.
    """
    gt_2d = gt_boxes3d[:, :2]
    gt_z = gt_boxes3d[:, 2]
    gt_dims = gt_boxes3d[:, 3:6]

    gt_center = geom.backproject(K_scaled, gt_2d, gt_z)
    gt_box3d = jnp.concatenate([gt_center, gt_dims], axis=-1)
    gt_corners = geom.cuboid_corners(gt_box3d, gt_poses)

    def corner_l1(pred_corners):
        d = jnp.abs(pred_corners - gt_corners)
        return d.reshape(d.shape[0], -1).mean(axis=1)

    if cfg.disentangled_loss:
        z_center = geom.backproject(K_scaled, gt_2d, dec["z"])
        loss_z = corner_l1(
            geom.cuboid_corners(
                jnp.concatenate([z_center, gt_dims], -1), gt_poses
            )
        )
        xy_center = geom.backproject(
            K_scaled, jnp.stack([dec["x"], dec["y"]], -1), gt_z
        )
        loss_xy = corner_l1(
            geom.cuboid_corners(
                jnp.concatenate([xy_center, gt_dims], -1), gt_poses
            )
        )
        loss_dims = corner_l1(
            geom.cuboid_corners(
                jnp.concatenate([gt_center, dec["dims"]], -1), gt_poses
            )
        )
        pose_corners = geom.cuboid_corners(gt_box3d, dec["pose"])
        if cfg.chamfer_pose:
            loss_pose = geom.chamfer_corner_distance(pose_corners, gt_corners)
        else:
            loss_pose = corner_l1(pose_corners)
    else:
        # XY: l1 on normalized deltas vs GT deltas (roi_heads.py:637-641).
        assert src_boxes is not None
        src_w = jnp.maximum(src_boxes[:, 2] - src_boxes[:, 0], 1e-4)
        src_h = jnp.maximum(src_boxes[:, 3] - src_boxes[:, 1], 1e-4)
        src_cx = src_boxes[:, 0] + 0.5 * src_w
        src_cy = src_boxes[:, 1] + 0.5 * src_h
        gt_deltas = jnp.stack(
            [(gt_2d[:, 0] - src_cx) / src_w, (gt_2d[:, 1] - src_cy) / src_h],
            axis=-1,
        )
        loss_xy = jnp.abs(dec["deltas_2d"] - gt_deltas).mean(-1)
        # Dims: log-space l1; with priors the target is PRIOR-NORMALIZED
        # log(gt/prior) (roi_heads.py:644-649 cube_dims_gt_normspace) —
        # dims_norm decodes as exp(.)*prior_mean, so the plain log(gt)
        # target would converge wrong by the per-class prior mean.
        gt_dims_safe = jnp.maximum(gt_dims, 1e-4)
        if cfg.dims_priors_enabled and dec.get("dims_prior_mean") is not None:
            dims_target = jnp.log(
                gt_dims_safe / jnp.maximum(dec["dims_prior_mean"], 1e-4)
            )
        else:
            dims_target = jnp.log(gt_dims_safe)
        loss_dims = jnp.abs(dec["dims_norm"] - dims_target).mean(-1)
        # Pose: 1 - cos(relative angle) in allocentric space
        # (roi_heads.py:652-657).
        from ovmono3d_tpu.ops.rotation import so3_relative_angle

        if cfg.allocentric_pose:
            gt_allo = geom.R_to_allocentric(
                K_scaled, gt_poses, jax.lax.stop_gradient(dec["x"]),
                jax.lax.stop_gradient(dec["y"]),
            )
            loss_pose = 1.0 - so3_relative_angle(
                dec["pose_allocentric"], gt_allo, eps=0.1, cos_angle=True
            )
        else:
            loss_pose = 1.0 - so3_relative_angle(
                dec["pose"], gt_poses, eps=0.1, cos_angle=True
            )
        # Z per z_type (roi_heads.py:663-673).
        r2v = 1.0 / jnp.maximum(dec["virtual_to_real"], 1e-8)
        if cfg.z_type == "sigmoid":
            loss_z = jnp.abs(
                dec["z_norm"] - jnp.clip(gt_z * r2v / 100.0, 0, 1)
            )
        elif cfg.z_type == "log":
            loss_z = jnp.abs(
                dec["z_norm"] - jnp.log(jnp.clip(gt_z * r2v, 0.01))
            )
        elif cfg.z_type == "clusters":
            # l1 between the RAW prediction and the cluster-standardized
            # virtual-z target (roi_heads.py:672-673).
            loss_z = jnp.abs(
                dec["z_norm"]
                - (gt_z * r2v - dec["z_mean"])
                / jnp.maximum(dec["z_std"], 1e-8)
            )
        else:  # direct
            loss_z = jnp.abs(dec["z"] - gt_z)

    losses = {
        "loss_xy": loss_xy,
        "loss_z": loss_z,
        "loss_dims": loss_dims,
        "loss_pose": loss_pose,
    }
    if cfg.loss_w_joint > 0:
        joint_center = geom.backproject(
            K_scaled, jnp.stack([dec["x"], dec["y"]], -1), dec["z"]
        )
        joint_corners = geom.cuboid_corners(
            jnp.concatenate([joint_center, dec["dims"]], -1), dec["pose"]
        )
        if cfg.chamfer_pose and cfg.disentangled_loss:
            losses["loss_joint"] = geom.chamfer_corner_distance(
                joint_corners, gt_corners
            )
        else:
            losses["loss_joint"] = corner_l1(joint_corners)

    if cfg.inverse_z_weight:
        inv_w = 1.0 / jnp.log(jnp.clip(gt_z, jnp.e))
        losses = {k: v * inv_w for k, v in losses.items()}

    out = {}
    weights = {
        "loss_xy": cfg.loss_w_xy,
        "loss_z": cfg.loss_w_z,
        "loss_dims": cfg.loss_w_dims,
        "loss_pose": cfg.loss_w_pose,
        "loss_joint": cfg.loss_w_joint,
    }
    uncert_sf = 1.0
    if cfg.use_confidence > 0 and dec["uncert"] is not None:
        uncert_sf = SQRT_2 * jnp.exp(-dec["uncert"])
        out["loss_uncert"] = cfg.use_confidence * masked_mean(
            dec["uncert"], fg_mask
        )
    for k, v in losses.items():
        out[k] = (
            masked_mean(v * uncert_sf, fg_mask) * weights[k] * cfg.loss_w_3d
        )
    return out


# ---------------------------------------------------------------------------
# Meta-architecture
# ---------------------------------------------------------------------------

class RCNN3D(nn.Module):
    """Full model. See module docstring for the batch contract.

    `priors` (optional): dict from utils.priors.compute_priors with keys
    dims [C,2,3], z_scales [C,B], z_stats [C,B,2] — baked as constants into
    the decode (the reference injects them as frozen nn.Parameters,
    roi_heads.py:117-143).
    """

    cfg: ModelConfig
    priors: dict | None = None

    def setup(self):
        self.backbone = build_backbone(self.cfg.backbone)
        num_anchors = len(self.cfg.anchors.aspect_ratios) * len(
            self.cfg.anchors.sizes[0]
        )
        self.rpn_head = RPNHead(
            num_anchors=num_anchors,
            conv_dim=self.cfg.backbone.out_channels,
            name="rpn_head",
        )
        self.box_head = FastRCNNHead(
            num_classes=self.cfg.num_classes,
            num_fc=self.cfg.roi_box.num_fc,
            fc_dim=self.cfg.roi_box.fc_dim,
            cls_agnostic_bbox_reg=self.cfg.roi_box.cls_agnostic_bbox_reg,
            name="box_head",
        )
        cube = self.cfg.cube
        self.cube_head = CubeHead(
            num_classes=self.cfg.num_classes,
            num_conv=cube.num_conv,
            conv_dim=cube.conv_dim,
            num_fc=cube.num_fc,
            fc_dim=cube.fc_dim,
            shared_fc=cube.shared_fc,
            z_type=cube.z_type,
            pose_type=cube.pose_type,
            cluster_bins=cube.cluster_bins,
            dims_priors_enabled=cube.dims_priors_enabled,
            use_confidence=cube.use_confidence,
            name="cube_head",
        )

    # -- shared stages ------------------------------------------------------

    def preprocess(self, image: jax.Array) -> jax.Array:
        mean = jnp.asarray(self.cfg.pixel_mean)
        std = jnp.asarray(self.cfg.pixel_std)
        return (image - mean) / std

    def features(self, image, depth=None):
        # Trunk freezing is handled by the optimizer mask
        # (train.optim.freeze_backbone_mask), not here.
        return self.backbone(self.preprocess(image), depth)

    @property
    def feature_strides(self) -> list[int]:
        names = list(self.cfg.rpn.in_features)
        all_names = self.backbone.feature_names
        all_strides = self.backbone.strides
        return [all_strides[all_names.index(n)] for n in names]

    def _feature_maps(self, feats):
        return [feats[n] for n in self.cfg.rpn.in_features]

    def _anchors(self, feats):
        strides = self.feature_strides
        anchors = []
        for i, name in enumerate(self.cfg.rpn.in_features):
            h, w = feats[name].shape[1:3]
            anchors.append(
                box_ops.generate_anchors(
                    (h, w),
                    strides[i],
                    self.cfg.anchors.sizes[i],
                    self.cfg.anchors.aspect_ratios,
                    self.cfg.anchors.offset,
                )
            )
        return anchors

    def _pool_flat(self, feats, boxes, resolution, sampling_ratio):
        """ROIAlign [B, N, 4] boxes over batched maps -> [B*N, R, R, C]."""
        maps = self._feature_maps(feats)
        strides = self.feature_strides
        # Pool in bf16: numerically ~equivalent to the f32 path on TPU
        # (DEFAULT f32 matmuls round inputs to bf16 anyway; accumulation
        # stays f32 via preferred_element_type) and every consumer is a
        # bf16 head — but the [B*N, R, W, C] separable-matmul intermediate
        # (3.75 GB f32 on the 128^2 level at b8x512 train shapes, an
        # ~11 ms layout copy in the step profile) halves. For
        # reference-exact parity evaluation, model.exact_roi_pool=True
        # restores the op's torchvision-exact f32/HIGHEST default
        # (PARITY.md "ROI pooling numerics").
        exact = getattr(self.cfg, "exact_roi_pool", False)
        if not exact:
            maps = [m.astype(jnp.bfloat16) for m in maps]

        def pool_one(boxes_i, *maps_i):
            # DEFAULT (single bf16-pass) matmuls: the pooled features feed
            # bf16 FC heads, so HIGHEST's 6-pass f32 contraction buys no
            # end-to-end accuracy here and costs ~25% of the train step
            # (the [N,7,H]x[H,W,256] pooling einsums dominate at b8/896^2).
            return multilevel_roi_align(
                list(maps_i), strides, boxes_i, resolution, sampling_ratio,
                precision=(jax.lax.Precision.HIGHEST if exact
                           else jax.lax.Precision.DEFAULT),
            )

        pooled = jax.vmap(pool_one)(boxes, *maps)  # [B, N, R, R, C]
        b, n = pooled.shape[:2]
        return pooled.reshape(b * n, *pooled.shape[2:])

    def _camera_per_box(self, K, im_hw, im_ratio, n: int):
        """Per-box camera arrays, flattened [B*n, ...]."""
        K_scaled = K / im_ratio[:, None, None]
        K_scaled = K_scaled.at[:, 2, 2].set(1.0)
        Kb = jnp.repeat(K_scaled, n, axis=0)
        focal = jnp.repeat(K[:, 1, 1], n, axis=0)
        im_h = jnp.repeat(im_hw[:, 0].astype(jnp.float32), n, axis=0)
        ratio = jnp.repeat(im_ratio, n, axis=0)
        return Kb, focal, im_h, ratio

    def _run_cube(self, feats, boxes, classes, K, im_hw, im_ratio,
                  priors_dims=None):
        """Pool + cube head + decode on [B, N] padded boxes; returns the
        decode dict with [B, N, ...] leaves."""
        b, n = boxes.shape[:2]
        cube_cfg = self.cfg.cube
        if cube_cfg.scale_roi_boxes > 0:
            ctr = 0.5 * (boxes[..., :2] + boxes[..., 2:])
            half = 0.5 * (boxes[..., 2:] - boxes[..., :2])
            half = half * cube_cfg.scale_roi_boxes
            boxes_pool = jnp.concatenate([ctr - half, ctr + half], axis=-1)
        else:
            boxes_pool = boxes
        pooled = self._pool_flat(
            feats, boxes_pool, cube_cfg.pooler_resolution,
            cube_cfg.pooler_sampling_ratio,
        )
        outputs = self.cube_head(pooled)
        Kb, focal, im_h, ratio = self._camera_per_box(K, im_hw, im_ratio, n)
        pr = self.priors or {}
        dec = decode_cube(
            cube_cfg, outputs, boxes.reshape(b * n, 4),
            classes.reshape(b * n), Kb, focal, im_h, ratio,
            priors_dims if priors_dims is not None else (
                jnp.asarray(pr["dims"]) if "dims" in pr else None
            ),
            jnp.asarray(pr["z_scales"]) if "z_scales" in pr else None,
            jnp.asarray(pr["z_stats"]) if "z_stats" in pr else None,
        )
        return jax.tree.map(
            lambda x: x.reshape(b, n, *x.shape[1:]) if x is not None else None,
            dec,
            is_leaf=lambda x: x is None,
        ), Kb

    # -- inference ----------------------------------------------------------

    def __call__(
        self,
        image: jax.Array,
        K: jax.Array,
        im_hw: jax.Array,
        im_scale_ratio: jax.Array,
        depth: jax.Array | None = None,
        oracle_boxes: jax.Array | None = None,
        oracle_classes: jax.Array | None = None,
        oracle_scores: jax.Array | None = None,
        oracle_valid: jax.Array | None = None,
    ) -> Detections:
        """Batched inference; with oracle_* given, RPN + box head are skipped
        (reference rcnn3d.py:100-102)."""
        feats = self.features(image, depth)

        if oracle_boxes is not None:
            det_boxes, det_classes = oracle_boxes, oracle_classes.astype(
                jnp.int32
            )
            det_scores, det_valid = oracle_scores, oracle_valid
        else:
            det_boxes, det_scores, det_classes, det_valid = self._detect_2d(
                feats, im_hw
            )

        dec, _ = self._run_cube(
            feats, det_boxes, det_classes, K, im_hw, im_scale_ratio
        )
        fused = jnp.sqrt(jnp.maximum(det_scores * dec["conf"], 0.0))

        ratio = im_scale_ratio[:, None, None]
        return Detections(
            boxes=det_boxes * ratio,
            scores=jnp.where(det_valid, fused, 0.0),
            classes=det_classes,
            valid=det_valid,
            center_cam=dec["center_cam"],
            center_2d=jnp.stack([dec["x"], dec["y"]], -1) * ratio,
            dimensions=dec["dims"],
            pose=dec["pose"],
            corners3d=dec["corners"],
        )

    def _rpn_forward(self, feats):
        maps = self._feature_maps(feats)
        logits, deltas = self.rpn_head(maps)
        anchors = self._anchors(feats)
        level_sizes = tuple(a.shape[0] for a in anchors)
        anchors_cat = jnp.concatenate(anchors)
        logits_cat = jnp.concatenate(logits, axis=1)   # [B, R]
        deltas_cat = jnp.concatenate(deltas, axis=1)   # [B, R, 4]
        return logits_cat, deltas_cat, anchors_cat, level_sizes

    def _detect_2d(self, feats, im_hw):
        rpn_cfg = self.cfg.rpn
        box_cfg = self.cfg.roi_box
        logits, deltas, anchors, level_sizes = self._rpn_forward(
            feats
        )

        prop_boxes, prop_scores, prop_valid = jax.vmap(
            lambda lg, ld, hw: rpn_proposals_single(
                lg, ld, anchors, level_sizes, hw,
                rpn_cfg.pre_nms_topk_test, rpn_cfg.post_nms_topk_test,
                rpn_cfg.nms_thresh, rpn_cfg.min_box_size,
            )
        )(logits, deltas, im_hw.astype(jnp.float32))

        b, p = prop_boxes.shape[:2]
        pooled = self._pool_flat(
            feats, prop_boxes, box_cfg.pooler_resolution,
            box_cfg.pooler_sampling_ratio,
        )
        scores_logits, box_deltas = self.box_head(pooled)
        c = self.cfg.num_classes
        probs = jax.nn.softmax(scores_logits, axis=-1)[:, :-1]
        flat_boxes = prop_boxes.reshape(b * p, 4)
        if box_cfg.cls_agnostic_bbox_reg:
            per_class = jnp.broadcast_to(
                box_ops.apply_deltas(
                    box_deltas, flat_boxes, box_cfg.bbox_reg_weights
                )[:, None, :],
                (b * p, c, 4),
            )
        else:
            per_class = box_ops.apply_deltas(
                box_deltas.reshape(b * p, c, 4),
                jnp.broadcast_to(flat_boxes[:, None, :], (b * p, c, 4)),
                box_cfg.bbox_reg_weights,
            )
        per_class = per_class.reshape(b, p, c, 4)
        probs = probs.reshape(b, p, c)

        det = jax.vmap(
            lambda bx, sc, pv, hw: fast_rcnn_inference_single(
                bx, sc, pv, hw, box_cfg.score_thresh_test,
                box_cfg.nms_thresh_test, self.cfg.max_detections,
            )
        )(per_class, probs, prop_valid, im_hw.astype(jnp.float32))
        d_boxes, d_scores, d_classes, d_valid, _ = det
        return d_boxes, d_scores, d_classes, d_valid

    # -- training -----------------------------------------------------------

    def compute_losses(
        self,
        image: jax.Array,
        K: jax.Array,
        im_hw: jax.Array,
        im_scale_ratio: jax.Array,
        gt: GroundTruth,
        rng: jax.Array,
        depth: jax.Array | None = None,
    ) -> dict[str, jax.Array]:
        """Full training forward -> loss dict (reference train loop hot path,
        SURVEY.md §3.1)."""
        rpn_cfg = self.cfg.rpn
        box_cfg = self.cfg.roi_box
        b = image.shape[0]
        feats = self.features(image, depth)

        logits, deltas, anchors, level_sizes = self._rpn_forward(
            feats
        )

        # --- RPN labeling + IoUness losses (rpn.py:129-273) ---
        rng_anchor, rng_prop = jax.random.split(rng)
        anchor_keys = jax.random.split(rng_anchor, b)
        prop_keys = jax.random.split(rng_prop, b)
        fg_mask, matched_boxes, iou_targets = jax.vmap(
            lambda k, g: label_anchors_single(
                k, anchors, g, rpn_cfg.iou_thresholds,
                rpn_cfg.batch_size_per_image, rpn_cfg.positive_fraction,
                rpn_cfg.ignore_threshold,
            )
        )(anchor_keys, gt)

        fg_f = fg_mask.astype(jnp.float32)
        normalizer = rpn_cfg.batch_size_per_image * b
        # IoUness objectness: BCE(logits, iou) * iou over FG only.
        bce = optax_sigmoid_bce(logits, iou_targets)
        loss_rpn_cls = jnp.sum(bce * iou_targets * fg_f) / normalizer
        # Localization: smooth-l1 on deltas vs matched gt, weighted by iou.
        gt_deltas = box_ops.get_deltas(
            jnp.broadcast_to(anchors, matched_boxes.shape), matched_boxes
        )
        reg = smooth_l1(deltas, gt_deltas).sum(-1)
        loss_rpn_loc = jnp.sum(reg * iou_targets * fg_f) / normalizer

        losses = {
            "rpn/cls": loss_rpn_cls * rpn_cfg.loss_weight,
            "rpn/loc": loss_rpn_loc * rpn_cfg.loss_weight,
        }

        # --- Proposals (train top-k) + append GT ---
        prop_boxes, prop_scores, prop_valid = jax.vmap(
            lambda lg, ld, hw: rpn_proposals_single(
                lg, ld, anchors, level_sizes, hw,
                rpn_cfg.pre_nms_topk_train, rpn_cfg.post_nms_topk_train,
                rpn_cfg.nms_thresh, rpn_cfg.min_box_size,
            )
        )(
            jax.lax.stop_gradient(logits),
            jax.lax.stop_gradient(deltas),
            im_hw.astype(jnp.float32),
        )
        gt_is_fg = gt.valid & (gt.classes >= 0)
        prop_boxes = jnp.concatenate([prop_boxes, gt.boxes], axis=1)
        prop_valid = jnp.concatenate([prop_valid, gt_is_fg], axis=1)

        sampled = jax.vmap(
            lambda k, pb, pv, g: sample_proposals_single(
                k, pb, pv, g, box_cfg.batch_size_per_image,
                box_cfg.positive_fraction, box_cfg.iou_thresholds[0],
                rpn_cfg.ignore_threshold, self.cfg.num_classes,
            )
        )(prop_keys, prop_boxes, prop_valid, gt)

        s = box_cfg.batch_size_per_image
        # --- Box head losses (fast_rcnn.py:145-260) ---
        pooled = self._pool_flat(
            feats, sampled["boxes"], box_cfg.pooler_resolution,
            box_cfg.pooler_sampling_ratio,
        )
        scores_logits, box_deltas = self.box_head(pooled)
        flat_classes = sampled["classes"].reshape(b * s)
        flat_valid = sampled["valid"].reshape(b * s)
        flat_fg = sampled["fg"].reshape(b * s)

        matched_gt_boxes = jnp.take_along_axis(
            gt.boxes, sampled["gt_idx"][..., None], axis=1
        ).reshape(b * s, 4)
        flat_boxes = sampled["boxes"].reshape(b * s, 4)
        loss_cls, loss_reg = box_head_losses(
            box_cfg, self.cfg.num_classes, scores_logits, box_deltas,
            flat_classes, flat_valid, flat_fg, flat_boxes, matched_gt_boxes,
        )
        losses["box/cls"] = loss_cls
        losses["box/reg"] = loss_reg
        fg_f = flat_fg.astype(jnp.float32)

        # --- Cube head on FG sampled proposals (roi_heads.py:329-793) ---
        dec, Kb = self._run_cube(
            feats, sampled["boxes"], sampled["classes"] * flat_fg.reshape(
                b, s
            ).astype(jnp.int32),
            K, im_hw, im_scale_ratio,
        )
        dec_flat = jax.tree.map(
            lambda x: x.reshape(b * s, *x.shape[2:]) if x is not None else None,
            dec,
            is_leaf=lambda x: x is None,
        )
        gt_boxes3d = jnp.take_along_axis(
            gt.boxes3d, sampled["gt_idx"][..., None], axis=1
        ).reshape(b * s, 9)
        gt_poses = jnp.take_along_axis(
            gt.poses, sampled["gt_idx"][..., None, None], axis=1
        ).reshape(b * s, 3, 3)

        cube = cube_losses(
            self.cfg.cube, dec_flat, gt_boxes3d, gt_poses, Kb, fg_f,
            src_boxes=sampled["boxes"].reshape(b * s, 4),
        )
        losses.update({f"cube/{k}": v for k, v in cube.items()})
        return losses


def optax_sigmoid_bce(logits, targets):
    """Numerically-stable binary cross-entropy with logits (delegates to
    optax; oracled vs the reference's F.binary_cross_entropy_with_logits
    in tests/test_reference_oracle.py)."""
    import optax

    return optax.sigmoid_binary_cross_entropy(logits, targets)


def build_model(cfg: ModelConfig, priors: dict | None = None) -> RCNN3D:
    """Factory (reference build_model, rcnn3d.py:252-261); `priors` from
    utils.priors.compute_priors enables dims-priors / cluster-z decodes."""
    return RCNN3D(cfg=cfg, priors=priors)

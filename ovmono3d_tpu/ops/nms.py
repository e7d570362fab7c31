"""Fixed-shape, jittable non-maximum suppression.

TPU-native replacement for torchvision/detectron2 `nms`/`batched_nms`
(reference call sites: fast_rcnn.py:105, roi_heads_gdino.py:254; SURVEY.md
§2.3). CUDA NMS returns a dynamic number of kept indices; under XLA we instead
return a fixed-size keep *mask* (and optionally top-k indices), which callers
thread through padded Detections pytrees.

Algorithm: exact greedy NMS as an O(N) `fori_loop` over score-sorted boxes
with an O(N^2) precomputed IoU matrix — each step suppresses everything
overlapping the current highest survivor. Identical results to the reference's
serial greedy NMS (including the score-order tie behavior of a stable sort).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ovmono3d_tpu.ops.iou2d import pairwise_iou


def nms_mask(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Greedy NMS over one set of boxes.

    Args:
      boxes: [N, 4] XYXY.
      scores: [N].
      iou_threshold: suppress boxes with IoU > threshold vs a kept box
        (strictly greater, matching torchvision).
      valid: optional [N] bool; invalid boxes are never kept.
    Returns:
      keep: [N] bool mask.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    neg_inf = jnp.finfo(scores.dtype).min
    masked_scores = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-masked_scores, stable=True)  # high -> low
    boxes_sorted = boxes[order]
    valid_sorted = valid[order]

    iou = pairwise_iou(boxes_sorted, boxes_sorted)  # [N, N]
    suppress_edge = iou > iou_threshold  # j suppressed by earlier kept i

    def body(i, state):
        keep, alive = state
        is_kept = alive[i] & valid_sorted[i]
        keep = keep.at[i].set(is_kept)
        # If kept, kill all later boxes overlapping it.
        kill = is_kept & suppress_edge[i]
        alive = alive & ~kill
        return keep, alive

    keep_sorted, _ = jax.lax.fori_loop(
        0, n, body, (jnp.zeros((n,), bool), jnp.ones((n,), bool))
    )
    # Scatter back to original order.
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def nms_mask_parallel(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float,
    valid: jax.Array | None = None,
    iters: int = 32,
) -> jax.Array:
    """Greedy NMS via parallel fixpoint iteration — the TPU-fast variant.

    Greedy NMS is the unique fixpoint of
        keep[i] = valid[i] and NOT exists j < i (score order):
                  keep[j] and iou(j, i) > t
    Iterating this dense update from keep = valid converges in at most the
    suppression-chain depth (typically < 10 for detection boxes); each
    iteration is one O(N^2) masked reduction on the VPU instead of N
    sequential steps. `iters` bounds the iteration count; equality with the
    serial greedy algorithm holds whenever the chain depth <= iters (verified
    against `nms_mask` in tests).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    neg_inf = jnp.finfo(scores.dtype).min
    masked_scores = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-masked_scores, stable=True)
    boxes_sorted = boxes[order]
    valid_sorted = valid[order]

    iou = pairwise_iou(boxes_sorted, boxes_sorted)
    # suppress[j, i]: earlier j can suppress later i.
    tri = jnp.triu(jnp.ones((n, n), bool), k=1)
    suppress = (iou > iou_threshold) & tri

    def cond(state):
        i, changed, _ = state
        return changed & (i < iters)

    def body(state):
        i, _, keep = state
        killed = jnp.any(suppress & keep[:, None], axis=0)
        new = valid_sorted & ~killed
        return i + 1, jnp.any(new != keep), new

    # Early-exit at the fixpoint: suppression chains converge in far fewer
    # rounds than the `iters` bound (typically < 10), and each round is a
    # full O(N^2) reduction — the convergence check is O(N) and preserves
    # exactness (once keep stops changing it IS the greedy solution).
    _, _, keep_sorted = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(True), valid_sorted)
    )
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


def batched_nms_mask(
    boxes: jax.Array,
    scores: jax.Array,
    classes: jax.Array,
    iou_threshold: float,
    valid: jax.Array | None = None,
    parallel: bool = True,
) -> jax.Array:
    """Class-aware NMS via the coordinate-offset trick (detectron2
    batched_nms semantics): boxes of different classes never suppress each
    other.

    classes: [N] int. `parallel=True` uses the fixpoint formulation (one
    O(N^2) VPU reduction per iteration) — the right choice on TPU where the
    serial greedy loop would run thousands of sequential steps.
    """
    # Offset each class into a disjoint coordinate range. The span must be
    # computed over FINITE, VALID boxes only: slots below the score
    # threshold carry arbitrary (possibly NaN/Inf under a diverged step)
    # coordinates, and one non-finite value would poison span -> every
    # shifted box NaN -> zero suppression for the whole image.
    ok = jnp.isfinite(boxes).all(axis=-1)
    if valid is not None:
        ok = ok & valid
    safe = jnp.where(ok[:, None], boxes, 0.0)
    span = jnp.max(safe) - jnp.min(safe) + 1.0
    offsets = classes.astype(boxes.dtype) * span
    shifted = safe + offsets[:, None]
    fn = nms_mask_parallel if parallel else nms_mask
    return fn(shifted, scores, iou_threshold, ok)


def topk_after_nms(
    boxes: jax.Array,
    scores: jax.Array,
    keep: jax.Array,
    k: int,
):
    """Select the top-k kept boxes into a fixed-size output.

    Returns (indices [k], valid [k]): indices into the input arrays of the k
    highest-scoring kept boxes; `valid` marks slots actually filled.
    """
    neg_inf = jnp.finfo(scores.dtype).min
    masked = jnp.where(keep, scores, neg_inf)
    top_scores, idx = jax.lax.top_k(masked, k)
    return idx, top_scores > neg_inf

"""ROIAlign (V2 / `aligned=True` semantics) as a batched JAX gather kernel.

TPU-native replacement for detectron2/torchvision's CUDA ROIAlignV2 used by
both the box pooler and cube pooler (reference roi_heads.py:166-171,
POOLER_TYPE 'ROIAlignV2' in configs/Base.yaml; SURVEY.md §2.3).

Design notes (TPU-first):
- All shapes static: N rois x (R x R) bins x (S x S) samples; bilinear
  interpolation is 4 dense gathers + weighted sum, which XLA lowers to
  efficient dynamic-gathers over the [H*W, C] feature table.
- `sampling_ratio=0` in the reference means an adaptive per-roi sample count;
  data-dependent shapes don't jit, so we use a fixed S=2 grid (the value the
  adaptive rule picks for the common ROI sizes at these feature strides).
- Multi-level FPN pooling assigns each box a level with the detectron2
  canonical formula and selects among per-level pooled results with a mask —
  dense compute at every level, no dynamic partitioning.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _interp_matrix(
    coords: jax.Array, size: int, dtype
) -> jax.Array:
    """Bilinear interpolation matrix for sample positions along one axis.

    coords: [N, R, S] continuous positions in feature cells. Returns
    [N, R, size]: row (n, i) holds the mean over the S samples of the
    bilinear hat weights against the integer lattice, with torchvision's
    border semantics (positions in (-1, size) clamp to [0, size-1]; fully
    outside contributes 0).
    """
    oob = (coords < -1.0) | (coords > size)
    c = jnp.clip(coords, 0.0, size - 1.0)
    lattice = jnp.arange(size, dtype=c.dtype)
    # hat weights: [N, R, S, size]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(c[..., None] - lattice))
    w = jnp.where(oob[..., None], 0.0, w)
    return w.mean(axis=2).astype(dtype)  # average the S samples per bin


@partial(jax.jit, static_argnames=(
    "resolution", "sampling_ratio", "stride", "precision"))
def roi_align(
    feat: jax.Array,
    boxes: jax.Array,
    stride: int,
    resolution: int = 7,
    sampling_ratio: int = 2,
    precision: jax.lax.Precision | None = None,
) -> jax.Array:
    """ROIAlignV2 on one feature map — separable-matmul formulation.

    Bilinear sampling on a regular per-box lattice is separable, so the
    whole pool is two dense contractions on the MXU:

        pooled[n, i, j, c] = Ry[n, i, :] @ feat[:, :, c] @ Rx[n, j, :]^T

    with Ry/Rx the per-box bin-averaged interpolation matrices. No gathers —
    the gather formulation costs ~1 ms/box on TPU; this runs the same math
    as ~GFLOP-scale matmuls. Numerics match torchvision ROIAlign
    (aligned=True) including border clamping.

    Args:
      feat: [H, W, C] feature map (channels-last; stride px per cell).
      boxes: [N, 4] XYXY in *image* coordinates.
      stride: feature stride (image px per feature cell).
      resolution: output R (R x R bins).
      sampling_ratio: S samples per bin side (S*S per bin).
      precision: matmul precision for the two contractions. None (default)
        = torchvision-exact: HIGHEST for f32 feats (TPU's default f32
        matmul uses bf16 passes, which would round the interpolation
        weights), DEFAULT for bf16. Hot model paths whose pooled features
        feed bf16 heads pass Precision.DEFAULT explicitly — HIGHEST runs
        the big [N,R,H]x[H,W,C] contraction in 6 passes and cost the train
        step ~25% before rcnn3d.py opted out (round-3 regression).
    Returns:
      [N, R, R, C] pooled features.
    """
    H, W, C = feat.shape
    n = boxes.shape[0]
    R, S = resolution, sampling_ratio
    scale = 1.0 / stride
    # V2 ("aligned=True"): half-pixel offset so that feature cell centers
    # align with the continuous image coordinate model.
    x1 = boxes[:, 0] * scale - 0.5
    y1 = boxes[:, 1] * scale - 0.5
    x2 = boxes[:, 2] * scale - 0.5
    y2 = boxes[:, 3] * scale - 0.5
    bin_w = (x2 - x1) / R  # not clamped to >=1 in V2
    bin_h = (y2 - y1) / R

    bin_idx = jnp.arange(R, dtype=feat.dtype)
    samp_off = (jnp.arange(S, dtype=feat.dtype) + 0.5) / S
    axis_pos = bin_idx[:, None] + samp_off[None, :]  # [R, S] in bin units

    ys = y1[:, None, None] + axis_pos[None] * bin_h[:, None, None]  # [N,R,S]
    xs = x1[:, None, None] + axis_pos[None] * bin_w[:, None, None]

    Ry = _interp_matrix(ys, H, feat.dtype)  # [N, R, H]
    Rx = _interp_matrix(xs, W, feat.dtype)  # [N, R, W]

    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if feat.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
    prec = precision
    t = jnp.einsum(
        "nih,hwc->niwc", Ry, feat, preferred_element_type=jnp.float32,
        precision=prec,
    )
    pooled = jnp.einsum(
        "njw,niwc->nijc", Rx, t.astype(feat.dtype),
        preferred_element_type=jnp.float32, precision=prec,
    )
    return pooled.astype(feat.dtype)


def assign_fpn_levels(
    boxes: jax.Array,
    min_level: int,
    max_level: int,
    canonical_size: float = 224.0,
    canonical_level: int = 4,
) -> jax.Array:
    """detectron2 ROIPooler level assignment: floor(l0 + log2(sqrt(area)/s0)).

    Returns [N] int32 levels clamped to [min_level, max_level].
    """
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0.0
    )
    size = jnp.sqrt(area)
    lvl = jnp.floor(
        canonical_level + jnp.log2(size / canonical_size + 1e-8)
    ).astype(jnp.int32)
    return jnp.clip(lvl, min_level, max_level)


def multilevel_roi_align(
    feats: list[jax.Array],
    strides: list[int],
    boxes: jax.Array,
    resolution: int = 7,
    sampling_ratio: int = 2,
    canonical_size: float = 224.0,
    canonical_level: int = 4,
    precision: jax.lax.Precision | None = None,
) -> jax.Array:
    """Multi-level ROIAlign with dense level selection.

    Args:
      feats: list of [H_l, W_l, C] maps, fine -> coarse.
      strides: per-level feature strides.
      boxes: [N, 4] XYXY image coords.
    Returns:
      [N, R, R, C].
    """
    min_level = int(math.log2(strides[0]))
    max_level = int(math.log2(strides[-1]))
    levels = assign_fpn_levels(
        boxes, min_level, max_level, canonical_size, canonical_level
    )
    out = None
    for li, (feat, stride) in enumerate(zip(feats, strides)):
        pooled = roi_align(feat, boxes, stride, resolution, sampling_ratio,
                           precision=precision)
        sel = (levels == (min_level + li))[:, None, None, None]
        out = jnp.where(sel, pooled, out) if out is not None else pooled * sel
    return out

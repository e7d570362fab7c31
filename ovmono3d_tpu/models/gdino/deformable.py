"""Multi-scale deformable attention (pure JAX, TPU-friendly gathers).

Replaces GroundingDINO's MultiScaleDeformableAttention CUDA extension
(SURVEY.md §2.3): each query predicts, per head / level / point, a sampling
location and a weight; values are bilinearly sampled from the flattened
multi-level feature map and reduced. On TPU this lowers to dense gathers —
the same pattern as ops/roi_align.

Conventions follow the original op:
- value: [B, S, H, D] where S = sum_l H_l*W_l (flattened levels).
- sampling_locations: [B, Q, H, L, P, 2] normalized to [0, 1] per level.
- attention_weights: [B, Q, H, L, P] (softmax over L*P done by caller).
- bilinear sampling uses align_corners=False grid semantics
  (pixel centers at (i + 0.5) / size), zero padding outside.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def deformable_attention_core(
    value: jax.Array,                 # [B, S, H, D]
    spatial_shapes: list[tuple[int, int]],
    sampling_locations: jax.Array,    # [B, Q, H, L, P, 2] in [0, 1]
    attention_weights: jax.Array,     # [B, Q, H, L, P]
) -> jax.Array:
    """Returns [B, Q, H*D]."""
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape

    # Split the flattened value into levels.
    sizes = [h * w for h, w in spatial_shapes]
    offsets = [0]
    for s in sizes:
        offsets.append(offsets[-1] + s)

    out = jnp.zeros((B, Q, H, D), value.dtype)
    for li, (h, w) in enumerate(spatial_shapes):
        v = jax.lax.dynamic_slice_in_dim(value, offsets[li], sizes[li], axis=1)
        v = v.reshape(B, h, w, H, D)
        loc = sampling_locations[:, :, :, li]      # [B, Q, H, P, 2]
        wgt = attention_weights[:, :, :, li]       # [B, Q, H, P]
        # grid_sample align_corners=False: x_pix = x_norm * W - 0.5.
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        sampled = _bilinear_hw(v, x, y)            # [B, Q, H, P, D]
        out = out + jnp.sum(sampled * wgt[..., None], axis=3)
    return out.reshape(B, Q, H * D)


def _bilinear_hw(v: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear sample v: [B, h, w, H, D] at per-head points
    x/y: [B, Q, H, P] -> [B, Q, H, P, D], zero outside.

    The four corner taps are fused into ONE take_along_axis (indices
    concatenated along the point axis) — a single large gather schedules far
    better on TPU than four small ones.
    """
    B, h, w, H, D = v.shape
    Q, P = x.shape[1], x.shape[3]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # Corner coordinates stacked on a new leading axis: [4, B, Q, H, P].
    xs = jnp.stack([x0i, x0i + 1, x0i, x0i + 1])
    ys = jnp.stack([y0i, y0i, y0i + 1, y0i + 1])
    inb = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    idx = jnp.clip(ys, 0, h - 1) * w + jnp.clip(xs, 0, w - 1)

    flat = v.reshape(B, h * w, H, D).transpose(0, 2, 1, 3)   # [B, H, S, D]
    # [4, B, Q, H, P] -> [B, H, 4*Q*P]
    idx2 = idx.transpose(1, 3, 0, 2, 4).reshape(B, H, 4 * Q * P)
    g = jnp.take_along_axis(flat, idx2[..., None], axis=2)   # [B,H,4QP,D]
    g = g.reshape(B, H, 4, Q, P, D).transpose(2, 0, 3, 1, 4, 5)
    g = jnp.where(inb[..., None], g, 0.0)                    # [4,B,Q,H,P,D]

    weights = jnp.stack(
        [
            (1 - lx) * (1 - ly),
            lx * (1 - ly),
            (1 - lx) * ly,
            lx * ly,
        ]
    )[..., None]                                              # [4,B,Q,H,P,1]
    return jnp.sum(g * weights, axis=0)


def make_reference_points(
    spatial_shapes: list[tuple[int, int]], dtype=jnp.float32
) -> jax.Array:
    """Per-token normalized center coordinates for the encoder:
    [S, L, 2] broadcastable reference points (each token's own location,
    replicated across levels)."""
    refs = []
    for h, w in spatial_shapes:
        ys = (jnp.arange(h, dtype=dtype) + 0.5) / h
        xs = (jnp.arange(w, dtype=dtype) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        refs.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
    pts = jnp.concatenate(refs, axis=0)  # [S, 2]
    L = len(spatial_shapes)
    return jnp.broadcast_to(pts[:, None, :], (pts.shape[0], L, 2))

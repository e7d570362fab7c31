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

Internally everything runs HEAD-MAJOR ([B, H, Q, ...]): the gathers and
one-hot matmuls are per-head, and profiling the encoder at 800^2 shapes
showed the per-level [B, Q, H, ...] <-> [B, H, Q, ...] round-trips costing
~25 ms/forward in pure layout copies. The core transposes value/locations/
weights once per call and transposes the [B, H, Q, D] result back once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def deformable_attention_core(
    value: jax.Array,                 # [B, S, H, D]
    spatial_shapes: list[tuple[int, int]],
    sampling_locations: jax.Array,    # [B, Q, H, L, P, 2] in [0, 1]
    attention_weights: jax.Array,     # [B, Q, H, L, P]
    levels: tuple[int, ...] | None = None,
) -> jax.Array:
    """Returns [B, Q, H*D].

    `levels` (ablation/bench only): restrict sampling to the given level
    indices — skipped levels contribute zero, and XLA dead-code-eliminates
    their gathers, exposing each level's in-situ cost.
    """
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape

    # Split the flattened value into levels.
    sizes = [h * w for h, w in spatial_shapes]
    offsets = [0]
    for s in sizes:
        offsets.append(offsets[-1] + s)

    bf16 = value.dtype == jnp.bfloat16
    max_mm = _MATMUL_MAX_SIZE_BF16 if bf16 else _MATMUL_MAX_SIZE

    vh = value.transpose(0, 2, 1, 3)                      # [B, H, S, D]
    loc = sampling_locations.transpose(0, 2, 1, 3, 4, 5)  # [B, H, Q, L, P, 2]
    wgt = attention_weights.transpose(0, 2, 1, 3, 4)      # [B, H, Q, L, P]
    if bf16:
        # Keep the L/P reduction in bf16 end-to-end (16 taps; the rounding
        # is below the bf16 value tables' own quantization).
        wgt = wgt.astype(jnp.bfloat16)

    out = jnp.zeros((B, H, Q, D), value.dtype)
    mm = []  # (v, x, y, w) per matmul-eligible level — merged into ONE scan
    for li, (h, w) in enumerate(spatial_shapes):
        if levels is not None and li not in levels:
            continue
        v = jax.lax.dynamic_slice_in_dim(vh, offsets[li], sizes[li], axis=2)
        v = v.reshape(B, H, h, w, D)
        # grid_sample align_corners=False: x_pix = x_norm * W - 0.5.
        x = loc[:, :, :, li, :, 0] * w - 0.5              # [B, H, Q, P]
        y = loc[:, :, :, li, :, 1] * h - 0.5
        if h * w <= max_mm:
            mm.append((v, x, y, wgt[:, :, :, li, :]))
        else:
            out = out + _bilinear_hw(v, x, y, wgt[:, :, :, li, :])
    if mm:
        out = out + _bilinear_matmul_multi(mm)
    return out.transpose(0, 2, 1, 3).reshape(B, Q, H * D)


# h*w thresholds below which separable one-hot matmul sampling beats the
# 2x2-window gather (v5e, tools/probe_level_costs.py +
# tools/probe_matmul_bf16.py, encoder Q=13294 per layer):
# - f32 values need Precision.HIGHEST to stay exact, so the matmul only
#   wins for tiny tables (25^2: 9.7 -> 7.1 ms, 13^2: 9.6 -> 4.8 ms).
# - bf16 values (the in-model case) are ALREADY quantized, so bf16 weights
#   add no further error (max-err 3.5e-2 vs the bf16 gather's 2.6e-2) and
#   the single-pass bf16 matmul also flips the 50^2 level
#   (gather 11.6 -> 8.0 ms; 25^2 -> 4.7, 13^2 -> 3.5). The 100^2 level
#   stays gather (18.3 ms vs 30.6 matmul: row-traffic-bound).
# The bf16 bound sits at the measured cost crossover, not at the biggest
# level seen in one config: at 896^2 (the e2e lift canvas, where the /16
# level is 56^2 = 3136) the whole GDINO forward runs 135.1 ms with 56^2 on
# the gather path vs 106.9 ms on the matmul path (-21%, bench_gdino.py
# --size 896 --mm-max-size A/B, round 3). Extrapolating the per-position
# scaling of both paths from the 2500/10000 measurements puts the
# crossover near ~66^2; 4100 keeps every level up to 64^2 on the matmul
# side with margin below the crossover.
_MATMUL_MAX_SIZE = 1024
_MATMUL_MAX_SIZE_BF16 = 4100


def _bilinear_matmul(v: jax.Array, x: jax.Array, y: jax.Array,
                     chunk: int = 2048) -> jax.Array:
    """Bilinear sample small-level tables via separable one-hot matmuls.

    v: [B, H, h, w, D]; x/y: [B, H, Q, P] -> [B, H, Q, P, D] (head-major).
    wy[t, :] carries (1-ly) at row y0 and ly at row y0+1 built from the
    UNCLIPPED corner indices, so out-of-bounds corners contribute exactly
    zero (grid_sample zero padding); the row matmul then column reduction
    touch every table row, turning the gather's per-row-segment DMA cost
    into MXU work — a win when the table is small. Queries are processed in
    `chunk`-sized scan steps so the [chunk, w, D] row intermediate stays
    VMEM-sized.

    Precision: f32 values pin Precision.HIGHEST, keeping the dot exact
    (max err ~2e-7 vs the gather path — the golden-test configuration).
    bf16 values instead cast the weights to bf16 and run a single MXU pass:
    bf16 x bf16 products accumulate exactly in f32, and with the table
    already bf16-quantized the weight rounding adds no measurable error
    (tools/probe_matmul_bf16.py: max-err 3.5e-2 vs the bf16 gather's
    2.6e-2, both pure value-quantization noise) at ~1/3 the cost.
    """
    B, H, h, w, D = v.shape
    Q, P = x.shape[2], x.shape[3]
    bf16 = v.dtype == jnp.bfloat16
    vt = v.reshape(B, H, h, w * D)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    iy = jnp.arange(h)
    ix = jnp.arange(w)
    wy = (jnp.where(iy == y0i[..., None], (1 - ly)[..., None], 0.0)
          + jnp.where(iy == y0i[..., None] + 1, ly[..., None], 0.0))
    wx = (jnp.where(ix == x0i[..., None], (1 - lx)[..., None], 0.0)
          + jnp.where(ix == x0i[..., None] + 1, lx[..., None], 0.0))
    wy = wy.reshape(B, H, Q * P, h)
    wx = wx.reshape(B, H, Q * P, w)
    if bf16:
        # Both weight factors ride bf16 (value tables are already bf16-
        # quantized, so the ~2^-8 weight rounding adds nothing measurable;
        # wx in f32 kept an 85 MB scan operand per 50^2 level).
        wy = wy.astype(jnp.bfloat16)
        wx = wx.astype(jnp.bfloat16)

    nt = Q * P
    pad = (-nt) % chunk
    wy = jnp.pad(wy, ((0, 0), (0, 0), (0, pad), (0, 0)))
    wx = jnp.pad(wx, ((0, 0), (0, 0), (0, pad), (0, 0)))
    nc = (nt + pad) // chunk
    wy = wy.reshape(B, H, nc, chunk, h).transpose(2, 0, 1, 3, 4)
    wx = wx.reshape(B, H, nc, chunk, w).transpose(2, 0, 1, 3, 4)

    def one_chunk(carry, ws):
        wyc, wxc = ws  # [B, H, c, h], [B, H, c, w]
        rows = jax.lax.dot_general(
            wyc, vt, (((3,), (2,)), ((0, 1), (0, 1))),
            precision=(None if bf16 else jax.lax.Precision.HIGHEST),
            preferred_element_type=jnp.float32,
        ).reshape(B, H, chunk, w, D)
        out = jnp.sum(rows * wxc[..., None], axis=3)
        # bf16 path: the stacked scan output is the largest carry (f32
        # doubles its HBM traffic); one more bf16 rounding sits below the
        # value tables' quantization noise.
        return carry, out.astype(jnp.bfloat16) if bf16 else out

    _, outs = jax.lax.scan(one_chunk, 0, (wy, wx))   # [nc, B, H, c, D]
    outs = outs.transpose(1, 2, 0, 3, 4).reshape(B, H, nc * chunk, D)
    # f32 products in the f32 path (the gather path also yields f32).
    return outs[:, :, :nt].reshape(B, H, Q, P, D)


def _bilinear_matmul_multi(mm, chunk: int = 2048) -> jax.Array:
    """Sample ALL matmul-eligible levels in ONE block-diagonal scan.

    mm: list of (v [B,H,h,w,D], x [B,H,Q,P], y [B,H,Q,P], aw [B,H,Q,P])
    per level. Returns the attention-weighted, P-reduced contribution of
    these levels: [B, H, Q, D].

    Why merged: one scan over the queries serves every matmul level (one
    set of scan-stacking layout copies instead of one per level), and
    folding each level's attention weight into its column one-hot makes the
    per-level [B,H,Q,P,D] weighted-sum passes collapse into the shared
    column combine (the three matmul-sampled encoder levels cost
    30.4 ms/forward as separate scans, tools/bench_enc_parts.py). The dots
    stay PER LEVEL inside the scan body: a single block-diagonal dot was
    tried and benched 2.5x SLOWER end-to-end — its [B,H,chunk,N_total] f32
    row tensor has three slice-consumers, which defeats XLA's
    matmul-consumer fusion and spills the rows to HBM every chunk.
    """
    B, H, _, _, D = mm[0][0].shape
    Q, P = mm[0][1].shape[2], mm[0][1].shape[3]
    bf16 = mm[0][0].dtype == jnp.bfloat16
    wdt = jnp.bfloat16 if bf16 else jnp.float32

    ws = [v.shape[3] for v, *_ in mm]
    vts = [v.reshape(B, H, v.shape[2], v.shape[3] * D) for v, *_ in mm]

    wys, wxs = [], []
    for v, x, y, aw in mm:
        h, w = v.shape[2], v.shape[3]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        iy = jnp.arange(h)
        ix = jnp.arange(w)
        wy = (jnp.where(iy == y0i[..., None], (1 - ly)[..., None], 0.0)
              + jnp.where(iy == y0i[..., None] + 1, ly[..., None], 0.0))
        wx = (jnp.where(ix == x0i[..., None], (1 - lx)[..., None], 0.0)
              + jnp.where(ix == x0i[..., None] + 1, lx[..., None], 0.0))
        # Fold the attention weight into the column one-hot — the per-level
        # weighted P-sum then collapses into the column combine.
        wx = wx * aw[..., None]
        wys.append(wy.reshape(B, H, Q * P, h).astype(wdt))
        wxs.append(wx.reshape(B, H, Q * P, w).astype(wdt))

    nt = Q * P
    pad = (-nt) % chunk
    nc = (nt + pad) // chunk

    wys = tuple(jnp.pad(a, ((0, 0), (0, 0), (0, pad), (0, 0)))
                for a in wys)
    wxs = tuple(jnp.pad(a, ((0, 0), (0, 0), (0, pad), (0, 0)))
                for a in wxs)

    def one_chunk(i, buf):
        start = i * chunk
        acc = jnp.zeros((B, H, chunk, D), jnp.float32)
        for vt, w_l, wy, wx in zip(vts, ws, wys, wxs):
            y_l = jax.lax.dynamic_slice_in_dim(wy, start, chunk, axis=2)
            x_l = jax.lax.dynamic_slice_in_dim(wx, start, chunk, axis=2)
            rows = jax.lax.dot_general(
                y_l, vt, (((3,), (2,)), ((0, 1), (0, 1))),
                precision=(None if bf16 else jax.lax.Precision.HIGHEST),
                preferred_element_type=jnp.float32,
            ).reshape(B, H, chunk, w_l, D)
            acc = acc + jnp.sum(
                rows * x_l[..., None].astype(jnp.float32), axis=3
            )
        acc = acc.astype(wdt) if bf16 else acc
        return jax.lax.dynamic_update_slice(buf, acc, (0, 0, start, 0))

    # fori_loop with a TRACED bound: slicing chunks straight out of the
    # padded [B, H, nt+pad, n] weights (no scan-stacking layout copies),
    # and the dynamic trip count stops XLA from peeling the first
    # iteration — the peeled copy loses the dot+combine fusion and
    # materializes the f32 [B*H, chunk, w*D] row tensor (profiled
    # ~1.9 ms/encoder-layer across the three levels).
    buf0 = jnp.zeros((B, H, nc * chunk, D), wdt if bf16 else jnp.float32)
    outs = jax.lax.fori_loop(0, jnp.int32(nc), one_chunk, buf0)
    return outs[:, :, :nt].reshape(B, H, Q, P, D).sum(axis=3)


def _bilinear_hw(v: jax.Array, x: jax.Array, y: jax.Array,
                 wgt: jax.Array | None = None) -> jax.Array:
    """Bilinear sample v: [B, H, h, w, D] at per-head points
    x/y: [B, H, Q, P] -> [B, H, Q, P, D], zero outside (head-major).
    With `wgt` [B, H, Q, P], returns the attention-weighted P-reduction
    [B, H, Q, D] instead: the weights fold into the corner weights so the
    corner combine and the P-sum become ONE fusion — the separate
    [B, H, Q, P, D] weighted-sum pass profiled 1.34 ms/enc-layer.

    Each point's full 2x2xD bilinear support is fetched as ONE lax.gather
    slice (start clipped to the grid). Measured on v5e: the TPU gather cost
    is dominated by a fixed ~8 ns per gathered row-segment, so one 2-row
    window per point is ~2x faster than four fused corner-row gathers at
    identical numerics (tools/probe_window_gather.py).

    Out-of-bounds / clipping correctness: the window rows are ys..ys+1 with
    ys = clip(floor(y), 0, h-2); each row's interpolation weight is (1-ly)
    where the row coordinate equals y0, ly where it equals y0+1, else 0 —
    out-of-bounds corners never coincide with a window row, so they drop out
    exactly like the reference's zero padding (grid_sample
    align_corners=False semantics).
    """
    B, H, h, w, D = v.shape
    if h < 2 or w < 2:  # degenerate grid: 2x2 windows don't exist
        s = _bilinear_hw_corners(v, x, y)
        if wgt is None:
            return s
        return jnp.sum(s * wgt[..., None], axis=3)
    Q, P = x.shape[2], x.shape[3]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0)[..., None]
    ly = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    xs = jnp.clip(x0i, 0, w - 2)
    ys = jnp.clip(y0i, 0, h - 2)

    starts = jnp.stack(
        [ys.reshape(B, H, Q * P), xs.reshape(B, H, Q * P)], axis=-1
    )

    def g(op, st):  # op: [h, w, D]; st: [T, 2] -> [T, 2, 2, D]
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        )
        return jax.lax.gather(
            op, st, dn, slice_sizes=(2, 2, D),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    win = jax.vmap(jax.vmap(g))(v, starts)        # [B, H, T, 2, 2, D]
    win = win.reshape(B, H, Q, P, 2, 2, D)

    y0e = y0i[..., None]
    x0e = x0i[..., None]
    ya0, ya1 = ys[..., None], ys[..., None] + 1
    xa0, xa1 = xs[..., None], xs[..., None] + 1
    wy0 = jnp.where(ya0 == y0e, 1 - ly, 0.0) + jnp.where(
        ya0 == y0e + 1, ly, 0.0
    )
    wy1 = jnp.where(ya1 == y0e, 1 - ly, 0.0) + jnp.where(
        ya1 == y0e + 1, ly, 0.0
    )
    wx0 = jnp.where(xa0 == x0e, 1 - lx, 0.0) + jnp.where(
        xa0 == x0e + 1, lx, 0.0
    )
    wx1 = jnp.where(xa1 == x0e, 1 - lx, 0.0) + jnp.where(
        xa1 == x0e + 1, lx, 0.0
    )
    # bf16 values: keep the weighted combine in bf16 too (f32 corner
    # weights promote the whole [B,H,Q,P,D] chain to f32 — pure extra HBM
    # traffic; the corner-weight products are computed in f32 first, so
    # only one rounding is added, below value-quantization noise).
    if v.dtype == jnp.bfloat16:
        def cw(a):
            return a.astype(jnp.bfloat16)
    else:
        def cw(a):
            return a
    if wgt is not None:
        # Fold the attention weight into the (f32) corner weights, then
        # reduce corners AND points in one expression — one fusion.
        wq = wgt[..., None]
        s = (
            win[..., 0, 0, :] * cw(wy0 * wx0 * wq)
            + win[..., 0, 1, :] * cw(wy0 * wx1 * wq)
            + win[..., 1, 0, :] * cw(wy1 * wx0 * wq)
            + win[..., 1, 1, :] * cw(wy1 * wx1 * wq)
        )
        return jnp.sum(s, axis=3)
    return (
        win[..., 0, 0, :] * cw(wy0 * wx0)
        + win[..., 0, 1, :] * cw(wy0 * wx1)
        + win[..., 1, 0, :] * cw(wy1 * wx0)
        + win[..., 1, 1, :] * cw(wy1 * wx1)
    )


def _bilinear_hw_corners(v: jax.Array, x: jax.Array, y: jax.Array):
    """Fallback for degenerate (h or w < 2) grids: four fused corner-row
    gathers (the pre-window formulation). Head-major like _bilinear_hw."""
    B, H, h, w, D = v.shape
    Q, P = x.shape[2], x.shape[3]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    xs = jnp.stack([x0i, x0i + 1, x0i, x0i + 1])   # [4, B, H, Q, P]
    ys = jnp.stack([y0i, y0i, y0i + 1, y0i + 1])
    inb = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    idx = jnp.clip(ys, 0, h - 1) * w + jnp.clip(xs, 0, w - 1)

    flat = v.reshape(B, H, h * w, D)
    idx2 = idx.transpose(1, 2, 0, 3, 4).reshape(B, H, 4 * Q * P)
    g = jnp.take_along_axis(flat, idx2[..., None], axis=2)   # [B,H,4QP,D]
    g = g.reshape(B, H, 4, Q, P, D).transpose(2, 0, 1, 3, 4, 5)
    g = jnp.where(inb[..., None], g, 0.0)                    # [4,B,H,Q,P,D]

    weights = jnp.stack(
        [(1 - lx) * (1 - ly), lx * (1 - ly), (1 - lx) * ly, lx * ly]
    )[..., None]
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

"""Fused multi-head attention: Pallas flash kernel + XLA reference path.

The reference runs ViT attention through torch/cuDNN (SURVEY.md §2.1 #7-11,
hot loop §3: ~4096 image tokens x 12 blocks per image). Here:

- `attention_xla`: einsum attention with f32 softmax — XLA already fuses this
  well on TPU and it is differentiable; used for training and as the CPU/test
  path.
- `flash_attention`: Pallas TPU kernel, online-softmax over K/V blocks with
  the full K/V resident in VMEM (sequence ~4K tokens, head_dim 64 -> ~1MB per
  head in bf16, well under the 16MB VMEM budget). Padded KV positions are
  masked with -inf scores; the mask is static (sequence lengths are static
  under jit). Forward-only; the backbone is frozen during reference training
  (train_net.py:431-434) so inference speed is what matters. A custom_vjp
  falls back to the XLA path for gradients.

`dot_product_attention(q, k, v)` picks the best available implementation.
Layout: [B, N, H, D].
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# Whole-KV-in-VMEM kernels' scoped intermediates scale with N, and
# Mosaic's default 16 MB scoped-VMEM check rejects shapes still inside
# the n <= 6144 single-block gate (measured: the packed lse forward
# asks 18.49 MB at N=6144). v5e has 128 MB of VMEM and every kernel's
# block I/O stays well clear, so the per-kernel limit is raised
# uniformly (see also the packed-backward / rel-pos kernels' notes).
_VMEM_LIMIT = 48 * 2**20


def attention_xla(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Reference attention. q/k/v: [B, N, H, D] -> [B, N, H, D]."""
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


_LOG2E = 1.4426950408889634


def _flash_kernel_single(q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                         scale: float):
    """Single-KV-block program: clamped single-pass softmax, no row max.

    With the whole (padded) KV in VMEM the online-softmax carry is dead
    weight, and the per-row max reduce + subtract are two full VPU passes
    over the [block_q, n_kv] logits. Instead the mask row carries a fixed
    offset -C (C=50 in raw-logit units) and the logits are clamped to
    <=0 before exp2, which makes overflow impossible (p <= 1, l <= n_kv)
    and keeps softmax ratios EXACT whenever the per-row max raw logit
    lies in [C-87, C] = [-37, 50] (below: f32 exp2 underflow; above: the
    clamp engages). ViT attention logits live well inside that window;
    callers that cannot guarantee it pass clamp_c=None for the online
    path. Measured: 16.0 ms vs 18.9 ms (true-max single-pass) vs 19.1 ms
    (online loop) for the 12-layer trunk @896^2.
    """
    in_dtype = q_ref.dtype
    q = (
        q_ref[0].astype(jnp.float32) * (scale * _LOG2E)
    ).astype(in_dtype)
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # mask row = -C*log2e for real keys / -1e30 for padding
    s = jnp.minimum(s + mask_ref[0][None, :], 0.0)
    p = jnp.exp2(s)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(in_dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float, block_k: int
):
    """One (batch*head, q-block) program: online softmax over K/V blocks.

    MXU inputs stay bf16 (full systolic rate) with f32 accumulation; the
    softmax statistics are f32 (bf16 logits were profiled SLOWER — Mosaic
    upcasts exp internally and pays extra converts). KV padding is an
    additive mask row (0 / -1e30) computed once outside — cheaper than
    per-block iota+where. The kernel is softmax-VPU-bound at backbone
    shapes (~1 ms at B1 N4097 H12 D64, vs ~0.26 ms of pure MXU work);
    block-size and dtype sweeps move it <15% (tools/profile_attn_sweep.py).
    """
    in_dtype = q_ref.dtype
    # exp2 trick: fold log2(e) into the q scaling so the softmax runs on
    # native exp2 (saves the per-element ln2 multiply inside every exp).
    q = (
        q_ref[0].astype(jnp.float32) * (scale * 1.4426950408889634)
    ).astype(in_dtype)                                           # [bq, D]
    n_kv_padded = k_ref.shape[1]
    bq, d = q.shape
    n_blocks = n_kv_padded // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bk] log2-scaled logits, f32 accumulate from bf16 inputs
        s = s + mask_ref[0, pl.ds(i * block_k, block_k)][None, :]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(in_dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, n_blocks, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "clamp_c", "interpret")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 384,
    block_k: int | None = None,
    clamp_c: float | None = 50.0,
    interpret: bool = False,
) -> jax.Array:
    """Pallas flash attention. q/k/v: [B, N, H, D] -> [B, N, H, D].

    block_k=None auto-selects: one single KV block when the whole (padded)
    sequence fits VMEM comfortably, else 1024-wide blocks. On the
    single-block path, clamp_c selects the clamped single-pass softmax
    (see _flash_kernel_single for its exactness window); clamp_c=None
    forces the numerically-unconditional online-softmax kernel.
    """
    b, n, h, d = q.shape
    scale = 1.0 / (d**0.5)
    if block_k is None:
        # Single KV block, padded only to lane granularity (128): at
        # N=4097 this is 4224 instead of 4608 — 8% fewer exp/QK columns.
        block_k = -(-n // 128) * 128 if n <= 6144 else 1024

    n_q = -(-n // block_q) * block_q
    n_kv = -(-n // block_k) * block_k
    single = n_kv == block_k and clamp_c is not None
    qp = jnp.pad(q, ((0, 0), (0, n_q - n), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, n_kv - n), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_kv - n), (0, 0), (0, 0)))

    # [B, N, H, D] -> [B*H, N, D]
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qb, kb, vb = to_bh(qp), to_bh(kp), to_bh(vp)
    # Additive KV-padding mask row (-C*log2e real / -1e30 pad on the
    # single-block path; 0 real / -1e30 pad on the online path), shared
    # by all (batch, head) programs.
    real = -clamp_c * _LOG2E if single else 0.0
    mask = jnp.where(
        jnp.arange(n_kv) < n, real, _NEG_INF
    ).astype(jnp.float32)[None]

    if single:
        kernel = functools.partial(_flash_kernel_single, scale=scale)
    else:
        kernel = functools.partial(
            _flash_kernel, scale=scale, block_k=block_k
        )
    grid = (b * h, n_q // block_q)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda bh, i: (bh, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_kv, d), lambda bh, i: (bh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_kv, d), lambda bh, i: (bh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_kv), lambda bh, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda bh, i: (bh, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, n_q, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_q * n_kv * d,
            bytes_accessed=(2 * b * h * n_q * d + 2 * b * h * n_kv * d) * 2,
            transcendentals=b * h * n_q * n_kv,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(qb, kb, vb, mask)
    out = out.reshape(b, h, n_q, d).transpose(0, 2, 1, 3)
    return out[:, :n]


def _flash_kernel_packed(q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                         scale: float, heads_per_block: int):
    """One (batch, head-group, q-block) program, channel-packed I/O.

    The standard flash path's cost at ViT shapes is NOT the math: it
    transposes q/k/v/out between the model's channel-packed [B, N, H*D]
    and the kernel's head-major [B*H, N, D] every layer (28.8 ms/fwd of
    layout copies in the Depth-Pro patches stage, tools/profile_depth.py)
    and pads N to block_q multiples (577 -> 768: 33% dead QK rows). This
    kernel instead consumes the qkv projection's NATIVE layout — q/k/v
    [B, N, C] with head h occupying columns [h*D, (h+1)*D) exactly as the
    fused qkv matmul writes them — via lane-tile-aligned COLUMN blocks of
    heads_per_block heads (G*D = a 128-lane multiple), looping the G
    heads inside the program over static 64-aligned lane slices. XLA
    emits zero transposes, q pads only to sublane granularity, and KV
    pads to the 128-lane logits tile. Same clamped single-pass exp2
    softmax and exactness window as _flash_kernel_single."""
    in_dtype = q_ref.dtype
    d = q_ref.shape[-1] // heads_per_block
    q = (
        q_ref[0].astype(jnp.float32) * (scale * _LOG2E)
    ).astype(in_dtype)
    mask = mask_ref[0][None, :]
    for g in range(heads_per_block):
        sl = slice(g * d, (g + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.minimum(s + mask, 0.0)
        p = jnp.exp2(s)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(in_dtype), v_ref[0, :, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _relpos_flash_kernel(q_ref, k_ref, v_ref, qrh_ref, qrw_ref, er_ref,
                         ec_ref, mask_ref, o_ref, *, scale: float,
                         heads_per_block: int, n_r: int, n_c: int):
    """Channel-packed flash attention with DECOMPOSED REL-POS bias
    (SAM image encoder, segment_anything add_decomposed_rel_pos):

        s[i, j] = scale * q_i.k_j + q_i.Rh[r_i, r_j] + q_i.Rw[c_i, c_j]

    The XLA path materializes the [H, N, N] f32 logits PLUS two
    broadcast-adds over the full [H, n_r, n_c, n_r, n_c] grid — ~1 GB of
    HBM traffic per add at SAM-global shape, 13.8 ms/block = 6.2 TF/s
    (tools/probe_sam_global_attn.py). Here the SMALL per-(row, index)
    factors qrh[i, a] = q_i.Rh[r_i, a] and qrw[i, a] = q_i.Rw[c_i, a]
    (cheap [N, H, n_r] einsums, computed outside) are expanded to logits
    IN-KERNEL with two one-hot matmuls:

        s += qrh @ E_r + qrw @ E_c,   E_r[a, j] = [j // n_c == a],
                                      E_c[a, j] = [j %  n_c == a]

    so nothing [N, N]-sized ever leaves VMEM. qrh/qrw arrive
    pre-multiplied by log2(e) (exp2 softmax) in bf16; same clamped
    single-pass softmax and exactness window as _flash_kernel_single."""
    in_dtype = q_ref.dtype
    d = q_ref.shape[-1] // heads_per_block
    q = (
        q_ref[0].astype(jnp.float32) * (scale * _LOG2E)
    ).astype(in_dtype)
    mask = mask_ref[0][None, :]
    for g in range(heads_per_block):
        sl = slice(g * d, (g + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + jax.lax.dot_general(
            qrh_ref[0, :, g * n_r:(g + 1) * n_r], er_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + jax.lax.dot_general(
            qrw_ref[0, :, g * n_c:(g + 1) * n_c], ec_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.minimum(s + mask, 0.0)
        p = jnp.exp2(s)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(in_dtype), v_ref[0, :, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "grid_hw", "clamp_c", "block_q",
                              "interpret")
)
def rel_pos_flash_attention(
    q: jax.Array,            # [B, N, H, D], N == h*w tokens of an (h, w) grid
    k: jax.Array,
    v: jax.Array,
    qrh: jax.Array,          # [B, N, H, h]  q_i . Rh[r_i, a] (RAW logits)
    qrw: jax.Array,          # [B, N, H, w]  q_i . Rw[c_i, a]
    grid_hw: tuple[int, int],
    num_heads: int,
    clamp_c: float = 50.0,
    block_q: int = 256,    # 128 wins the chained micro at SAM-global
                           # shape (4.03 vs 4.52 ms) but LOSES in situ
                           # (encoder 68.6 vs 64.8 ms — less DMA/compute
                           # overlap against neighboring ops); 256 is the
                           # measured-best default at the model level
                           # (round-5 sweep)
    interpret: bool = False,
) -> jax.Array:
    """Decomposed-rel-pos flash attention (see _relpos_flash_kernel).

    Requirements: N == h*w. KV pads to the 128-lane logits tile with
    -inf mask columns (SAM global blocks 64*64 = 4096 need none;
    windowed blocks 14*14 = 196 pad to 256). Head grouping: the fewest
    heads whose packed qkv AND bias widths are 128-lane multiples, else
    all heads in one group (full-width blocks are always legal). The
    channel-packed [B, N, H*D] reshapes at this boundary are free, as in
    flash_attention_packed."""
    b, n, h_, d = q.shape
    gh, gw = grid_hw
    assert gh * gw == n, (grid_hw, n)
    c = h_ * d
    scale = 1.0 / (d**0.5)
    g = 1
    while g < h_ and (
        (g * d) % 128 != 0 or (g * gh) % 128 != 0 or (g * gw) % 128 != 0
        or h_ % g != 0
    ):
        g += 1
    assert h_ % g == 0, (h_, d, grid_hw)
    n_kv = -(-n // 128) * 128
    block_q = min(block_q, -(-n // 16) * 16)
    n_q = -(-n // block_q) * block_q

    def pack(x, width, n_pad):
        x = x.reshape(b, n, h_ * width)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    qp = pack(q, d, n_q)
    kp = pack(k, d, n_kv)
    vp = pack(v, d, n_kv)
    # log2e folded here so the kernel adds the biases in exp2 units.
    qrh_p = pack((qrh.astype(jnp.float32) * _LOG2E).astype(q.dtype), gh,
                 n_q)
    qrw_p = pack((qrw.astype(jnp.float32) * _LOG2E).astype(q.dtype), gw,
                 n_q)
    jcol = jnp.arange(n_kv)
    er = (jnp.arange(gh)[:, None] == jcol[None, :] // gw).astype(q.dtype)
    ec = (jnp.arange(gw)[:, None] == jcol[None, :] % gw).astype(q.dtype)
    mask = jnp.where(jcol < n, -clamp_c * _LOG2E, _NEG_INF).astype(
        jnp.float32)[None]

    out = pl.pallas_call(
        functools.partial(_relpos_flash_kernel, scale=scale,
                          heads_per_block=g, n_r=gh, n_c=gw),
        grid=(b, h_ // g, n_q // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, g * d),
                         lambda bi, gi, qi: (bi, qi, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, g * d), lambda bi, gi, qi: (bi, 0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, g * d), lambda bi, gi, qi: (bi, 0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, g * gh),
                         lambda bi, gi, qi: (bi, qi, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, g * gw),
                         lambda bi, gi, qi: (bi, qi, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, n_kv), lambda bi, gi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gw, n_kv), lambda bi, gi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv), lambda bi, gi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, g * d),
                               lambda bi, gi, qi: (bi, qi, gi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_q, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h_ * n_q * n * d
            + 2 * b * h_ * n_q * n * (gh + gw),
            bytes_accessed=(6 * b * n * c + 2 * b * n_q * c) * 2,
            transcendentals=b * h_ * n_q * n,
        ),
        # The per-head chain s -> +bias_h dot -> +bias_w dot keeps ~3
        # [block_q, N] f32 temps live; the default 16 MB scoped check is
        # far too tight at block_q=256, N=4096 (measured ask: 48.23 MB).
        # Total VMEM incl. the kv/q/out blocks is ~75 MB of the 128 MB
        # v5e budget (cf. flash_attention_packed_bwd).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(qp, kp, vp, qrh_p, qrw_p, er, ec, mask)
    return out[:, :n].reshape(b, n, h_, d)


def _packed_geometry(n: int, h: int, d: int) -> tuple[int, int, int, int]:
    """(heads_per_block, n_q_pad, n_kv_pad, block_q) for the packed path.

    heads_per_block: fewest heads whose packed width is a 128-lane
    multiple. KV pads to the 128-lane logits tile; q pads to sublane
    granularity when a single q-block suffices, else to 384-row blocks
    (the standard kernel's block_q — n=4097 pads to 4224, 3%)."""
    g = 1
    while (g * d) % 128 != 0:
        g += 1
    n_kv = -(-n // 128) * 128
    if n <= 768:
        block_q = n_q = -(-n // 16) * 16
    else:
        block_q = 384
        n_q = -(-n // block_q) * block_q
    return g, n_q, n_kv, block_q


@functools.partial(
    jax.jit, static_argnames=("num_heads", "clamp_c", "interpret")
)
def flash_attention_packed(
    q: jax.Array,            # [B, N, H, D] (wrapper view; see kernel doc)
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    clamp_c: float = 50.0,
    interpret: bool = False,
) -> jax.Array:
    """Channel-packed flash attention. [B, N, H, D] -> same.

    The [B, N, H, D] <-> [B, N, H*D] reshapes at this boundary merge/split
    minor dims only — XLA fuses them into the surrounding slice/matmul
    (no layout copy), unlike flash_attention's [B*H, N, D] transposes.
    Single-KV-block clamped path only (N <= 6144, every current user)."""
    b, n, h, d = q.shape
    c = h * d
    scale = 1.0 / (d**0.5)
    g, n_q, n_kv, block_q = _packed_geometry(n, h, d)
    assert h % g == 0, (h, d)
    gc = g * d
    qp = jnp.pad(q.reshape(b, n, c), ((0, 0), (0, n_q - n), (0, 0)))
    kp, vp = (
        jnp.pad(x.reshape(b, n, c), ((0, 0), (0, n_kv - n), (0, 0)))
        for x in (k, v)
    )
    mask = jnp.where(
        jnp.arange(n_kv) < n, -clamp_c * _LOG2E, _NEG_INF
    ).astype(jnp.float32)[None]
    kernel = functools.partial(
        _flash_kernel_packed, scale=scale, heads_per_block=g
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, h // g, n_q // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, gc), lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, gc), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, gc), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv), lambda bi, hi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, gc), lambda bi, hi, qi: (bi, qi, hi),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_q, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_q * n_kv * d,
            bytes_accessed=(6 * b * n_kv * c + 2 * b * n_q * c),
            transcendentals=b * h * n_q * n_kv,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(qp, kp, vp, mask)
    return out[:, :n].reshape(b, n, h, d)


def _packed_bwd_wins() -> bool:
    """Whether the packed backward should own the vjp residual.

    Shape-INDEPENDENT since round 5: single-q-chunk shapes
    (Depth-Pro/BERT) were round-4 TPU-measured wins, and the chunked
    large-n_q path (trunk n_q=4224, bk=256 kept by in-kernel
    q-chunking + the raised per-kernel vmem limit) measured faster at
    trunk shape too — kernel level 18.68 vs 19.62 ms head-major (vs
    23.05 unchunked bk=256, tools/check_packed_grads.py) and in-model
    561.0 vs 566.7 ms/step (bench_train --unfreeze). Packed is the
    default everywhere; OVMONO3D_PACKED_BWD=1/0 force/disable for
    A/Bs."""
    env = os.environ.get("OVMONO3D_PACKED_BWD", "auto")
    if env in ("0", "1"):
        return env == "1"
    return True


def _use_packed(n: int, h: int, d: int) -> bool:
    """Packed-path gate: single-KV-block VMEM bound (the s/p logits
    intermediates [block_q, n_kv] f32+bf16 plus the KV column blocks must
    fit; n<=6144 mirrors the standard single-block bound) and a head
    width that tiles to 128 lanes. OVMONO3D_PACKED_ATTN=0 is the A/B
    escape hatch."""
    if os.environ.get("OVMONO3D_PACKED_ATTN", "1") == "0":
        return False
    g = 1
    while (g * d) % 128 != 0 and g <= h:
        g += 1
    return h % g == 0 and n <= 6144


def _flash_kernel_packed_lse(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                             *, scale: float, heads_per_block: int):
    """_flash_kernel_packed + per-(head, row) log2 softmax denominator.

    lse rides a [b, h//g, g, n_q] array whose (g, block_q) block satisfies
    the Mosaic sublane rule by making g an array dim (cf. the
    [bh, 1, n_q] layout of _flash_kernel_single_lse)."""
    in_dtype = q_ref.dtype
    d = q_ref.shape[-1] // heads_per_block
    q = (
        q_ref[0].astype(jnp.float32) * (scale * _LOG2E)
    ).astype(in_dtype)
    mask = mask_ref[0][None, :]
    for g in range(heads_per_block):
        sl = slice(g * d, (g + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.minimum(s + mask, 0.0)
        p = jnp.exp2(s)
        l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        o = jax.lax.dot_general(
            p.astype(in_dtype), v_ref[0, :, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)
        lse_ref[0, 0, g] = jnp.log2(l)[:, 0]


@functools.partial(
    jax.jit, static_argnames=("num_heads", "clamp_c", "interpret")
)
def flash_attention_packed_lse(
    q: jax.Array,            # [B, N, H, D]
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    clamp_c: float = 50.0,
    interpret: bool = False,
):
    """flash_attention_packed that ALSO returns the log2 softmax
    denominator residual, lse [b, h//g, g, n_q] (g = heads per column
    block). The packed backward consumes this layout natively."""
    b, n, h, d = q.shape
    c = h * d
    scale = 1.0 / (d**0.5)
    g, n_q, n_kv, block_q = _packed_geometry(n, h, d)
    assert h % g == 0, (h, d)
    gcols = g * d
    qp = jnp.pad(q.reshape(b, n, c), ((0, 0), (0, n_q - n), (0, 0)))
    kp, vp = (
        jnp.pad(x.reshape(b, n, c), ((0, 0), (0, n_kv - n), (0, 0)))
        for x in (k, v)
    )
    mask = jnp.where(
        jnp.arange(n_kv) < n, -clamp_c * _LOG2E, _NEG_INF
    ).astype(jnp.float32)[None]
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel_packed_lse, scale=scale,
                          heads_per_block=g),
        grid=(b, h // g, n_q // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, gcols),
                         lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, gcols), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, gcols), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv), lambda bi, hi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, gcols),
                         lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, block_q),
                         lambda bi, hi, qi: (bi, hi, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_q, c), q.dtype),
            jax.ShapeDtypeStruct((b, h // g, g, n_q), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_q * n_kv * d,
            bytes_accessed=(6 * b * n_kv * c + 2 * b * n_q * c),
            transcendentals=b * h * n_q * n_kv,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(qp, kp, vp, mask)
    return out[:, :n].reshape(b, n, h, d), lse


def _packed_bwd_geometry(n_q: int,
                         block_k: int | None = None) -> tuple[int, int]:
    """(block_k, q_chunk) for the packed backward.

    block_k=None adapts to the shape: 512 at trunk scale (3072 <= n_q
    <= 4736 — round-5 micro 16.82 vs 19.53 ms at bk=256 once the raised
    per-kernel vmem limit unblocked it; bk=1024 regresses to 21.1), 256
    otherwise: below 3072 a 512 block would pad small kv (Depth-Pro/
    BERT shapes, round-4 measured best at 256), and ABOVE 4736 the
    unrolled q-chunk buffers (NOT liveness-folded by Mosaic — see the
    kernel note) would total past the 48 MB per-kernel vmem limit
    (~14 B/cell x n_q x 512 x ~1.2 overhead; the gate maximum n_q=6144
    stays on 256, whose total ask ~26 MB fits).

    The kernel's scoped-VMEM terms are the [q_chunk, block_k] f32 s/p/dp
    intermediates (+bf16 ds/p casts), ~14 B per (q-row, kv-col) cell;
    12 MB of the 16 MB scope is budgeted for them. Rather than shrinking
    the kv block when n_q grows (round-4 behavior — trunk n_q=4224
    forced bk=128, where the packed backward lost 28.3 vs 19.5 ms to the
    head-major pair), the kernel loops q in chunks INSIDE the program:
    dk/dv accumulate in tiny [block_k, D] f32 carries, dq rows are
    disjoint per chunk, so the kv block keeps an MXU-efficient width
    (256/512) at any n_q. Chunk starts are 128-multiples (lane-aligned
    lse/delta slices; q-row slices are sublane-aligned a fortiori)."""
    if block_k is None:
        block_k = 512 if 3072 <= n_q <= 4736 else 256
    budget = 12 * 2**20
    if 14 * n_q * block_k <= budget:
        return block_k, n_q
    q_chunk = budget // (14 * block_k) // 128 * 128
    assert q_chunk >= 128, (n_q, block_k)
    return block_k, q_chunk


def _flash_bwd_packed_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref,
                             delta_ref, mask_ref, dq_ref, dk_ref, dv_ref,
                             *, scale: float, heads_per_block: int,
                             q_chunk: int):
    """Packed fused backward: one (batch, head-group, kv-block) program
    computes dk/dv and accumulates dq — _flash_bwd_fused_kernel's math
    per head over channel-packed column blocks (zero [B*H, N, D]
    transposes outside; see _flash_kernel_packed for why that matters).

    q rows are processed in `q_chunk`-row chunks so the [chunk, bk]
    scoped intermediates fit the per-chunk budget at ANY n_q while bk
    keeps an MXU-efficient 256/512 width (_packed_bwd_geometry —
    note: Mosaic does NOT liveness-fold the unrolled chunk buffers, so
    the TOTAL ask scales with chunk count; the geometry and the raised
    vmem limit account for that): dk/dv accumulate across chunks in
    [bk, D] f32 carries, dq chunks are disjoint row slices (the += only
    accumulates across kv-block grid steps, exactly as before)."""
    j = pl.program_id(2)
    in_dtype = q_ref.dtype
    n_q = q_ref.shape[1]
    d = q_ref.shape[-1] // heads_per_block
    bk = k_ref.shape[1]
    mask = mask_ref[0][None, :]
    chunks = [(q0, min(q_chunk, n_q - q0))
              for q0 in range(0, n_q, q_chunk)]

    @pl.when(j == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    for g in range(heads_per_block):
        sl = slice(g * d, (g + 1) * d)
        k_h = k_ref[0, :, sl]                                  # [bk, D]
        v_h = v_ref[0, :, sl]
        dk_acc = jnp.zeros((bk, d), jnp.float32)
        dv_acc = jnp.zeros((bk, d), jnp.float32)
        for q0, qc in chunks:
            rows = pl.ds(q0, qc)
            q_raw = q_ref[0, rows, sl]                         # [qc, D]
            q2 = (
                q_raw.astype(jnp.float32) * (scale * _LOG2E)
            ).astype(in_dtype)
            s = jax.lax.dot_general(
                q2, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                  # [qc, bk]
            s = jnp.minimum(s + mask, 0.0)
            p = jnp.exp2(s - lse_ref[0, 0, g, rows][:, None])  # [qc, bk]
            do_h = do_ref[0, rows, sl]
            dv_acc += jax.lax.dot_general(
                p.astype(in_dtype), do_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                  # [bk, D]
            dp = jax.lax.dot_general(
                do_h, v_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                  # [qc, bk]
            ds = (p * (dp - delta_ref[0, 0, g, rows][:, None])
                  ).astype(in_dtype)
            dk_acc += jax.lax.dot_general(
                ds, q_raw, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                  # [bk, D]
            dq_part = jax.lax.dot_general(
                ds, k_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                  # [qc, D]
            dq_ref[0, rows, sl] += scale * dq_part
        dk_ref[0, :, sl] = (scale * dk_acc).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv_acc.astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_k", "clamp_c",
                              "interpret")
)
def flash_attention_packed_bwd(
    q: jax.Array,            # [B, N, H, D]
    k: jax.Array,
    v: jax.Array,
    o: jax.Array,
    lse: jax.Array,          # [b, h//g, g, n_q] from packed_lse
    do: jax.Array,
    num_heads: int,
    block_k: int | None = None,
    clamp_c: float = 50.0,
    interpret: bool = False,
):
    """Channel-packed fused flash backward (dq, dk, dv).

    Same math as flash_attention_bwd(fused=True) but with [B, N, C]
    blocks — removes the 8 per-layer [B*H, N, D] transposed copies the
    head-major backward pays (q/k/v/do/o in + dq/dk/dv out).

    block_k=None picks (block_k, q_chunk) via _packed_bwd_geometry:
    an adaptive MXU-wide kv block (512 at trunk scale, 256 otherwise)
    with the kernel chunking q internally so the [chunk, bk] scoped
    intermediates (~14 B/cell) fit the per-chunk budget (round-4's
    bk=128 fallback at trunk n_q=4224 is gone)."""
    b, n, h, d = q.shape
    c = h * d
    scale = 1.0 / (d**0.5)
    g, n_q_geom, _, _ = _packed_geometry(n, h, d)
    n_q = lse.shape[3]
    assert n_q == n_q_geom, (n_q, n_q_geom)
    if block_k is None:
        block_k, q_chunk = _packed_bwd_geometry(n_q)
    else:
        _, q_chunk = _packed_bwd_geometry(n_q, block_k)
    n_kv = -(-n // block_k) * block_k
    gcols = g * d

    def pad_packed(x, n_pad):
        return jnp.pad(
            x.reshape(b, n, c), ((0, 0), (0, n_pad - n), (0, 0))
        )

    qp = pad_packed(q, n_q)
    kp = pad_packed(k, n_kv)
    vp = pad_packed(v, n_kv)
    dop = pad_packed(do, n_q)
    op = pad_packed(o, n_q)
    # delta = rowsum(do * o) per head: elementwise + a per-head segment
    # sum in the packed layout, then the tiny [b, h, n_q] transpose into
    # lse's [b, h//g, g, n_q] block layout (1.6 MB f32 at trunk shapes —
    # nothing like the 52 MB q/k/v transposes this kernel avoids).
    delta = jnp.einsum(
        "bnhd->bhn",
        (dop.astype(jnp.float32) * op.astype(jnp.float32)).reshape(
            b, n_q, h, d),
    ).reshape(b, h // g, g, n_q)
    # padded q rows: p = 0 via lse = +inf
    lse_p = jnp.where(
        jnp.arange(n_q)[None, None, None] < n, lse, 1e30
    )
    mask = jnp.where(
        jnp.arange(n_kv) < n, -clamp_c * _LOG2E, _NEG_INF
    ).astype(jnp.float32)[None]

    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_packed_kernel, scale=scale,
                          heads_per_block=g, q_chunk=q_chunk),
        grid=(b, h // g, n_kv // block_k),
        in_specs=[
            pl.BlockSpec((1, n_q, gcols), lambda bi, hi, j: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, gcols),
                         lambda bi, hi, j: (bi, j, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, gcols),
                         lambda bi, hi, j: (bi, j, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_q, gcols), lambda bi, hi, j: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, n_q), lambda bi, hi, j: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, n_q), lambda bi, hi, j: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), lambda bi, hi, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n_q, gcols), lambda bi, hi, j: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, gcols),
                         lambda bi, hi, j: (bi, j, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, gcols),
                         lambda bi, hi, j: (bi, j, hi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_q, c), jnp.float32),
            jax.ShapeDtypeStruct((b, n_kv, c), k.dtype),
            jax.ShapeDtypeStruct((b, n_kv, c), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * n_q * n_kv * d,
            bytes_accessed=(3 * b * n_q * c + 4 * b * n_kv * c) * 2
            + 4 * b * n_q * c,
            transcendentals=b * h * n_q * n_kv,
        ),
        # Mosaic's default 16 MB scoped-VMEM check rejects trunk shapes
        # at bk=256 (18.21 MB requested — the unrolled q-chunk buffers
        # are not liveness-folded), but v5e has 128 MB VMEM and this
        # kernel's blocks total ~28 MB at trunk shape: raising the
        # per-kernel limit is the honest fix, not shrinking bk to 128
        # (which measured 28.3 vs 19.5 ms in round 4).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse_p, delta, mask)

    def unpack(x, n_pad):
        return x[:, :n].reshape(b, n, h, d)

    return (
        unpack(dq, n_q).astype(q.dtype),
        unpack(dk, n_kv),
        unpack(dv, n_kv),
    )


def _flash_kernel_single_lse(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                             *, scale: float):
    """_flash_kernel_single + per-row log2 softmax denominator.

    The backward kernels reconstruct p = exp2(min(s2 + mask, 0) - lse)
    bit-identically from this lse (= log2 of the clamped-softmax
    denominator l); emitting it costs one [bq] write."""
    in_dtype = q_ref.dtype
    q = (
        q_ref[0].astype(jnp.float32) * (scale * _LOG2E)
    ).astype(in_dtype)
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = jnp.minimum(s + mask_ref[0][None, :], 0.0)
    p = jnp.exp2(s)
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    o = jax.lax.dot_general(
        p.astype(in_dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)
    # lse is [bh, 1, n_q] (stats ride a size-1 sublane dim: Mosaic
    # requires the last two block dims divisible by (8, 128) or equal to
    # the array dims — a [1, block_q] block of a [bh, n_q] array fails
    # the sublane rule).
    lse_ref[0, 0] = jnp.log2(l)[:, 0]


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         mask_ref, dq_ref, *, scale: float):
    """dq for one (batch*head, q-block) program; whole K/V in VMEM.

    p is reconstructed with the forward's exact clamped-softmax math
    (min(s2 + mask, 0), exp2, saved log2-denominator), so gradients match
    differentiating the forward. ds = p * (dp - delta) holds in NATURAL
    log units (the ln2 of d exp2/ds2 cancels against s2's log2e factor),
    hence dq = scale * ds @ k with no log2 residue.
    """
    in_dtype = q_ref.dtype
    q2 = (
        q_ref[0].astype(jnp.float32) * (scale * _LOG2E)
    ).astype(in_dtype)                                         # [bq, D]
    s = jax.lax.dot_general(
        q2, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # [bq, n_kv]
    s = jnp.minimum(s + mask_ref[0][None, :], 0.0)
    p = jnp.exp2(s - lse_ref[0, 0][:, None])                   # [bq, n_kv]
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # [bq, n_kv]
    ds = p * (dp - delta_ref[0, 0][:, None])
    dq = jax.lax.dot_general(
        ds.astype(in_dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = (scale * dq).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          mask_ref, dk_ref, dv_ref, *, scale: float):
    """dk/dv for one (batch*head, kv-block) program; whole Q/dO in VMEM.

    Padded q rows carry lse=+1e30 (p -> 0) and zero do/delta, so they
    contribute nothing; padded kv columns only produce dk/dv rows that the
    caller slices off."""
    in_dtype = q_ref.dtype
    q_raw = q_ref[0]                                           # [n_q, D]
    q2 = (
        q_raw.astype(jnp.float32) * (scale * _LOG2E)
    ).astype(in_dtype)
    s = jax.lax.dot_general(
        q2, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # [n_q, bk]
    s = jnp.minimum(s + mask_ref[0][None, :], 0.0)
    p = jnp.exp2(s - lse_ref[0, 0][:, None])                   # [n_q, bk]
    dv = jax.lax.dot_general(
        p.astype(in_dtype), do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # [bk, D]
    dv_ref[0] = dv.astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # [n_q, bk]
    ds = p * (dp - delta_ref[0, 0][:, None])
    dk = jax.lax.dot_general(
        ds.astype(in_dtype), q_raw, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # [bk, D]
    dk_ref[0] = (scale * dk).astype(dk_ref.dtype)


def _flash_bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                            mask_ref, dq_ref, dk_ref, dv_ref, *,
                            scale: float):
    """dq + dk + dv for one (batch*head, kv-block) program.

    Fuses the dq/dkv pair: the s = qk^T and dp = do v^T contractions are
    computed ONCE per tile instead of once per kernel (5 matmuls total vs
    the split pair's 7 — measured 21.6 ms/layer -> see bench_flash_bwd
    --fused). dq accumulates across kv-block grid steps into a revisited
    f32 output block (standard Mosaic accumulate pattern: the block index
    is constant in j, so the buffer stays in VMEM and is written back once
    at the last step); the caller casts to the input dtype.

    Padding: padded q rows carry lse=+1e30 (p -> 0) and zero do/delta, so
    they contribute nothing to dk/dv and their dq rows are sliced off by
    the caller; padded kv columns are masked to -inf (p = 0, ds = 0) so
    they add nothing to dq and only produce dk/dv rows the caller drops.
    """
    j = pl.program_id(1)
    in_dtype = q_ref.dtype
    q_raw = q_ref[0]                                           # [n_q, D]
    q2 = (
        q_raw.astype(jnp.float32) * (scale * _LOG2E)
    ).astype(in_dtype)
    s = jax.lax.dot_general(
        q2, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # [n_q, bk]
    s = jnp.minimum(s + mask_ref[0][None, :], 0.0)
    p = jnp.exp2(s - lse_ref[0, 0][:, None])                   # [n_q, bk]
    dv = jax.lax.dot_general(
        p.astype(in_dtype), do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # [bk, D]
    dv_ref[0] = dv.astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # [n_q, bk]
    ds = (p * (dp - delta_ref[0, 0][:, None])).astype(in_dtype)
    dk = jax.lax.dot_general(
        ds, q_raw, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # [bk, D]
    dk_ref[0] = (scale * dk).astype(dk_ref.dtype)
    dq_part = jax.lax.dot_general(
        ds, k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # [n_q, D]

    @pl.when(j == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    dq_ref[0] += scale * dq_part


@functools.partial(
    jax.jit, static_argnames=("block_q", "clamp_c", "interpret")
)
def flash_attention_fwd_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 384,
    clamp_c: float = 50.0,
    interpret: bool = False,
):
    """Forward flash attention that ALSO returns the per-row log2 softmax
    denominator (residual for the Pallas backward). Single-KV-block
    clamped path only (N <= 6144 — every trunk shape); same exactness
    window as _flash_kernel_single."""
    b, n, h, d = q.shape
    scale = 1.0 / (d**0.5)
    n_kv = -(-n // 128) * 128
    assert n <= 6144, "fwd_lse is single-KV-block only"
    n_q = -(-n // block_q) * block_q
    qp = jnp.pad(q, ((0, 0), (0, n_q - n), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, n_kv - n), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_kv - n), (0, 0), (0, 0)))

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qb, kb, vb = to_bh(qp), to_bh(kp), to_bh(vp)
    mask = jnp.where(
        jnp.arange(n_kv) < n, -clamp_c * _LOG2E, _NEG_INF
    ).astype(jnp.float32)[None]

    grid = (b * h, n_q // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel_single_lse, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv), lambda bh, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, i: (bh, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n_q, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, n_q), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_q * n_kv * d,
            bytes_accessed=(2 * b * h * n_q * d + 2 * b * h * n_kv * d) * 2,
            transcendentals=b * h * n_q * n_kv,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(qb, kb, vb, mask)
    o = out.reshape(b, h, n_q, d).transpose(0, 2, 1, 3)[:, :n]
    return o, lse  # lse stays [b*h, 1, n_q] (backward-internal layout)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "clamp_c", "fused", "interpret"),
)
def flash_attention_bwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    o: jax.Array,
    lse: jax.Array,     # [b*h, 1, n_q] from flash_attention_fwd_lse
    do: jax.Array,
    block_q: int = 256,
    block_k: int = 256,
    clamp_c: float = 50.0,
    fused: bool = True,
    interpret: bool = False,
):
    """Pallas flash-attention backward (dq, dk, dv). Avoids the XLA
    fallback's materialized [B, H, N, N] probability/gradient tensors
    (6.8 GB per trunk block at b8/N4224 — the dominant cost of the
    unfrozen-trunk train step).

    fused=True (default): ONE kernel over (bh, kv-blocks) computing
    dk/dv and accumulating dq into a revisited f32 block — the shared
    s/dp contractions are computed once (5 matmuls; measured 21.6 ->
    14.8 ms/layer at b8 N4097, tools/bench_flash_bwd.py). fused=False:
    the FlashAttention-2 split pair (a dq kernel over q-blocks + a dk/dv
    kernel over kv-blocks; 7 matmuls)."""
    b, n, h, d = q.shape
    scale = 1.0 / (d**0.5)
    n_q_lse = lse.shape[2]
    n_q = -(-n // block_q) * block_q
    n_q = max(n_q, n_q_lse)
    n_kv = -(-n // block_k) * block_k

    def to_bh(x, n_pad):
        x = jnp.pad(
            x, ((0, 0), (0, n_pad - x.shape[1]), (0, 0), (0, 0))
        )
        return x.transpose(0, 2, 1, 3).reshape(b * h, n_pad, d)

    qb = to_bh(q, n_q)
    kb = to_bh(k, n_kv)
    vb = to_bh(v, n_kv)
    dob = to_bh(do, n_q)
    ob = to_bh(o, n_q)
    # delta = rowsum(do * o): cheap elementwise outside the kernels.
    # Stat arrays ride a size-1 sublane dim [bh, 1, n] (Mosaic block rule
    # — see _flash_kernel_single_lse).
    delta = jnp.sum(
        dob.astype(jnp.float32) * ob.astype(jnp.float32), axis=-1
    )[:, None]                                              # [bh, 1, n_q]
    # lse padded with +inf -> p = 0 for padded q rows.
    lse_p = jnp.pad(
        lse, ((0, 0), (0, 0), (0, n_q - n_q_lse)), constant_values=1e30
    )
    lse_p = jnp.where(
        jnp.arange(n_q)[None, None] < n, lse_p, 1e30
    )
    mask = jnp.where(
        jnp.arange(n_kv) < n, -clamp_c * _LOG2E, _NEG_INF
    ).astype(jnp.float32)[None]

    def from_bh(x, n_pad):
        return x.reshape(b, h, n_pad, d).transpose(0, 2, 1, 3)[:, :n]

    if fused:
        dq, dk, dv = pl.pallas_call(
            functools.partial(_flash_bwd_fused_kernel, scale=scale),
            grid=(b * h, n_kv // block_k),
            in_specs=[
                pl.BlockSpec((1, n_q, d), lambda bh, j: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, d), lambda bh, j: (bh, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, d), lambda bh, j: (bh, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_q, d), lambda bh, j: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n_q), lambda bh, j: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n_q), lambda bh, j: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k), lambda bh, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, n_q, d), lambda bh, j: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, d), lambda bh, j: (bh, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, d), lambda bh, j: (bh, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b * h, n_q, d), jnp.float32),
                jax.ShapeDtypeStruct((b * h, n_kv, d), k.dtype),
                jax.ShapeDtypeStruct((b * h, n_kv, d), v.dtype),
            ],
            cost_estimate=pl.CostEstimate(
                flops=10 * b * h * n_q * n_kv * d,
                bytes_accessed=(
                    3 * b * h * n_q * d + 4 * b * h * n_kv * d
                ) * 2 + 4 * b * h * n_q * d,
                transcendentals=b * h * n_q * n_kv,
            ),
            interpret=interpret,
        )(qb, kb, vb, dob, lse_p, delta, mask)
        return (
            from_bh(dq, n_q).astype(q.dtype),
            from_bh(dk, n_kv),
            from_bh(dv, n_kv),
        )

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale),
        grid=(b * h, n_q // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, i: (bh, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, i: (bh, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv), lambda bh, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n_q, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * n_q * n_kv * d,
            bytes_accessed=(3 * b * h * n_q * d + 2 * b * h * n_kv * d) * 2,
            transcendentals=b * h * n_q * n_kv,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(qb, kb, vb, dob, lse_p, delta, mask)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale),
        grid=(b * h, n_kv // block_k),
        in_specs=[
            pl.BlockSpec((1, n_q, d), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_q, d), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_q), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_q), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), lambda bh, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bh, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n_kv, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, n_kv, d), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * n_q * n_kv * d,
            bytes_accessed=(3 * b * h * n_q * d + 4 * b * h * n_kv * d) * 2,
            transcendentals=b * h * n_q * n_kv,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(qb, kb, vb, dob, lse_p, delta, mask)

    return from_bh(dq, n_q), from_bh(dk, n_kv), from_bh(dv, n_kv)


def _env_clamp() -> float | None:
    """OVMONO3D_ATTN_CLAMP: '' / unset -> 50 (default clamped single-pass
    kernel), 'none' -> online-softmax kernel (numerically unconditional),
    a float -> that clamp. The clamped kernel is exact only while per-row
    max raw logits stay within [C-87, C] (see _flash_kernel_single);
    audit a converted checkpoint with tools/check_attn_logits.py before
    trusting the default on new weights.

    This is the single audit knob: the windowed (Swin) clamped path and
    the SAM decomposed-rel-pos fast path (models/vit.py) derive their
    clamp from it too, so OVMONO3D_ATTN_CLAMP=none disables EVERY clamped
    softmax uniformly. OVMONO3D_WINDOW_CLAMP=0 additionally disables just
    the windowed/rel-pos paths (used by tools/probe_swin_floor.py)."""
    import os

    val = os.environ.get("OVMONO3D_ATTN_CLAMP", "").strip().lower()
    if not val:
        return 50.0
    if val == "none":
        return None
    return float(val)


# clamp is a static (nondiff) argument so the backward provably runs with
# the SAME clamp the forward was traced with — the env var is read exactly
# once, in dot_product_attention, never again at backward-trace time.
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_autoselect(q, k, v, clamp):
    if jax.default_backend() == "tpu":
        b, n, h, d = q.shape
        if clamp is not None and _use_packed(n, h, d):
            return flash_attention_packed(q, k, v, num_heads=h,
                                          clamp_c=clamp)
        return flash_attention(q, k, v, clamp_c=clamp)
    return attention_xla(q, k, v)


def _attn_fwd(q, k, v, clamp):
    if (jax.default_backend() == "tpu" and clamp is not None
            and q.shape[1] <= 6144):
        # Flash forward WITH the log2-denominator residual: the Pallas
        # backward reconstructs p blockwise instead of materializing the
        # [B, H, N, N] probability/gradient tensors the XLA fallback
        # needs (6.8 GB per trunk block at b8/N4224). The channel-packed
        # pair additionally removes the 12 per-layer [B*H, N, D]
        # transposed copies (4 fwd + 8 bwd) of the head-major kernels;
        # lse.ndim == 4 marks the packed residual layout for _attn_bwd.
        b, n, h, d = q.shape
        # The packed residual commits the BACKWARD to the packed kernel.
        # Small-n_q shapes (single q-chunk: Depth-Pro/BERT) are measured
        # wins. Large n_q (trunk 4224) lost in round 4 when scoped VMEM
        # forced bk=128 (28.3 vs 19.5 ms); the kernel now q-chunks
        # internally with an adaptive MXU-wide kv block (512 at trunk
        # scale) — _packed_bwd_wins gates the regime
        # (OVMONO3D_PACKED_BWD is the A/B override).
        if _use_packed(n, h, d) and _packed_bwd_wins():
            o, lse = flash_attention_packed_lse(q, k, v, num_heads=h,
                                                clamp_c=clamp)
        else:
            o, lse = flash_attention_fwd_lse(q, k, v, clamp_c=clamp)
        # Under jax.checkpoint with a save_only_these_names-style policy
        # (backbone.remat_policy="dots_attn"), these tags let the trunk
        # backward reuse the flash forward's out/lse residuals instead of
        # re-running the forward kernel per block (~5.5 ms/block @b8 896^2).
        o = checkpoint_name(o, "flash_attn_out")
        lse = checkpoint_name(lse, "flash_attn_lse")
        return o, (q, k, v, o, lse)
    return _attention_autoselect(q, k, v, clamp), (q, k, v, None, None)


def _attn_bwd(clamp, res, g):
    q, k, v, o, lse = res
    if lse is not None:
        if lse.ndim == 4:
            return flash_attention_packed_bwd(
                q, k, v, o, lse, g, num_heads=q.shape[2], clamp_c=clamp)
        return flash_attention_bwd(q, k, v, o, lse, g, clamp_c=clamp)
    # Differentiate the XLA reference path (identical math).
    _, vjp = jax.vjp(attention_xla, q, k, v)
    return vjp(g)


_attention_autoselect.defvjp(_attn_fwd, _attn_bwd)


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Best-available fused attention; [B, N, H, D] in and out."""
    return _attention_autoselect(q, k, v, _env_clamp())


# ---------------- fused window attention (Swin trunk) ----------------
#
# Swin's windowed MHA (models/gdino/swin.py; reference swin_B_384_22k via
# groundingdino, SURVEY.md §2.3) has tiny windows (N = 144 tokens) but many
# of them: the XLA path materializes [num_windows, H, N, N] f32 logits in
# HBM between the two matmuls (~53 MB per stage-2 block). The fused kernel
# keeps the logits, relative-position bias and shifted-window mask of one
# (head, window) program entirely in VMEM; the shift mask is expanded
# in-kernel from per-token region ids, so its DMA is [N] ints instead of
# [N, N] floats.


def window_attention_xla(
    q: jax.Array,            # [BW, N, H, D]  (BW = batch * num_windows)
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,         # [H, N, N] f32 relative-position bias
    ids: jax.Array | None = None,   # [nw, N] int32 region ids (shift mask)
    clamp_c: float | None = None,
) -> jax.Array:
    """Reference windowed attention: softmax(q k^T / sqrt(D) + bias + mask) v.

    Region ids expand to the additive mask (equal ids -> 0, else -1e9),
    matching the original shifted-window semantics.

    clamp_c enables the clamped single-pass softmax (same construction and
    exactness window as _flash_kernel_single: exact while per-row max of
    scale*qk + bias stays in [C-87, C]): exp2 of log2e-scaled logits offset
    by -C and clamped to <=0, which removes the row-max reduce — one fewer
    full HBM pass over the [BW, H, N, N] f32 logits, the dominant traffic
    of the Swin trunk's many tiny windows.
    """
    BW, N, H, D = q.shape
    scale = 1.0 / (D**0.5)
    if clamp_c is not None:
        scale = scale * _LOG2E
    attn = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    attn = attn + (bias[None] * _LOG2E if clamp_c is not None else bias[None])
    if ids is not None:
        nw = ids.shape[0]
        m = jnp.where(
            ids[:, :, None] == ids[:, None, :], 0.0, -1e9
        ).astype(jnp.float32)
        attn = attn.reshape(BW // nw, nw, H, N, N) + m[None, :, None]
        attn = attn.reshape(BW, H, N, N)
    if clamp_c is not None:
        # Unnormalized probs into the PV matmul; normalize the [N, D]
        # output instead of the [N, N] probs (smaller tensor, one fewer
        # big pass). Cast p to the PV dtype BEFORE the row-sum so the
        # [BW, H, N, N] probs materialize ONCE in bf16 (the sum
        # f32-accumulates from it) instead of once in f32 for l plus the
        # bf16 copy for the matmul — halves the dominant HBM traffic of
        # the many-tiny-window trunk. Rounding p to bf16 adds ~2^-9
        # relative error to l; the PV numerator already consumed the
        # rounded p, so numerator/denominator stay consistent.
        p = jnp.exp2(jnp.minimum(attn - clamp_c * _LOG2E, 0.0)).astype(
            v.dtype
        )
        l = jnp.sum(p, axis=-1, keepdims=True,
                    dtype=jnp.float32)               # [BW, H, N, 1]
        out = jnp.einsum(
            "bhnm,bmhd->bnhd", p, v,
            preferred_element_type=jnp.float32,
        ) / jnp.maximum(jnp.moveaxis(l, 1, 2), 1e-30)
        return out.astype(q.dtype)
    p = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _window_kernel(q_ref, k_ref, v_ref, b_ref, ids_ref, o_ref, *,
                   scale: float):
    """One G-window-group program, ALL heads: logits stay in VMEM.

    Refs are native-layout [BW, N, H, D] blocks of (G, N, H, D) — the
    trailing two block dims equal the array dims, satisfying the Mosaic
    tiling rule, and the head-major relayout happens in-VMEM (vector
    shuffles) instead of as an HBM transpose (a ~2.6 ms tax in the v1
    head-major-grid kernel). The G windows x H heads run as one batched
    dot_general so each program amortizes its launch overhead."""
    G, N, H, D = q_ref.shape
    # Mosaic only lowers single-batch-dim matmuls: collapse (G, H) after
    # the in-VMEM head-major relayout (major-dim reshape, free).
    q = jnp.transpose(q_ref[:], (0, 2, 1, 3)).reshape(G * H, N, D)
    k = jnp.transpose(k_ref[:], (0, 2, 1, 3)).reshape(G * H, N, D)
    v = jnp.transpose(v_ref[:], (0, 2, 1, 3)).reshape(G * H, N, D)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                                   # [G*H, N, N] f32
    s = s + jnp.broadcast_to(b_ref[:][None], (G, H, N, N)).reshape(
        G * H, N, N
    )
    ids = ids_ref[:, :, 0]                      # [G, N]
    m = jnp.where(ids[:, :, None] == ids[:, None, :], 0.0, -1e9)
    s = s + jnp.broadcast_to(m[:, None], (G, H, N, N)).reshape(G * H, N, N)
    mx = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - mx)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                           # [G*H, N, D]
    o = jnp.transpose(o.reshape(G, H, N, D), (0, 2, 1, 3))
    o_ref[:] = o.astype(o_ref.dtype)


# f32 logits scratch budget per program. The kernel body holds ~4 live
# logits-sized f32 buffers (s, bias/mask broadcasts, p) plus the relayouted
# qkv copies, so this must stay well under the 16 MB VMEM scoped limit.
_LOGITS_VMEM_CAP = 2 << 20


def _group_size(BW: int, N: int, H: int) -> int:
    """Largest divisor of BW keeping the f32 logits block under the cap."""
    cap = max(1, _LOGITS_VMEM_CAP // (H * N * N * 4))
    g = 1
    for d in range(1, min(BW, cap) + 1):
        if BW % d == 0:
            g = d
    return g


@functools.partial(jax.jit, static_argnames=("interpret",))
def window_attention_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    ids: jax.Array,         # [BW, N] int32 region ids
    interpret: bool = False,
) -> jax.Array:
    BW, N, H, D = q.shape
    ids = ids[:, :, None]   # [BW, N, 1] — trailing block dims = array dims
    scale = 1.0 / (D**0.5)
    G = _group_size(BW, N, H)

    grid = (BW // G,)
    qspec = pl.BlockSpec(
        (G, N, H, D), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    bspec = pl.BlockSpec(
        (H, N, N), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
    )
    ispec = pl.BlockSpec(
        (G, N, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_window_kernel, scale=scale),
        grid=grid,
        in_specs=[qspec, qspec, qspec, bspec, ispec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((BW, N, H, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * BW * H * N * N * D,
            bytes_accessed=4 * BW * N * H * D * 2,
            transcendentals=BW * H * N * N,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(q, k, v, bias, ids)


def window_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    ids: jax.Array | None = None,
) -> jax.Array:
    """Best-available windowed attention; [BW, N, H, D] in and out.

    Forward-only (the Swin trunk is frozen / inference-only in the
    reference pipeline, roi_heads_gdino.py:87-91); gradients fall back to
    the XLA path by construction only if the caller uses
    `window_attention_xla` directly.

    The fused Pallas kernel is opt-in (OVMONO3D_WINDOW_PALLAS=1): measured
    on v5e at Swin-B@800 shapes it LOSES to the XLA path (best variant
    20.3 ms vs 18.3 ms whole-trunk). Variants tried: head-major grid with
    G-window batching (20.3 ms — pays ~2.6 ms of HBM transposes), native
    layout all-heads-per-program (VMEM-OOMs above a 2 MB logits cap, then
    launch-bound at G=1). The [N=144, D=32] geometry leaves the MXU 25%
    utilized on QK^T whatever the schedule, and XLA's batched-matmul HBM
    round-trip is only ~3.7 ms of the 11.1 ms attention total — kept for
    re-evaluation on larger windows/batches where per-program work
    amortizes.
    """
    BW, N, H, D = q.shape
    if (os.environ.get("OVMONO3D_WINDOW_PALLAS") == "1"
            and jax.default_backend() == "tpu" and N % 8 == 0 and N >= 64
            and H * N * N * 4 <= _LOGITS_VMEM_CAP):
        if ids is None:
            full = jnp.zeros((BW, N), jnp.int32)
        else:
            nw = ids.shape[0]
            full = jnp.tile(ids, (BW // nw, 1))
        return window_attention_pallas(q, k, v, bias, full)
    clamp = None
    if (jax.default_backend() == "tpu"
            and os.environ.get("OVMONO3D_WINDOW_CLAMP", "1") != "0"):
        clamp = _env_clamp()
    return window_attention_xla(q, k, v, bias, ids, clamp_c=clamp)

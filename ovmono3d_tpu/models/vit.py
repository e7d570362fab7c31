"""DINOv2-style Vision Transformer backbone in Flax (TPU-first).

Re-design of the reference's torch.hub DINOv2 wrapper
(cubercnn/modeling/backbone/dino.py:14-120; SURVEY.md §2.1 #7) as a native
Flax module:

- bf16 activations/matmuls on the MXU; f32 params and layernorm statistics.
- static shapes: the token count is fixed by the (padded) input resolution,
  so the whole trunk jits once per config.
- positional embeddings stored at the pretraining grid and bicubically
  resized to the runtime grid inside the graph (matches DINOv2's
  interpolate_pos_encoding).
- optional depth-prompt fusion: a depth map resized to the patch grid is
  concatenated to the *last* block's patch tokens and projected back to C by
  a 1x1 conv (reference dino.py:83-105, cfg MODEL.DINO.USE_DEPTH_FUSION).
- attention is pluggable: einsum path (XLA fuses into MXU) or the Pallas
  flash kernel in ops/attention.py.
"""
from __future__ import annotations

import functools
from dataclasses import field
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ovmono3d_tpu.ops.attention import _LOG2E, dot_product_attention
from ovmono3d_tpu.ops.quant import QDense

Dtype = Any


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding as space-to-depth + matmul.

    Numerically identical to the usual stride-p Conv (the kernel param keeps
    the Conv HWIO layout so checkpoint converters are unchanged) but ~20x
    faster on TPU: XLA lowers the large-stride conv poorly (profiled 1.35 ms
    vs a ~0.06 ms matmul @896^2 p14).

    Returns [B, h*w, C] flattened patch tokens.
    """

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        B, H, W, c_in = images.shape
        p = self.patch_size
        h, w = H // p, W // p
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, c_in, self.embed_dim),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32
        )
        patches = images.astype(self.dtype).reshape(B, h, p, w, p, c_in)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, h * w, p * p * c_in
        )
        k2d = kernel.reshape(p * p * c_in, self.embed_dim)
        return patches @ k2d.astype(self.dtype) + bias.astype(self.dtype)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.bfloat16
    # OpenAI CLIP towers use QuickGELU (x * sigmoid(1.702 x)) instead of the
    # exact erf gelu (open_clip quick_gelu=True for 'openai' checkpoints).
    quick_gelu: bool = False
    quant: str = "none"       # opt-in int8 serving path (ops/quant.py)
    # "tanh": opt-in approximate-gelu SERVING epilogue. MEASURED (v5e,
    # tools/probe_gelu_tail.py, 2026-08-21): XLA's exact-erf epilogue
    # costs +1.185 ms on the Depth-Pro fc1 fusion (3.38 vs 2.19 ms bare
    # matmul, 51 -> 79 TF/s) while tanh-gelu is free (+0.018 ms) — ~28
    # ms/image across Depth-Pro's 24 ViT-L layers, ~38 across SAM
    # ViT-H's 32. NOT bit-identical: 405/65280 bf16 inputs round 1 ulp
    # differently in the activation range (exhaustive bf16 sweep, round
    # 5); default stays "erf" (the released models' op), GEO serving
    # opts in (the reference itself runs Depth-Pro in fp16 — far
    # coarser than tanh-vs-erf at bf16, ovmono3d_geo.py:266-268).
    gelu: str = "erf"

    @nn.compact
    def __call__(self, x):
        x = QDense(self.hidden_dim, quant=self.quant, dtype=self.dtype,
                   name="fc1")(x)
        if self.quick_gelu:
            x = x * jax.nn.sigmoid(1.702 * x)
        else:
            x = nn.gelu(x, approximate=self.gelu == "tanh")
        x = QDense(self.out_dim, quant=self.quant, dtype=self.dtype,
                   name="fc2")(x)
        return x


def _resize_rel_pos(rel_pos: jax.Array, size: int) -> jax.Array:
    """Linear-resize a decomposed relative-position table to 2*size-1 rows
    (segment_anything get_rel_pos uses F.interpolate(mode='linear'), which
    does NOT antialias on downscale — jax.image.resize would)."""
    target = 2 * size - 1
    if rel_pos.shape[0] == target:
        return rel_pos
    return jax.image.resize(
        rel_pos, (target, rel_pos.shape[1]), method="linear",
        antialias=False,
    )


def _rel_pos_attention_fast(q, k, v, Rh, Rw, hw, clamp=None):
    """bf16 decomposed-rel-pos attention: single-pass MXU matmuls with f32
    accumulation; optional clamped single-pass exp2 softmax (same
    construction and exactness window as window_attention_xla — exact
    while per-row max of scale*qk + bias stays in [clamp-87, clamp];
    audit converted checkpoints with tools/check_attn_logits.py).

    q/k/v: [B, N, H, D] (compute dtype); Rh: [h, h, D]; Rw: [w, w, D]
    (cast to the compute dtype by the caller). Returns [B, N, H, D]."""
    B, N, H, D = q.shape
    h, w = hw
    scale = D ** -0.5
    log2e = _LOG2E if clamp is not None else 1.0
    qg = q.transpose(0, 2, 1, 3).reshape(B, H, h, w, D)
    bias_h = jnp.einsum("bnhwc,hkc->bnhwk", qg, Rh,
                        preferred_element_type=jnp.float32)
    bias_w = jnp.einsum("bnhwc,wkc->bnhwk", qg, Rw,
                        preferred_element_type=jnp.float32)
    attn = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32,
    ) * (scale * log2e)
    attn = attn.reshape(B, H, h, w, h, w)
    attn = attn + (bias_h[..., :, None] + bias_w[..., None, :]) * log2e
    attn = attn.reshape(B, H, N, N)
    if clamp is not None:
        # Unnormalized probs into PV; normalize the [N, D] output instead
        # of the [N, N] probs (one fewer full pass over the logits). Cast
        # p to the PV dtype BEFORE the row-sum so the [B, H, N, N] probs
        # materialize once in bf16 instead of f32-for-l + bf16-for-PV
        # (window_attention_xla has the same reorder and rationale).
        p = jnp.exp2(jnp.minimum(attn - clamp * _LOG2E, 0.0)).astype(
            v.dtype
        )
        l = jnp.sum(p, axis=-1, keepdims=True,
                    dtype=jnp.float32)                  # [B, H, N, 1]
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", p, v,
            preferred_element_type=jnp.float32,
        ) / jnp.maximum(jnp.moveaxis(l, 1, 2), 1e-30)
        return out.astype(q.dtype)
    p = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _rel_pos_attention_autoselect(q, k, v, Rh, Rw, grid_hw, clamp):
    """bf16 rel-pos attention dispatcher: the Pallas rel_pos_flash_
    attention kernel where eligible (TPU, clamped, full-grid token set;
    in-kernel bias expansion — see the kernel docstring), else
    _rel_pos_attention_fast. Wrapped in custom_vjp so rel-pos trunks
    stay DIFFERENTIABLE: pallas_call has no autodiff rule, and without
    this wrapper unfrozen fine-tuning of a SAM-style backbone on TPU
    would crash at trace time; the backward differentiates the XLA fast
    path (the exact pre-kernel training behavior)."""
    import os

    h, w = grid_hw
    B, N, H, D = q.shape
    if (clamp is not None and N == h * w
            and jax.default_backend() == "tpu"
            and os.environ.get("OVMONO3D_RELPOS_FLASH", "1") != "0"):
        from ovmono3d_tpu.ops.attention import rel_pos_flash_attention

        q_tok = q.reshape(B, h, w, H, D)
        qrh = jnp.einsum(
            "brcnd,rkd->brcnk", q_tok, Rh,
            preferred_element_type=jnp.float32,
        ).reshape(B, N, H, h)
        qrw = jnp.einsum(
            "brcnd,ckd->brcnk", q_tok, Rw,
            preferred_element_type=jnp.float32,
        ).reshape(B, N, H, w)
        return rel_pos_flash_attention(q, k, v, qrh, qrw, (h, w), H,
                                       clamp_c=clamp)
    return _rel_pos_attention_fast(q, k, v, Rh, Rw, (h, w), clamp)


def _rpa_fwd(q, k, v, Rh, Rw, grid_hw, clamp):
    return (_rel_pos_attention_autoselect(q, k, v, Rh, Rw, grid_hw,
                                          clamp),
            (q, k, v, Rh, Rw))


def _rpa_bwd(grid_hw, clamp, res, g):
    q, k, v, Rh, Rw = res
    _, vjp = jax.vjp(
        lambda *a: _rel_pos_attention_fast(*a, grid_hw, clamp),
        q, k, v, Rh, Rw,
    )
    return vjp(g)


_rel_pos_attention_autoselect.defvjp(_rpa_fwd, _rpa_bwd)


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Dtype = jnp.bfloat16
    # SAM image-encoder decomposed relative position embeddings
    # (segment_anything add_decomposed_rel_pos). `rel_pos_size` is the grid
    # side the tables were trained at (window or pretrain grid).
    use_rel_pos: bool = False
    rel_pos_size: int = 0
    quant: str = "none"       # opt-in int8 serving path (ops/quant.py)

    @nn.compact
    def __call__(self, x, grid_hw: tuple[int, int] | None = None):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = QDense(self.dim * 3, quant=self.quant, dtype=self.dtype,
                     name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, D]
        if self.use_rel_pos:
            assert grid_hw is not None, "rel-pos attention needs grid_hw"
            out = self._rel_pos_attention(q, k, v, grid_hw, head_dim)
        else:
            out = dot_product_attention(q, k, v)  # [B, N, H, D]
        out = out.reshape(B, N, C)
        return QDense(self.dim, quant=self.quant, dtype=self.dtype,
                      name="proj")(out)

    def _rel_pos_attention(self, q, k, v, grid_hw, head_dim):
        """softmax(QK/sqrt(d) + decomposed rel-pos bias) V.

        Compute-dtype dispatch (the deformable.py convention): f32 models
        (the HF-crossval configuration) keep all-f32 matmuls — exact vs
        the original segment_anything add_decomposed_rel_pos; bf16 models
        (production) run single-pass MXU matmuls with f32 accumulation
        and, on TPU, the clamped single-pass exp2 softmax
        (window_attention_xla's construction — removes the row-max reduce
        pass over the [B, H, N, N] logits, the dominant HBM traffic of
        the SAM trunk's 4096-token global blocks)."""
        h, w = grid_hw
        B = q.shape[0]
        n_rel = 2 * self.rel_pos_size - 1
        rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                           (n_rel, head_dim), jnp.float32)
        rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                           (n_rel, head_dim), jnp.float32)
        Rh = _resize_rel_pos(rel_h, h)
        Rw = _resize_rel_pos(rel_w, w)
        idx_h = jnp.arange(h)[:, None] - jnp.arange(h)[None, :] + h - 1
        idx_w = jnp.arange(w)[:, None] - jnp.arange(w)[None, :] + w - 1
        Rh = Rh[idx_h]  # [h, h, D]
        Rw = Rw[idx_w]  # [w, w, D]
        if self.dtype != jnp.float32:
            import os

            from ovmono3d_tpu.ops.attention import _env_clamp

            # Same audit knob as every other clamped softmax:
            # OVMONO3D_ATTN_CLAMP=none disables this path's clamp too
            # (OVMONO3D_WINDOW_CLAMP=0 disables just the window/rel-pos
            # clamps — see _env_clamp's docstring).
            clamp = None
            if (jax.default_backend() == "tpu"
                    and os.environ.get("OVMONO3D_WINDOW_CLAMP", "1") != "0"):
                clamp = _env_clamp()
            # Dispatch through the differentiable autoselect: the Pallas
            # rel_pos_flash_attention kernel where eligible (the XLA path
            # pays ~1 GB of HBM traffic per bias broadcast-add over the
            # [H, N, N] grid on GLOBAL blocks — 13.9 -> 4.8 ms at vit_h
            # 64x64 — and loses on windowed ones too, 3.83 -> 3.25 ms;
            # tools/probe_sam_global_attn.py, diffs <= 5e-4 bf16), with
            # the XLA fast path as both the fallback and the backward.
            return _rel_pos_attention_autoselect(
                q, k, v, Rh.astype(q.dtype), Rw.astype(q.dtype),
                (h, w), clamp)
        qg = q.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(
            B, self.num_heads, h, w, head_dim
        )
        bias_h = jnp.einsum("bnhwc,hkc->bnhwk", qg, Rh)
        bias_w = jnp.einsum("bnhwc,wkc->bnhwk", qg, Rw)
        scale = head_dim ** -0.5
        attn = jnp.einsum(
            "bqhd,bkhd->bhqk", q.astype(jnp.float32) * scale,
            k.astype(jnp.float32), preferred_element_type=jnp.float32,
        )
        attn = attn.reshape(B, self.num_heads, h, w, h, w)
        attn = attn + bias_h[..., :, None] + bias_w[..., None, :]
        attn = attn.reshape(B, self.num_heads, h * w, h * w)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", attn, v.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return out.astype(self.dtype)


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,),
            jnp.float32,
        )
        return x * gamma.astype(self.dtype)


class LayerNormBf16Out(nn.Module):
    """LayerNorm with f32 statistics but output written directly in the
    compute dtype. Same math as nn.LayerNorm(dtype=f32) followed by a cast
    (the consumer casts to bf16 anyway); skipping the intermediate f32
    materialization halves this memory-bound op's traffic. Param names
    match nn.LayerNorm (scale/bias) for checkpoint compatibility."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,),
                          jnp.float32)
        # NOTE: a Pallas fused LN (ops/layernorm.py) was built and measured
        # against this path: STANDALONE both run at HBM bandwidth
        # (0.016-0.018 ms at [8,4097,768] bf16), and wiring the kernel in
        # made the b8 train step SLOWER (222.9 vs 217.1 ms) by breaking
        # XLA's surrounding fusions — the 2.31 ms "convert_reduce_fusion"
        # entries in the step profile are stall/fusion attribution, not LN
        # cost. Keep the inline math; the kernel stays available for
        # shapes XLA mishandles.
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = jnp.square(xf - mean).mean(-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layerscale: bool = True
    dtype: Dtype = jnp.bfloat16
    use_rel_pos: bool = False
    rel_pos_size: int = 0
    quick_gelu: bool = False
    norm_eps: float = 1e-6
    quant: str = "none"       # opt-in int8 serving path (ops/quant.py)
    gelu: str = "erf"         # opt-in "tanh" serving epilogue (Mlp.gelu)
    # SAM-style windowed attention: partition the (normed) token grid into
    # window x window tiles around the attention only. Padding happens
    # AFTER norm1 with zeros — the original's ordering (segment_anything
    # image_encoder Block.forward: x = norm1(x); window_partition pads) —
    # so padded keys contribute exactly b_v, not LN(0)-driven values.
    window: int = 0

    @nn.compact
    def __call__(self, x, grid_hw: tuple[int, int] | None = None):
        B, N, C = x.shape
        h = LayerNormBf16Out(epsilon=self.norm_eps, dtype=self.dtype,
                             name="norm1")(x)
        attn = Attention(
            self.dim, self.num_heads, self.dtype,
            use_rel_pos=self.use_rel_pos, rel_pos_size=self.rel_pos_size,
            quant=self.quant, name="attn",
        )
        if self.window > 0:
            H, W = grid_hw
            win = self.window
            hp = -(-H // win) * win
            wp = -(-W // win) * win
            g = h.reshape(B, H, W, C)
            g = jnp.pad(g, ((0, 0), (0, hp - H), (0, wp - W), (0, 0)))
            g = g.reshape(B, hp // win, win, wp // win, win, C)
            g = g.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, C)
            g = attn(g, (win, win) if self.use_rel_pos else None)
            g = g.reshape(B, hp // win, wp // win, win, win, C)
            g = g.transpose(0, 1, 3, 2, 4, 5).reshape(B, hp, wp, C)
            h = g[:, :H, :W].reshape(B, N, C)
        else:
            h = attn(h, grid_hw)
        if self.layerscale:
            h = LayerScale(self.dim, dtype=self.dtype, name="ls1")(h)
        x = x + h
        h = LayerNormBf16Out(epsilon=self.norm_eps, dtype=self.dtype,
                             name="norm2")(x)
        h = Mlp(
            int(self.dim * self.mlp_ratio), self.dim, self.dtype,
            quick_gelu=self.quick_gelu, quant=self.quant, gelu=self.gelu,
            name="mlp"
        )(h)
        if self.layerscale:
            h = LayerScale(self.dim, dtype=self.dtype, name="ls2")(h)
        return x + h


def sincos_pos_embed_2d(dim: int, grid_hw: tuple[int, int]) -> jax.Array:
    """MAE fixed 2D sin-cos positional embeddings, rebuilt at the runtime
    grid (transformers vit_mae get_2d_sincos_pos_embed semantics as used by
    the reference's dynamic rebuild, mae.py:152-179: the FIRST half of the
    channels encodes the COLUMN index — 'here w goes first'). Returns
    [h*w, dim], row-major."""
    h, w = grid_hw
    quarter = dim // 4
    omega = 1.0 / 10000 ** (jnp.arange(quarter, dtype=jnp.float32) / quarter)

    def one_d(pos):  # pos [N] -> [N, dim // 2]
        x = pos[:, None] * omega[None]
        return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)

    cols = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)
    rows = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
    return jnp.concatenate([one_d(cols), one_d(rows)], axis=-1)


def _torch_bicubic_weights(
    src: int, dst: int, scale: float | None = None
) -> "jnp.ndarray":
    """1-D interpolation matrix [dst, src] matching torch F.interpolate
    (mode='bicubic', align_corners=False, antialias=False): Keys cubic with
    a = -0.75 (jax.image.resize uses a = -0.5), half-pixel mapping
    x_src = (i + 0.5) / s - 0.5, border-replicated taps. When `scale` is
    given, the mapping uses it instead of dst/src — DINOv2's
    interpolate_pos_encoding passes scale_factor = (dst + 0.1) / src."""
    import numpy as np

    a = -0.75
    s = scale if scale is not None else dst / src

    def k(t):
        t = np.abs(t)
        return np.where(
            t <= 1, ((a + 2) * t - (a + 3)) * t * t + 1,
            np.where(t < 2, a * (((t - 5) * t + 8) * t - 4), 0.0),
        )

    x = (np.arange(dst) + 0.5) / s - 0.5
    x0 = np.floor(x).astype(np.int64)
    w = np.zeros((dst, src), np.float64)
    for tap in (-1, 0, 1, 2):
        idx = x0 + tap
        wt = k(x - idx)
        np.add.at(w, (np.arange(dst), np.clip(idx, 0, src - 1)), wt)
    return jnp.asarray(w.astype(np.float32))


def resize_pos_embed(
    pos_embed: jax.Array, grid_hw: tuple[int, int],
    interpolate_offset: float = 0.0,
) -> jax.Array:
    """Bicubic-resize patch positional embeddings to a new grid, exactly as
    torch would (the converters load tables the trunks interpolate with
    F.interpolate at runtime; see _torch_bicubic_weights).

    `interpolate_offset` selects DINOv2's scale-factor mapping
    (interpolate_pos_encoding: scale_factor = (new + 0.1) / old); 0 is the
    size-based mapping used by the CLIP/SAM/MiDaS resize helpers.

    pos_embed: [1, 1 + G*G, C] (cls first). Returns [1, 1 + h*w, C].
    """
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:]
    g = int(round(patch_pe.shape[1] ** 0.5))
    c = patch_pe.shape[-1]
    h, w = grid_hw
    if (g, g) != (h, w):
        sy = (h + interpolate_offset) / g if interpolate_offset else None
        sx = (w + interpolate_offset) / g if interpolate_offset else None
        wy = _torch_bicubic_weights(g, h, sy)
        wx = _torch_bicubic_weights(g, w, sx)
        patch_pe = patch_pe.reshape(g, g, c)
        # HIGHEST: XLA's default f32 matmul runs bf16 passes on TPU, which
        # would throw away the torch-exactness this path exists for.
        patch_pe = jnp.einsum("hg,gkc->hkc", wy, patch_pe,
                              precision=jax.lax.Precision.HIGHEST)
        patch_pe = jnp.einsum("wk,hkc->hwc", wx, patch_pe,
                              precision=jax.lax.Precision.HIGHEST)
        patch_pe = patch_pe.reshape(1, h * w, c)
    return jnp.concatenate([cls_pe, patch_pe], axis=1)


class VisionTransformer(nn.Module):
    """Configurable ViT trunk. Input NHWC image, output dense feature map.

    Defaults mirror dinov2 vitb14; the knobs cover the reference's other
    foundation trunks (SURVEY.md §2.1 #8-#11):
      - CLIP:  `pre_ln=True` (ln_pre after embedding), no layerscale
      - MAE:   plain ViT, no layerscale
      - SAM:   `window_size=14` windowed blocks (global at
               `global_blocks`), `use_cls_token=False`, a final
               `neck_channels=256` conv neck
      - MiDaS: ViT-L/16 trunk, no layerscale
    """

    patch_size: int = 14
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    pretrain_grid: int = 37  # dinov2 trained at 518/14
    layerscale: bool = True
    use_depth_fusion: bool = True
    use_cls_token: bool = True
    pre_ln: bool = False           # CLIP ln_pre
    quick_gelu: bool = False       # CLIP (openai) QuickGELU MLPs
    gelu: str = "erf"              # opt-in "tanh" serving epilogue
                                   # (Mlp.gelu — measured caveat there)
    pos_interp_offset: float = 0.0  # DINOv2 interpolate_pos_encoding uses
                                   # scale_factor=(new+0.1)/old; the other
                                   # trunks resize size-based (offset 0)
    norm_eps: float = 1e-6         # block LayerNorm eps (CLIP 1e-5,
                                   # HF ViT/MAE 1e-12, dinov2/SAM 1e-6)
    pos_sincos: bool = False       # MAE fixed 2D sin-cos pos embeddings,
                                   # rebuilt exactly at the runtime grid
                                   # (mae.py:61-76 resize_pos_embed; no
                                   # learned table, cls row is zero)
    window_size: int = 0           # SAM-style windowed attention
    global_blocks: Sequence[int] = ()  # blocks with global attn when windowed
    use_rel_pos: bool = False      # SAM decomposed relative-position attn
    neck_channels: int = 0         # SAM neck (1x1 + 3x3 conv to C')
    out_layers: Sequence[int] = ()  # extra block indices to also return
    final_norm: bool = False       # trailing LayerNorm on the last block's
                                   # tokens (DINOv2's `norm`; the detection
                                   # backbone skips it like the reference's
                                   # DINOBackbone, Depth-Pro consumes it)
    remat: bool = False            # rematerialize blocks in backward
    remat_policy: str = "full"     # full | dots (save dot outputs, recompute
                                   # only elementwise — less recompute, more HBM)
    quant: str = "none"            # "int8": W8A8 dynamic-quant serving path
                                   # for qkv/proj/fc1/fc2 (ops/quant.py)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jax.Array, prompt_depth: jax.Array | None = None):
        """images: [B, H, W, 3] (normalized); prompt_depth: [B, H', W', 1].

        Returns dict with 'last_feat': [B, h, w, C] dense patch features
        (h = H // patch_size), plus 'cls': [B, C].
        """
        B, H, W, _ = images.shape
        h, w = H // self.patch_size, W // self.patch_size

        x = PatchEmbed(
            self.patch_size, self.embed_dim, self.dtype, name="patch_embed"
        )(images)

        n_prefix = 1 if self.use_cls_token else 0
        if self.pos_sincos:
            pe = sincos_pos_embed_2d(self.embed_dim, (h, w))
            pos_embed = jnp.concatenate(
                [jnp.zeros((1, n_prefix, self.embed_dim)), pe[None]], axis=1
            )
        else:
            pos_embed = self.param(
                "pos_embed",
                nn.initializers.normal(0.02),
                (1, n_prefix + self.pretrain_grid**2, self.embed_dim),
                jnp.float32,
            )
        if self.use_cls_token:
            cls_token = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim),
                jnp.float32,
            )
            x = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        cls_token, (B, 1, self.embed_dim)
                    ).astype(x.dtype),
                    x,
                ],
                axis=1,
            )
            pe_full = (pos_embed if self.pos_sincos
                       else resize_pos_embed(pos_embed, (h, w),
                                             self.pos_interp_offset))
            x = x + pe_full.astype(x.dtype)
        else:
            if self.pos_sincos:
                pe = pos_embed[:, n_prefix:]
            else:
                pe = resize_pos_embed(
                    jnp.concatenate(
                        [jnp.zeros((1, 1, self.embed_dim)), pos_embed],
                        axis=1,
                    ),
                    (h, w),
                    self.pos_interp_offset,
                )[:, 1:]
            x = x + pe.astype(x.dtype)
        if self.pre_ln:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name="ln_pre")(x).astype(self.dtype)

        n_prefix = 1 if self.use_cls_token else 0
        extra = {}
        for i in range(self.depth):
            windowed = (
                self.window_size > 0 and i not in self.global_blocks
            )
            if windowed:
                # NOTE (round 5, measured dead end): running consecutive
                # windowed blocks window-major with a single partition/
                # unpartition pair is numerically exact (pad rows zeroed
                # after norm1 reproduce pad-after-norm; SAM HF crossval
                # passed) but buys NOTHING on v5e — the encoder's 42 ms
                # of copy/reshape is the rel-pos attention's internal
                # layout, not the window partition, and the padded
                # window rows (+20% tokens) push the LN/MLP cost up by
                # the same amount the partition saves (132.8 vs 132.7
                # ms A/B, tools/profile_sam.py traces both). Keeping the
                # simpler per-block partition.
                x = self._windowed_block(x, i, B, h, w, n_prefix)
            else:
                # Optional remat: recompute block activations in the
                # backward pass (jax.checkpoint) — trades HBM for FLOPs so
                # unfrozen-trunk training fits larger batches. Skipped for
                # the rel-pos variant (its static (h, w) arg would be
                # traced by the lifted transform).
                if self.remat and not self.use_rel_pos:
                    # "dots" keeps every MXU output (qkv/proj/fc1/fc2) in
                    # HBM and recomputes only the cheap elementwise tail —
                    # ~50 MB/block @b8 896^2 per dot vs the full policy's
                    # forward-again recompute. "dots_attn" additionally
                    # saves the flash-attention out/lse residuals
                    # (checkpoint_name tags in ops/attention.py), removing
                    # the per-block forward-kernel re-run from the backward
                    # (~63 MB/block more HBM).
                    cp = jax.checkpoint_policies
                    if self.remat_policy == "dots":
                        policy = cp.dots_with_no_batch_dims_saveable
                    elif self.remat_policy == "dots_attn":
                        policy = cp.save_from_both_policies(
                            cp.dots_with_no_batch_dims_saveable,
                            cp.save_only_these_names(
                                "flash_attn_out", "flash_attn_lse"),
                        )
                    else:
                        policy = None
                    block_cls = nn.remat(Block, policy=policy)
                else:
                    block_cls = Block
                x = block_cls(
                    self.embed_dim,
                    self.num_heads,
                    self.mlp_ratio,
                    self.layerscale,
                    self.dtype,
                    use_rel_pos=self.use_rel_pos,
                    rel_pos_size=self.pretrain_grid,
                    quick_gelu=self.quick_gelu,
                    norm_eps=self.norm_eps,
                    quant=self.quant,
                    gelu=self.gelu,
                    name=f"block{i}",
                )(x, (h, w) if self.use_rel_pos else None)
            if i == self.depth - 1 and self.use_depth_fusion:
                x = self._fuse_depth(x, prompt_depth, B, h, w, n_prefix)
            if i in self.out_layers:
                extra[f"feat{i}"] = x[:, n_prefix:].reshape(
                    B, h, w, self.embed_dim
                )

        if self.final_norm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             name="norm")(x).astype(x.dtype)
        feat = x[:, n_prefix:].reshape(B, h, w, self.embed_dim)
        if self.neck_channels > 0:
            # SAM neck: 1x1 + 3x3 convs with LayerNorm (segment_anything
            # image encoder neck).
            feat = nn.Conv(self.neck_channels, (1, 1), use_bias=False,
                           dtype=self.dtype, name="neck_conv1")(feat)
            feat = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                name="neck_norm1")(feat)
            feat = nn.Conv(self.neck_channels, (3, 3), padding=1,
                           use_bias=False, dtype=self.dtype,
                           name="neck_conv2")(feat)
            feat = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                name="neck_norm2")(feat)
        out = {
            "last_feat": feat.astype(jnp.float32),
            "cls": (
                x[:, 0] if self.use_cls_token else x.mean(axis=1)
            ).astype(jnp.float32),
        }
        out.update(extra)
        return out

    def _windowed_block(self, x, i, B, h, w, n_prefix):
        """SAM-style windowed attention block (prefix tokens bypass
        windowing; the window partition happens inside Block, after its
        norm1, matching the original ordering)."""
        win = self.window_size
        prefix = x[:, :n_prefix]
        grid = x[:, n_prefix:]
        grid = Block(
            self.embed_dim, self.num_heads, self.mlp_ratio,
            self.layerscale, self.dtype,
            use_rel_pos=self.use_rel_pos, rel_pos_size=win,
            quick_gelu=self.quick_gelu, norm_eps=self.norm_eps, window=win,
            quant=self.quant, gelu=self.gelu, name=f"block{i}",
        )(grid, (h, w))
        return jnp.concatenate([prefix, grid], axis=1) if n_prefix else grid

    def _fuse_depth(self, x, prompt_depth, B, h, w, n_prefix=1):
        """Depth-prompt fusion after the final block (dino.py:91-105).

        The fusion conv exists in the param tree whether or not a depth map
        is passed; with no depth we fuse a zero channel so the jitted graph
        is identical in structure (matches the reference behavior of only
        fusing when depth is provided, up to the conv's response to 0 input).
        """
        fusion = nn.Conv(
            self.embed_dim, (1, 1), dtype=self.dtype, name="depth_fusion"
        )
        prefix = x[:, :n_prefix]
        patch = x[:, n_prefix:].reshape(B, h, w, self.embed_dim)
        if prompt_depth is None:
            depth = jnp.zeros((B, h, w, 1), patch.dtype)
        else:
            # F.interpolate(..., mode='bilinear') semantics: half-pixel,
            # NO antialiasing on the downscale (dino.py:85).
            depth = jax.image.resize(
                prompt_depth.astype(patch.dtype), (B, h, w, 1), "bilinear",
                antialias=False,
            )
        fused = fusion(jnp.concatenate([patch, depth], axis=-1))
        fused = fused.reshape(B, h * w, self.embed_dim)
        if n_prefix:
            return jnp.concatenate([prefix, fused], axis=1)
        return fused


def vit_base_14(**kw) -> VisionTransformer:
    return VisionTransformer(
        patch_size=14, embed_dim=768, depth=12, num_heads=12, **kw
    )


def vit_large_14(**kw) -> VisionTransformer:
    return VisionTransformer(
        patch_size=14, embed_dim=1024, depth=24, num_heads=16, **kw
    )

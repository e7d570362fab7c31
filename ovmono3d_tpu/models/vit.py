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

from dataclasses import field
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ovmono3d_tpu.ops.attention import dot_product_attention

Dtype = Any


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, D]
        out = dot_product_attention(q, k, v)  # [B, N, H, D]
        out = out.reshape(B, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


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


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layerscale: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, self.dtype, name="attn")(
            h.astype(self.dtype)
        )
        if self.layerscale:
            h = LayerScale(self.dim, dtype=self.dtype, name="ls1")(h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = Mlp(
            int(self.dim * self.mlp_ratio), self.dim, self.dtype, name="mlp"
        )(h.astype(self.dtype))
        if self.layerscale:
            h = LayerScale(self.dim, dtype=self.dtype, name="ls2")(h)
        return x + h


def resize_pos_embed(
    pos_embed: jax.Array, grid_hw: tuple[int, int]
) -> jax.Array:
    """Bicubic-resize patch positional embeddings to a new grid.

    pos_embed: [1, 1 + G*G, C] (cls first). Returns [1, 1 + h*w, C].
    """
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:]
    g = int(round(patch_pe.shape[1] ** 0.5))
    c = patch_pe.shape[-1]
    h, w = grid_hw
    if (g, g) != (h, w):
        patch_pe = patch_pe.reshape(1, g, g, c)
        patch_pe = jax.image.resize(
            patch_pe, (1, h, w, c), method="bicubic"
        )
        patch_pe = patch_pe.reshape(1, h * w, c)
    return jnp.concatenate([cls_pe, patch_pe], axis=1)


class VisionTransformer(nn.Module):
    """DINOv2 ViT trunk. Input NHWC image, output dense patch feature map.

    Attributes mirror the dinov2 vitb14 architecture by default.
    """

    patch_size: int = 14
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    pretrain_grid: int = 37  # dinov2 trained at 518/14
    layerscale: bool = True
    use_depth_fusion: bool = True
    out_layers: Sequence[int] = ()  # extra block indices to also return
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jax.Array, prompt_depth: jax.Array | None = None):
        """images: [B, H, W, 3] (normalized); prompt_depth: [B, H', W', 1].

        Returns dict with 'last_feat': [B, h, w, C] dense patch features
        (h = H // patch_size), plus 'cls': [B, C].
        """
        B, H, W, _ = images.shape
        h, w = H // self.patch_size, W // self.patch_size

        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )(images.astype(self.dtype))
        x = x.reshape(B, h * w, self.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim),
            jnp.float32,
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, 1 + self.pretrain_grid**2, self.embed_dim),
            jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, self.embed_dim)).astype(x.dtype), x],
            axis=1,
        )
        x = x + resize_pos_embed(pos_embed, (h, w)).astype(x.dtype)

        extra = {}
        for i in range(self.depth):
            x = Block(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                self.layerscale,
                self.dtype,
                name=f"block{i}",
            )(x)
            if i == self.depth - 1 and self.use_depth_fusion:
                x = self._fuse_depth(x, prompt_depth, B, h, w)
            if i in self.out_layers:
                extra[f"feat{i}"] = x[:, 1:].reshape(B, h, w, self.embed_dim)

        out = {
            "last_feat": x[:, 1:].reshape(B, h, w, self.embed_dim).astype(
                jnp.float32
            ),
            "cls": x[:, 0].astype(jnp.float32),
        }
        out.update(extra)
        return out

    def _fuse_depth(self, x, prompt_depth, B, h, w):
        """Depth-prompt fusion after the final block (dino.py:91-105).

        The fusion conv exists in the param tree whether or not a depth map
        is passed; with no depth we fuse a zero channel so the jitted graph
        is identical in structure (matches the reference behavior of only
        fusing when depth is provided, up to the conv's response to 0 input).
        """
        fusion = nn.Conv(
            self.embed_dim, (1, 1), dtype=self.dtype, name="depth_fusion"
        )
        cls_tok = x[:, :1]
        patch = x[:, 1:].reshape(B, h, w, self.embed_dim)
        if prompt_depth is None:
            depth = jnp.zeros((B, h, w, 1), patch.dtype)
        else:
            depth = jax.image.resize(
                prompt_depth.astype(patch.dtype), (B, h, w, 1), "bilinear"
            )
        fused = fusion(jnp.concatenate([patch, depth], axis=-1))
        fused = fused.reshape(B, h * w, self.embed_dim)
        return jnp.concatenate([cls_tok, fused], axis=1)


def vit_base_14(**kw) -> VisionTransformer:
    return VisionTransformer(
        patch_size=14, embed_dim=768, depth=12, num_heads=12, **kw
    )


def vit_large_14(**kw) -> VisionTransformer:
    return VisionTransformer(
        patch_size=14, embed_dim=1024, depth=24, num_heads=16, **kw
    )

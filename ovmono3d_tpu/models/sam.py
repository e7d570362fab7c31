"""SAM promptable segmentation: prompt encoder + two-way mask decoder (Flax).

Re-design of segment_anything's SamPredictor path used by OVMono3D-GEO
(tools/ovmono3d_geo.py:213-217 `run_seg_anything`: box prompt -> masks;
SURVEY.md §2.1 #28, §2.3). The image encoder is the windowed ViT variant in
models/vit.py (backbones preset "sam"); this module adds:

- PromptEncoder: boxes become two corner point embeddings (top-left /
  bottom-right type embeddings + random-Fourier positional encoding).
- MaskDecoder: SAM's two-way transformer (token->image and image->token
  cross attention), IoU + mask tokens, 4x output upscaling, hypernetwork
  MLPs -> 3 candidate masks + IoU scores (the GEO path takes mask index 2,
  the largest, ovmono3d_geo.py:309).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class RandomFourierPE(nn.Module):
    """SAM's PositionEmbeddingRandom: coords in [0,1]^2 -> [2C] features."""

    num_feats: int = 128

    @nn.compact
    def __call__(self, coords: jax.Array) -> jax.Array:
        mat = self.param(
            "gaussian_matrix",
            nn.initializers.normal(1.0),
            (2, self.num_feats),
            jnp.float32,
        )
        # HIGHEST: small-matrix geometry (CLAUDE.md rule) — TPU's default
        # bf16 matmul passes would add ~0.4% phase error before sin/cos,
        # shifting every positional encoding vs the torch reference.
        x = jnp.matmul(
            2.0 * coords - 1.0, mat, precision=jax.lax.Precision.HIGHEST
        ) * (2.0 * jnp.pi)
        return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)


class PromptEncoder(nn.Module):
    embed_dim: int = 256

    def setup(self):
        self.pe = RandomFourierPE(self.embed_dim // 2, name="pe")
        self.point_embeddings = self.param(
            "point_embeddings",
            nn.initializers.normal(1.0),
            (2, self.embed_dim),
            jnp.float32,
        )
        # Dense embedding added to the image features when no mask prompt is
        # given (segment_anything no_mask_embed — the predictor's box-only
        # path always uses it).
        self.no_mask_embed = self.param(
            "no_mask_embed",
            nn.initializers.normal(1.0),
            (self.embed_dim,),
            jnp.float32,
        )

    def __call__(self, boxes: jax.Array, image_size: float):
        """boxes: [B, 4] xyxy in image pixels -> sparse prompt embeddings
        [B, 2, C] (corner points with per-corner type embeddings)."""
        # corner coords normalized to [0, 1], +0.5 px (SAM convention).
        tl = (boxes[:, 0:2] + 0.5) / image_size
        br = (boxes[:, 2:4] + 0.5) / image_size
        emb = jnp.stack([self.pe(tl), self.pe(br)], axis=1)  # [B, 2, C]
        return emb + self.point_embeddings[None]

    def dense_pe(self, grid_hw: tuple[int, int]):
        """Positional encoding of the image grid: [H, W, C]."""
        h, w = grid_hw
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        coords = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)
        return self.pe(coords).reshape(h, w, self.embed_dim)


class _Attention(nn.Module):
    dim: int
    heads: int
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        inner = self.dim // self.downsample
        hd = inner // self.heads
        qh = nn.Dense(inner, name="q")(q).reshape(
            *q.shape[:-1][:2], self.heads, hd
        )
        kh = nn.Dense(inner, name="k")(k).reshape(
            *k.shape[:-1][:2], self.heads, hd
        )
        vh = nn.Dense(inner, name="v")(v).reshape(
            *v.shape[:-1][:2], self.heads, hd
        )
        attn = jnp.einsum(
            "bnhd,bmhd->bhnm", qh, kh, preferred_element_type=jnp.float32
        ) / (hd**0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "bhnm,bmhd->bnhd", attn, vh, preferred_element_type=jnp.float32
        ).reshape(*q.shape[:-1][:2], inner)
        return nn.Dense(self.dim, name="out")(out)


class TwoWayBlock(nn.Module):
    dim: int = 256
    heads: int = 8
    mlp_dim: int = 2048
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, tokens, image, token_pe, image_pe):
        # self attention on tokens. In the FIRST layer the attention output
        # REPLACES the tokens (no residual, segment_anything
        # TwoWayAttentionBlock skip_first_layer_pe branch).
        q = tokens if self.skip_first_pe else tokens + token_pe
        att = _Attention(self.dim, self.heads, name="self_attn")(
            q, q, tokens
        )
        tokens = nn.LayerNorm(name="norm1")(
            att if self.skip_first_pe else tokens + att
        )
        # token -> image cross attention
        q = tokens + token_pe
        k = image + image_pe
        tokens = nn.LayerNorm(name="norm2")(
            tokens + _Attention(self.dim, self.heads, 2, name="t2i")(
                q, k, image
            )
        )
        # mlp
        h = nn.Dense(self.mlp_dim, name="mlp1")(tokens)
        tokens = nn.LayerNorm(name="norm3")(
            tokens + nn.Dense(self.dim, name="mlp2")(nn.relu(h))
        )
        # image -> token cross attention
        q = image + image_pe
        k = tokens + token_pe
        image = nn.LayerNorm(name="norm4")(
            image + _Attention(self.dim, self.heads, 2, name="i2t")(
                q, k, tokens
            )
        )
        return tokens, image


class MaskDecoder(nn.Module):
    dim: int = 256
    heads: int = 8
    depth: int = 2
    num_masks: int = 3
    mlp_dim: int = 2048

    @nn.compact
    def __call__(self, image_feat, image_pe, prompt_tokens):
        """image_feat: [B, H, W, C]; prompt_tokens: [B, P, C].

        Returns (masks [B, num_masks, 4H, 4W], iou_pred [B, num_masks]).
        """
        B, H, W, C = image_feat.shape
        iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, self.dim),
            jnp.float32,
        )
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0),
            (self.num_masks + 1, self.dim), jnp.float32,
        )
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens[None], (B,) + out_tokens.shape),
             prompt_tokens],
            axis=1,
        )
        image = image_feat.reshape(B, H * W, C)
        pe = jnp.broadcast_to(image_pe.reshape(1, H * W, C), image.shape)

        t, img = tokens, image
        for i in range(self.depth):
            t, img = TwoWayBlock(
                self.dim, self.heads, self.mlp_dim, skip_first_pe=(i == 0),
                name=f"block{i}",
            )(t, img, tokens, pe)
        # final token->image attention
        q = t + tokens
        k = img + pe
        t = nn.LayerNorm(name="final_norm")(
            t + _Attention(self.dim, self.heads, 2, name="final_t2i")(
                q, k, img
            )
        )

        iou_out = t[:, 0]
        mask_out = t[:, 1 : 1 + self.num_masks + 1]

        # upscale image features 4x
        img = img.reshape(B, H, W, C)
        up = nn.ConvTranspose(self.dim // 4, (2, 2), strides=(2, 2),
                              name="up1")(img)
        up = nn.LayerNorm(name="up_norm")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(self.dim // 8, (2, 2), strides=(2, 2),
                              name="up2")(up)
        up = nn.gelu(up, approximate=False)   # [B, 4H, 4W, C/8]

        # hypernetwork MLPs per mask token
        hyper = []
        for i in range(self.num_masks + 1):
            h = mask_out[:, i]
            for j in range(2):
                h = nn.relu(nn.Dense(self.dim, name=f"hyper{i}_l{j}")(h))
            hyper.append(nn.Dense(self.dim // 8, name=f"hyper{i}_out")(h))
        hyper = jnp.stack(hyper, axis=1)      # [B, M+1, C/8]
        masks = jnp.einsum(
            "bmc,bhwc->bmhw", hyper, up, preferred_element_type=jnp.float32
        )
        # IoU prediction head
        h = iou_out
        for j in range(2):
            h = nn.relu(nn.Dense(self.dim, name=f"iou_l{j}")(h))
        iou_pred = nn.Dense(self.num_masks + 1, name="iou_out")(h)
        # slot 0 is the "single mask" output; GEO uses the multimask slots.
        return masks[:, 1:], iou_pred[:, 1:]


class SamSegmenter(nn.Module):
    """Prompt encoder + mask decoder over precomputed image embeddings.

    Mirrors SamPredictor.predict(box=...) (run_seg_anything,
    ovmono3d_geo.py:213-217): returns 3 candidate masks at 4x the embedding
    resolution; callers upsample to the image and take index 2.
    """

    embed_dim: int = 256
    decoder_mlp_dim: int = 2048

    def setup(self):
        self.prompt = PromptEncoder(self.embed_dim, name="prompt_encoder")
        self.decoder = MaskDecoder(self.embed_dim,
                                   mlp_dim=self.decoder_mlp_dim,
                                   name="mask_decoder")

    def __call__(self, image_embed: jax.Array, boxes: jax.Array,
                 image_size: float):
        """image_embed: [B, H, W, C] (SAM ViT neck output);
        boxes: [B, 4] xyxy in image pixels."""
        sparse = self.prompt(boxes, image_size)
        dense_pe = self.prompt.dense_pe(image_embed.shape[1:3])
        # src = image embedding + dense (no-mask) prompt embedding
        # (segment_anything MaskDecoder.predict_masks).
        image_embed = image_embed + self.prompt.no_mask_embed[None, None,
                                                              None, :]
        return self.decoder(image_embed, dense_pe, sparse)

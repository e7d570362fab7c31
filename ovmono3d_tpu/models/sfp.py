"""Simple Feature Pyramid over a ViT trunk (ViTDet-style), in Flax.

Re-design of detectron2's SimpleFeaturePyramid as used by the reference
(cubercnn/modeling/backbone/dino.py:141-153, 208-224): from the single dense
ViT feature map, build pyramid levels by scale factors

  2.0  -> ConvTranspose(dim -> dim/2, k2 s2)
  1.0  -> identity
  0.5  -> MaxPool(k2 s2)
  4.0  -> two ConvTranspose stages (dim -> dim/2 -> dim/4) with LN+GELU

each followed by [Conv1x1 -> LN -> Conv3x3 -> LN] into `out_channels`.

With the flagship dinov2 config (patch 14, scales (2, 1, 0.5), input 896):
p2 = 128x128 @ stride 7, p3 = 64x64 @ stride 14, p4 = 32x32 @ stride 28.
Channels-last everywhere (NHWC), f32 outputs for the detection heads.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class _OutConvs(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="lateral")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="lateral_norm")(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="output")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="output_norm")(x)
        return x


class SimpleFeaturePyramid(nn.Module):
    """Scale stages over one [B, h, w, C] trunk feature map."""

    out_channels: int = 256
    scale_factors: Sequence[float] = (2.0, 1.0, 0.5)
    trunk_stride: int = 14
    # bf16 conv compute (MXU full rate); LayerNorms stay f32 and the final
    # stage output is f32 via the trailing norm.
    dtype: Dtype = jnp.bfloat16

    @property
    def strides(self) -> list[int]:
        return [round(self.trunk_stride / s) for s in self.scale_factors]

    @property
    def feature_names(self) -> list[str]:
        import math

        return [f"p{int(math.log2(s))}" for s in self.strides]

    @nn.compact
    def __call__(self, feat: jax.Array) -> dict[str, jax.Array]:
        dim = feat.shape[-1]
        out = {}
        for i, scale in enumerate(self.scale_factors):
            x = feat
            if scale == 4.0:
                x = nn.ConvTranspose(dim // 2, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name=f"up4a_{i}")(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                 name=f"up4_norm_{i}")(x)
                x = nn.gelu(x, approximate=False)
                x = nn.ConvTranspose(dim // 4, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name=f"up4b_{i}")(x)
            elif scale == 2.0:
                x = nn.ConvTranspose(dim // 2, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name=f"up2_{i}")(x)
            elif scale == 1.0:
                pass
            elif scale == 0.5:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                raise ValueError(f"unsupported scale {scale}")
            x = _OutConvs(self.out_channels, self.dtype, name=f"stage_{i}")(x)
            out[self.feature_names[i]] = x
        return out

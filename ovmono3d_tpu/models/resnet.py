"""ResNet backbone (Flax) — the reference's torchvision CNN family.

Re-design of cubercnn/modeling/backbone/resnet.py (SURVEY.md §2.1 #13):
a torchvision-layout ResNet trunk re-exposed as p2-p6 multi-scale features
for the FPN in models/dla.py. ResNet-50 by default; depths configure
18/34/101 variants (BasicBlock when `bottleneck=False`).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ovmono3d_tpu.models.dla import ConvBN

Dtype = Any


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output = 4 * features
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * 4
        residual = x
        if x.shape[-1] != out_ch or self.strides > 1:
            residual = ConvBN(out_ch, 1, self.strides, self.dtype,
                              name="downsample")(x, train)
        h = nn.relu(ConvBN(self.features, 1, 1, self.dtype,
                           name="conv1")(x, train))
        h = nn.relu(ConvBN(self.features, 3, self.strides, self.dtype,
                           name="conv2")(h, train))
        h = ConvBN(out_ch, 1, 1, self.dtype, name="conv3")(h, train)
        return nn.relu(h + residual)


class ResBasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        if x.shape[-1] != self.features or self.strides > 1:
            residual = ConvBN(self.features, 1, self.strides, self.dtype,
                              name="downsample")(x, train)
        h = nn.relu(ConvBN(self.features, 3, self.strides, self.dtype,
                           name="conv1")(x, train))
        h = ConvBN(self.features, 3, 1, self.dtype, name="conv2")(h, train)
        return nn.relu(h + residual)


class ResNet(nn.Module):
    """Trunk returning {'p2': /4 ... 'p6': /64} raw stage features
    (reference resnet.py:12-96 exposes layer1-4 + extra maxpool p6)."""

    depths: Sequence[int] = (3, 4, 6, 3)   # ResNet-50
    width: int = 64
    bottleneck: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = Bottleneck if self.bottleneck else ResBasicBlock
        x = nn.relu(ConvBN(self.width, 7, 2, self.dtype,
                           name="stem")(x, train))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        out = {}
        for si, depth in enumerate(self.depths):
            feats = self.width * (2**si)
            for bi in range(depth):
                x = block(
                    feats,
                    strides=2 if (bi == 0 and si > 0) else 1,
                    dtype=self.dtype,
                    name=f"layer{si + 1}_block{bi}",
                )(x, train)
            out[f"p{si + 2}"] = x
        out["p6"] = nn.max_pool(x, (2, 2), strides=(2, 2))
        return out

"""DLA (Deep Layer Aggregation) CNN backbone in Flax.

Re-design of the original Cube R-CNN backbone
(cubercnn/modeling/backbone/dla.py:1-506 — SURVEY.md §2.1 #12): BasicBlock
residual units composed by hierarchical Tree aggregation, exposing p2-p6
multi-scale features for an FPN. DLA-34 by default
(levels (1,1,1,2,2,1), channels (16,32,64,128,256,512)).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding=self.kernel // 2, use_bias=False, dtype=self.dtype,
            name="conv",
        )(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn",
        )(x)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        out = nn.relu(ConvBN(self.features, 3, self.strides,
                             self.dtype, name="conv1")(x, train))
        out = ConvBN(self.features, 3, 1, self.dtype, name="conv2")(
            out, train
        )
        return nn.relu(out + residual)


class Root(nn.Module):
    features: int
    residual: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        x = jnp.concatenate(xs, axis=-1)
        out = ConvBN(self.features, 1, 1, self.dtype, name="conv")(x, train)
        if self.residual:
            out = out + xs[0]
        return nn.relu(out)


class Tree(nn.Module):
    levels: int
    features: int
    strides: int = 1
    level_root: bool = False
    root_residual: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, children=None, train: bool = False):
        children = list(children) if children else []
        if self.strides > 1:
            bottom = nn.max_pool(
                x, (self.strides, self.strides),
                strides=(self.strides, self.strides),
            )
        else:
            bottom = x
        if x.shape[-1] != self.features:
            proj = ConvBN(self.features, 1, 1, self.dtype,
                          name="project")(bottom, train)
        else:
            proj = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = BasicBlock(self.features, self.strides, self.dtype,
                            name="tree1")(x, proj, train)
            x2 = BasicBlock(self.features, 1, self.dtype,
                            name="tree2")(x1, None, train)
            return Root(self.features, self.root_residual, self.dtype,
                        name="root")([x2, x1] + children, train)
        x1 = Tree(
            self.levels - 1, self.features, self.strides,
            root_residual=self.root_residual, dtype=self.dtype, name="tree1",
        )(x, None, None, train)
        children.append(x1)
        return Tree(
            self.levels - 1, self.features, 1,
            root_residual=self.root_residual, dtype=self.dtype, name="tree2",
        )(x1, None, children, train)


class DLA(nn.Module):
    """DLA trunk; returns {'p2': /4 ... 'p6': /64} raw stage features
    (channels 64/128/256/512/512 for DLA-34 with the extra p6 maxpool, as in
    the reference DLABackbone p2-p6, dla.py:417-484)."""

    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    root_residual: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels
        x = nn.relu(ConvBN(ch[0], 7, 1, self.dtype, name="base")(x, train))
        x = nn.relu(ConvBN(ch[0], 3, 1, self.dtype, name="level0")(x, train))
        # level1: stride 2 conv
        x = nn.relu(ConvBN(ch[1], 3, 2, self.dtype, name="level1")(x, train))
        out = {}
        x = Tree(self.levels[2], ch[2], 2, level_root=False,
                 root_residual=self.root_residual, dtype=self.dtype,
                 name="level2")(x, train=train)
        out["p2"] = x          # stride 4
        x = Tree(self.levels[3], ch[3], 2, level_root=True,
                 root_residual=self.root_residual, dtype=self.dtype,
                 name="level3")(x, train=train)
        out["p3"] = x          # stride 8
        x = Tree(self.levels[4], ch[4], 2, level_root=True,
                 root_residual=self.root_residual, dtype=self.dtype,
                 name="level4")(x, train=train)
        out["p4"] = x          # stride 16
        x = Tree(self.levels[5], ch[5], 2, level_root=True,
                 root_residual=self.root_residual, dtype=self.dtype,
                 name="level5")(x, train=train)
        out["p5"] = x          # stride 32
        out["p6"] = nn.max_pool(x, (2, 2), strides=(2, 2))  # stride 64
        return out


class FPN(nn.Module):
    """Classic top-down FPN over multi-scale trunk features."""

    out_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: dict[str, jax.Array]) -> dict[str, jax.Array]:
        names = sorted(feats.keys())  # p2 ... p6
        laterals = {
            n: nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name=f"lateral_{n}")(feats[n])
            for n in names
        }
        out = {}
        prev = None
        for n in reversed(names):
            cur = laterals[n]
            if prev is not None:
                up = jax.image.resize(
                    prev, cur.shape, method="nearest"
                )
                cur = cur + up
            prev = cur
            out[n] = nn.Conv(self.out_channels, (3, 3), padding=1,
                             dtype=self.dtype, name=f"output_{n}")(cur)
        return out

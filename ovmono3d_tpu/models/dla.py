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
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding=self.kernel // 2, use_bias=False, dtype=self.dtype,
            feature_group_count=self.groups, name="conv",
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


class DLABottleneck(nn.Module):
    """1-3-1 bottleneck residual unit (reference dla.py:71-109, expansion 2:
    bottle width = features // 2)."""

    features: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        bottle = self.features // 2
        out = nn.relu(ConvBN(bottle, 1, 1, self.dtype,
                             name="conv1")(x, train))
        out = nn.relu(ConvBN(bottle, 3, self.strides, self.dtype,
                             name="conv2")(out, train))
        out = ConvBN(self.features, 1, 1, self.dtype, name="conv3")(
            out, train
        )
        return nn.relu(out + residual)


class DLABottleneckX(nn.Module):
    """ResNeXt-style grouped bottleneck (reference dla.py:112-152:
    bottle width = features * cardinality / 32, grouped 3x3)."""

    features: int
    strides: int = 1
    cardinality: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        bottle = self.features * self.cardinality // 32
        out = nn.relu(ConvBN(bottle, 1, 1, self.dtype,
                             name="conv1")(x, train))
        out = nn.relu(ConvBN(bottle, 3, self.strides, self.dtype,
                             groups=self.cardinality,
                             name="conv2")(out, train))
        out = ConvBN(self.features, 1, 1, self.dtype, name="conv3")(
            out, train
        )
        return nn.relu(out + residual)


def _make_block(block: str, features: int, strides: int, cardinality: int,
                dtype, name: str):
    if block == "basic":
        return BasicBlock(features, strides, dtype, name=name)
    if block == "bottleneck":
        return DLABottleneck(features, strides, dtype, name=name)
    if block == "bottleneckx":
        return DLABottleneckX(features, strides, cardinality, dtype,
                              name=name)
    raise ValueError(f"unknown DLA block '{block}'")


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
    block: str = "basic"
    cardinality: int = 32
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
            x1 = _make_block(self.block, self.features, self.strides,
                             self.cardinality, self.dtype,
                             name="tree1")(x, proj, train)
            x2 = _make_block(self.block, self.features, 1,
                             self.cardinality, self.dtype,
                             name="tree2")(x1, None, train)
            return Root(self.features, self.root_residual, self.dtype,
                        name="root")([x2, x1] + children, train)
        x1 = Tree(
            self.levels - 1, self.features, self.strides,
            root_residual=self.root_residual, block=self.block,
            cardinality=self.cardinality, dtype=self.dtype, name="tree1",
        )(x, None, None, train)
        children.append(x1)
        return Tree(
            self.levels - 1, self.features, 1,
            root_residual=self.root_residual, block=self.block,
            cardinality=self.cardinality, dtype=self.dtype, name="tree2",
        )(x1, None, children, train)


class DLA(nn.Module):
    """DLA trunk; returns {'p2': /4 ... 'p6': /64} raw stage features
    (channels 64/128/256/512/512 for DLA-34 with the extra p6 maxpool, as in
    the reference DLABackbone p2-p6, dla.py:417-484). `block` selects the
    residual unit family (basic | bottleneck | bottleneckx) covering the
    dla34..dla169 variants (reference dla.py:312-414)."""

    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    root_residual: bool = False
    block: str = "basic"
    cardinality: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels
        x = nn.relu(ConvBN(ch[0], 7, 1, self.dtype, name="base")(x, train))
        x = nn.relu(ConvBN(ch[0], 3, 1, self.dtype, name="level0")(x, train))
        # level1: stride 2 conv
        x = nn.relu(ConvBN(ch[1], 3, 2, self.dtype, name="level1")(x, train))
        out = {}
        kw = dict(root_residual=self.root_residual, block=self.block,
                  cardinality=self.cardinality, dtype=self.dtype)
        x = Tree(self.levels[2], ch[2], 2, level_root=False,
                 name="level2", **kw)(x, train=train)
        out["p2"] = x          # stride 4
        x = Tree(self.levels[3], ch[3], 2, level_root=True,
                 name="level3", **kw)(x, train=train)
        out["p3"] = x          # stride 8
        x = Tree(self.levels[4], ch[4], 2, level_root=True,
                 name="level4", **kw)(x, train=train)
        out["p4"] = x          # stride 16
        x = Tree(self.levels[5], ch[5], 2, level_root=True,
                 name="level5", **kw)(x, train=train)
        out["p5"] = x          # stride 32
        out["p6"] = nn.max_pool(x, (2, 2), strides=(2, 2))  # stride 64
        return out


# Variant presets (reference dla.py:312-414).
DLA_PRESETS: dict[str, dict[str, Any]] = {
    "dla34": dict(levels=(1, 1, 1, 2, 2, 1),
                  channels=(16, 32, 64, 128, 256, 512), block="basic"),
    "dla46_c": dict(levels=(1, 1, 1, 2, 2, 1),
                    channels=(16, 32, 64, 64, 128, 256), block="bottleneck"),
    "dla46x_c": dict(levels=(1, 1, 1, 2, 2, 1),
                     channels=(16, 32, 64, 64, 128, 256),
                     block="bottleneckx"),
    "dla60x_c": dict(levels=(1, 1, 1, 2, 3, 1),
                     channels=(16, 32, 64, 64, 128, 256),
                     block="bottleneckx"),
    "dla60": dict(levels=(1, 1, 1, 2, 3, 1),
                  channels=(16, 32, 128, 256, 512, 1024),
                  block="bottleneck"),
    "dla60x": dict(levels=(1, 1, 1, 2, 3, 1),
                   channels=(16, 32, 128, 256, 512, 1024),
                   block="bottleneckx"),
    "dla102": dict(levels=(1, 1, 1, 3, 4, 1),
                   channels=(16, 32, 128, 256, 512, 1024),
                   block="bottleneck", root_residual=True),
    "dla102x": dict(levels=(1, 1, 1, 3, 4, 1),
                    channels=(16, 32, 128, 256, 512, 1024),
                    block="bottleneckx", root_residual=True),
    "dla102x2": dict(levels=(1, 1, 1, 3, 4, 1),
                     channels=(16, 32, 128, 256, 512, 1024),
                     block="bottleneckx", cardinality=64,
                     root_residual=True),
    "dla169": dict(levels=(1, 1, 2, 3, 5, 1),
                   channels=(16, 32, 128, 256, 512, 1024),
                   block="bottleneck", root_residual=True),
}


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

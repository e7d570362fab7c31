"""DenseNet / MNASNet / ShuffleNetV2 CNN trunks (Flax).

Re-designs of the reference's remaining torchvision backbone wrappers
(cubercnn/modeling/backbone/densenet.py:1-63, mnasnet.py:1-63,
shufflenet.py:1-69 — SURVEY.md §2.1 #13): each trunk follows the torchvision
architecture layout (so released ImageNet weights can be converted) and
returns raw {'p2': /4 ... 'p6': /64} multi-scale features for the FPN in
models/dla.py.  p6 is the reference's parameter-free
`max_pool2d(kernel_size=1, stride=2)`, i.e. plain stride-2 subsampling.

All modules are NHWC, fixed-shape, and jit-compatible.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _bn(train: bool, name: str) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32, name=name)


def _maxpool3(x: jax.Array) -> jax.Array:
    """3x3/2 max pool with padding 1 (post-ReLU inputs, so zero-pad is max-safe)."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return nn.max_pool(x, (3, 3), strides=(2, 2))


def _subsample2(x: jax.Array) -> jax.Array:
    """max_pool2d(kernel=1, stride=2) == every-other-pixel subsampling."""
    return x[:, ::2, ::2, :]


# ---------------------------------------------------------------------------
# DenseNet-121 (torchvision models.densenet121 layout)
# ---------------------------------------------------------------------------


class DenseLayer(nn.Module):
    """BN-ReLU-1x1(4g) -> BN-ReLU-3x3(g), concatenated onto the input."""

    growth: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(_bn(train, "norm1")(x))
        h = nn.Conv(4 * self.growth, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        h = nn.relu(_bn(train, "norm2")(h))
        h = nn.Conv(self.growth, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        return jnp.concatenate([x, h], axis=-1)


class DenseBlock(nn.Module):
    layers: int
    growth: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.layers):
            x = DenseLayer(self.growth, self.dtype,
                           name=f"denselayer{i + 1}")(x, train)
        return x


class Transition(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(_bn(train, "norm")(x))
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    """DenseNet-121 trunk; p2/p3/p4/p5 channels 256/512/1024/1024 at strides
    4/8/16/32 exactly as the reference slices `base.features`
    (densenet.py:24-37)."""

    block_layers: Sequence[int] = (6, 12, 24, 16)
    growth: int = 32
    init_features: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.init_features, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype, name="conv0")(x)
        x = nn.relu(_bn(train, "norm0")(x))
        x = _maxpool3(x)
        out = {}
        ch = self.init_features
        for i, layers in enumerate(self.block_layers):
            x = DenseBlock(layers, self.growth, self.dtype,
                           name=f"denseblock{i + 1}")(x, train)
            ch += layers * self.growth
            if i == 0:
                out["p2"] = x
            elif i == 1:
                out["p3"] = x
            elif i == 2:
                out["p4"] = x
            if i < len(self.block_layers) - 1:
                ch //= 2
                x = Transition(ch, self.dtype,
                               name=f"transition{i + 1}")(x, train)
        out["p5"] = _bn(train, "norm5")(x)
        out["p6"] = _subsample2(out["p5"])
        return out


# ---------------------------------------------------------------------------
# MNASNet 1.0 (torchvision models.mnasnet1_0 layout)
# ---------------------------------------------------------------------------


class InvertedResidual(nn.Module):
    """MBConv: 1x1 expand -> kxk depthwise -> 1x1 project (+residual)."""

    features: int
    kernel: int = 3
    strides: int = 1
    expansion: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expansion
        h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="expand")(x)
        h = nn.relu(_bn(train, "bn1")(h))
        h = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=self.kernel // 2, feature_group_count=mid,
                    use_bias=False, dtype=self.dtype, name="depthwise")(h)
        h = nn.relu(_bn(train, "bn2")(h))
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project")(h)
        h = _bn(train, "bn3")(h)
        if self.strides == 1 and in_ch == self.features:
            h = h + x
        return h


class MNASNet(nn.Module):
    """MNASNet-1.0 trunk; p2/p3/p4/p5 channels 24/40/96/320 at strides
    4/8/16/32 matching the reference's `base.layers` slices
    (mnasnet.py:24-37)."""

    dtype: Dtype = jnp.float32
    # (out, kernel, stride, expansion, repeats) per stack, torchvision order.
    stacks: Sequence[tuple[int, int, int, int, int]] = (
        (24, 3, 2, 3, 3), (40, 5, 2, 3, 3), (80, 5, 2, 6, 3),
        (96, 3, 1, 6, 2), (192, 5, 2, 6, 4), (320, 3, 1, 6, 1),
    )

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(_bn(train, "stem_bn")(x))
        x = nn.Conv(32, (3, 3), padding=1, feature_group_count=32,
                    use_bias=False, dtype=self.dtype, name="sep_dw")(x)
        x = nn.relu(_bn(train, "sep_bn1")(x))
        x = nn.Conv(16, (1, 1), use_bias=False, dtype=self.dtype,
                    name="sep_pw")(x)
        x = _bn(train, "sep_bn2")(x)
        out = {}
        taps = {0: "p2", 1: "p3", 3: "p4", 5: "p5"}
        for si, (ch, k, s, e, reps) in enumerate(self.stacks):
            for ri in range(reps):
                x = InvertedResidual(
                    ch, k, s if ri == 0 else 1, e, self.dtype,
                    name=f"stack{si}_block{ri}",
                )(x, train)
            if si in taps:
                out[taps[si]] = x
        out["p6"] = _subsample2(out["p5"])
        return out


# ---------------------------------------------------------------------------
# ShuffleNetV2 x1.0 (torchvision models.shufflenet_v2_x1_0 layout)
# ---------------------------------------------------------------------------


def channel_shuffle(x: jax.Array, groups: int = 2) -> jax.Array:
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(n, h, w, c)


class ShuffleUnit(nn.Module):
    """ShuffleNetV2 unit: channel split + shuffle (stride 1) or two-branch
    downsample (stride 2)."""

    features: int              # total output channels
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        branch = self.features // 2

        def right(h, name):
            h = nn.Conv(branch, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"{name}_pw1")(h)
            h = nn.relu(_bn(train, f"{name}_bn1")(h))
            h = nn.Conv(branch, (3, 3), strides=(self.strides, self.strides),
                        padding=1, feature_group_count=branch, use_bias=False,
                        dtype=self.dtype, name=f"{name}_dw")(h)
            h = _bn(train, f"{name}_bn2")(h)
            h = nn.Conv(branch, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"{name}_pw2")(h)
            return nn.relu(_bn(train, f"{name}_bn3")(h))

        if self.strides == 1:
            left, r = jnp.split(x, 2, axis=-1)
            r = right(r, "branch2")
        else:
            c_in = x.shape[-1]
            left = nn.Conv(c_in, (3, 3), strides=(2, 2), padding=1,
                           feature_group_count=c_in, use_bias=False,
                           dtype=self.dtype, name="branch1_dw")(x)
            left = _bn(train, "branch1_bn1")(left)
            left = nn.Conv(branch, (1, 1), use_bias=False, dtype=self.dtype,
                           name="branch1_pw")(left)
            left = nn.relu(_bn(train, "branch1_bn2")(left))
            r = right(x, "branch2")
        return channel_shuffle(jnp.concatenate([left, r], axis=-1), 2)


class ShuffleNetV2(nn.Module):
    """ShuffleNetV2-x1.0 trunk; p2/p3/p4/p5 channels 24/116/232/464 at strides
    4/8/16/32 (reference shufflenet.py:22-42; conv5 is unused there too)."""

    stage_repeats: Sequence[int] = (4, 8, 4)
    stage_channels: Sequence[int] = (116, 232, 464)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(24, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_bn(train, "conv1_bn")(x))
        out = {"p2": _maxpool3(x)}
        x = out["p2"]
        for si, (reps, ch) in enumerate(
            zip(self.stage_repeats, self.stage_channels)
        ):
            for ri in range(reps):
                x = ShuffleUnit(ch, 2 if ri == 0 else 1, self.dtype,
                                name=f"stage{si + 2}_unit{ri}")(x, train)
            out[f"p{si + 3}"] = x
        out["p6"] = _subsample2(out["p5"])
        return out

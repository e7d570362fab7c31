"""Monocular metric depth model (Depth-Pro-style DPT, Flax).

Re-design of the ml-depth-pro model used by OVMono3D-GEO for metric depth
(tools/ovmono3d_geo.py:266-297 `depth_pro.create_model_and_transforms` ->
`model.infer` -> metric depth map; SURVEY.md §2.1 #28, §2.3): a ViT trunk
tapped at multiple depths, DPT-style reassembly to a 4-level pyramid, a
residual fusion decoder, a canonical inverse-depth head, and an FOV head —
metric depth follows the Depth-Pro convention

    depth = f_px_normalized / canonical_inverse_depth     (per pixel)

where the focal comes from intrinsics when known, else from the FOV head.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ovmono3d_tpu.models.vit import VisionTransformer

Dtype = Any


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(h)
        return x + h


class FusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        x = jax.image.resize(
            x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]),
            "bilinear",
        )
        return nn.Conv(self.features, (1, 1), name="project")(x)


class DepthPro(nn.Module):
    """ViT trunk + DPT decoder -> (canonical inverse depth [B, H, W],
    fov_deg [B])."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    pretrain_grid: int = 24
    fusion_dim: int = 256
    taps: Sequence[int] = (2, 5, 8, 11)

    def setup(self):
        self.trunk = VisionTransformer(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            pretrain_grid=self.pretrain_grid,
            layerscale=False,
            use_depth_fusion=False,
            out_layers=tuple(self.taps),
            name="trunk",
        )
        # DPT reassembly: 4 taps -> strides (patch/4, patch/2, patch, 2*patch)
        self.reassemble = [
            nn.ConvTranspose(self.fusion_dim, (4, 4), strides=(4, 4),
                             name="reassemble0"),
            nn.ConvTranspose(self.fusion_dim, (2, 2), strides=(2, 2),
                             name="reassemble1"),
            nn.Conv(self.fusion_dim, (1, 1), name="reassemble2"),
            nn.Conv(self.fusion_dim, (3, 3), strides=(2, 2), padding=1,
                    name="reassemble3"),
        ]
        self.fusions = [
            FusionBlock(self.fusion_dim, name=f"fusion{i}") for i in range(4)
        ]
        self.head_conv1 = nn.Conv(self.fusion_dim // 2, (3, 3), padding=1,
                                  name="head_conv1")
        self.head_conv2 = nn.Conv(32, (3, 3), padding=1, name="head_conv2")
        self.head_out = nn.Conv(1, (1, 1), name="head_out")
        self.fov_head = nn.Dense(1, name="fov_head")

    def __call__(self, images: jax.Array):
        """images: [B, H, W, 3] normalized; H, W multiples of 4*patch."""
        out = self.trunk(images)
        feats = [out[f"feat{i}"] for i in self.taps]  # each [B, h, w, C]

        pyramid = [self.reassemble[i](f) for i, f in enumerate(feats)]
        # top-down fusion: coarsest (tap 3, stride 2*patch) first
        x = self.fusions[3](pyramid[3])
        x = self.fusions[2](x, pyramid[2])
        x = self.fusions[1](x, pyramid[1])
        x = self.fusions[0](x, pyramid[0])
        # head: one more 2x upsample to full resolution
        x = self.head_conv1(x)
        x = jax.image.resize(
            x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]),
            "bilinear",
        )
        x = nn.relu(self.head_conv2(x))
        inv_depth = nn.relu(self.head_out(x))[..., 0]  # [B, H, W]

        fov = self.fov_head(out["cls"])[:, 0]          # [B] degrees (raw)
        return {"canonical_inverse_depth": inv_depth, "fov_deg": fov}


def metric_depth(
    canonical_inverse_depth: jax.Array,  # [B, H, W]
    f_px: jax.Array,                     # [B] focal length in pixels
    width: int,
    min_depth: float = 0.1,
    max_depth: float = 250.0,
) -> jax.Array:
    """Depth-Pro metric decode: depth = W / (f_px * c_inv), clamped.

    (Depth-Pro predicts canonical inverse depth at a canonical focal equal
    to the image width; dividing by the true focal rescales to metric.)
    """
    inv = canonical_inverse_depth * (f_px[:, None, None] / width)
    return jnp.clip(1.0 / jnp.maximum(inv, 1.0 / max_depth), min_depth,
                    max_depth)


def fov_to_focal(fov_deg: jax.Array, width: int) -> jax.Array:
    """Horizontal FOV (degrees) -> focal length in pixels."""
    return 0.5 * width / jnp.tan(0.5 * jnp.deg2rad(fov_deg))

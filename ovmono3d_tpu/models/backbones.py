"""Backbone factory: every trunk family behind one (images, depth) -> dict
interface with static strides.

Replaces the reference's BACKBONE_REGISTRY entries (SURVEY.md §2.1 #7-#13):
build_dino/clip/mae/sam/midas_backbone (ViT + SimpleFeaturePyramid variants)
and build_dla_from_vision_fpn_backbone (DLA + FPN). Selection via
cfg.model.backbone.name.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ovmono3d_tpu.config import BackboneConfig
from ovmono3d_tpu.models.dla import DLA, FPN
from ovmono3d_tpu.models.sfp import SimpleFeaturePyramid
from ovmono3d_tpu.models.vit import VisionTransformer

# Architecture presets per family (reference backbone files + configs).
VIT_PRESETS: dict[str, dict[str, Any]] = {
    # dinov2 vitb14 @ 518 pretrain (dino.py).
    "dinov2": dict(patch_size=14, pretrain_grid=37, layerscale=True,
               pos_interp_offset=0.1),
    # open_clip ViT-B/16 'openai' @ 224 (clip.py): pre-LN tower, QuickGELU
    # MLPs, torch-default LayerNorm eps.
    "clip": dict(patch_size=16, pretrain_grid=14, layerscale=False,
                 pre_ln=True, quick_gelu=True, norm_eps=1e-5),
    # HF ViTMAE base @ 224 (mae.py): fixed 2D sin-cos pos embeddings
    # rebuilt at the runtime grid (mae.py:61-76), BERT-style LN eps.
    # `tap_offset`: the reference indexes HF `hidden_states[n_layers-1]`,
    # which (index 0 being the embeddings) is the output of block n-2 —
    # an off-by-one kept for checkpoint parity (mae.py:111-113).
    "mae": dict(patch_size=16, pretrain_grid=14, layerscale=False,
                pos_sincos=True, norm_eps=1e-12, tap_offset=-2),
    # segment_anything vit_b @ 1024 (sam.py): windowed, no cls token,
    # global attention every 3rd block, 256-ch neck.
    "sam": dict(patch_size=16, pretrain_grid=64, layerscale=False,
                use_cls_token=False, window_size=14,
                global_blocks=(2, 5, 8, 11), neck_channels=256,
                use_rel_pos=True),
    # MiDaS DPT_Large ViT-L/16 @ 384 (midas_final.py).
    "midas": dict(patch_size=16, pretrain_grid=24, layerscale=False,
                  embed_dim=1024, depth=24, num_heads=16),
}


class ViTSFPBackbone(nn.Module):
    """ViT trunk + Simple Feature Pyramid (the reference's SFP harness,
    dino.py:141-224)."""

    cfg: BackboneConfig

    @property
    def _patch_size(self) -> int:
        if self.cfg.name == "dinov2":
            return self.cfg.patch_size
        return VIT_PRESETS.get(self.cfg.name, {}).get(
            "patch_size", self.cfg.patch_size
        )

    @property
    def strides(self) -> list[int]:
        return [round(self._patch_size / s) for s in self.cfg.scale_factors]

    @property
    def feature_names(self) -> list[str]:
        import math

        return [f"p{int(math.log2(s))}" for s in self.strides]

    def setup(self):
        # Preset wins structural fields for the fixed foundation trunks; the
        # flagship dinov2 entry stays fully config-driven (tests/benchmarks
        # shrink it).
        preset = dict(VIT_PRESETS.get(self.cfg.name, {}))
        cfg_fields = dict(
            patch_size=self.cfg.patch_size,
            embed_dim=self.cfg.embed_dim,
            depth=self.cfg.depth,
            num_heads=self.cfg.num_heads,
            pretrain_grid=self.cfg.pretrain_grid,
            layerscale=self.cfg.layerscale,
        )
        if self.cfg.name == "dinov2":
            preset.update(cfg_fields)
        else:
            for k, v in cfg_fields.items():
                preset.setdefault(k, v)
        # tap_offset < -1 taps an earlier block's output instead of the
        # last (the reference MAE off-by-one, mae.py:111-113).
        tap = preset.pop("tap_offset", -1)
        self.tap_layer = preset["depth"] + tap if tap != -1 else None
        if self.tap_layer is not None:
            preset["out_layers"] = tuple(preset.get("out_layers", ())) + (
                self.tap_layer,
            )
        # Depth-prompt fusion is a DINO-backbone feature
        # (MODEL.DINO.USE_DEPTH_FUSION, dino.py:83-105); the other reference
        # trunks never fuse — and with tap_offset the fusion conv (applied
        # after the LAST block) would be silently discarded anyway.
        fuse = self.cfg.use_depth_fusion and self.cfg.name == "dinov2"
        if self.cfg.use_depth_fusion and not fuse:
            import logging

            logging.getLogger("ovmono3d").warning(
                "use_depth_fusion is only supported by the dinov2 backbone "
                "(reference MODEL.DINO.USE_DEPTH_FUSION); '%s' runs "
                "without depth fusion", self.cfg.name)
        self.vit = VisionTransformer(
            use_depth_fusion=fuse,
            remat=self.cfg.remat,
            remat_policy=self.cfg.remat_policy,
            quant=self.cfg.quant,
            gelu=self.cfg.gelu,
            name="vit",
            **preset,
        )
        self.sfp = SimpleFeaturePyramid(
            out_channels=self.cfg.out_channels,
            scale_factors=self.cfg.scale_factors,
            trunk_stride=preset["patch_size"],
            name="sfp",
        )

    def __call__(self, images, depth=None):
        trunk = self.vit(images, depth)
        feat = (
            trunk[f"feat{self.tap_layer}"]
            if self.tap_layer is not None else trunk["last_feat"]
        )
        return self.sfp(feat)


class CNNFPNBackbone(nn.Module):
    """CNN trunk + FPN: DLA-34 (the original Cube R-CNN backbone,
    dla.py:417-506) or torchvision-style ResNets (resnet.py:12-96)."""

    cfg: BackboneConfig

    @property
    def strides(self) -> list[int]:
        return [4, 8, 16, 32, 64]

    @property
    def feature_names(self) -> list[str]:
        return ["p2", "p3", "p4", "p5", "p6"]

    def setup(self):
        from ovmono3d_tpu.models.cnns import DenseNet, MNASNet, ShuffleNetV2
        from ovmono3d_tpu.models.dla import DLA_PRESETS
        from ovmono3d_tpu.models.resnet import ResNet

        name = self.cfg.name
        if name == "dla":
            name = "dla34"
        if name in DLA_PRESETS:
            self.trunk = DLA(name="dla", **DLA_PRESETS[name])
        elif name in ("resnet18", "resnet34"):
            depths = (2, 2, 2, 2) if name == "resnet18" else (3, 4, 6, 3)
            self.trunk = ResNet(depths=depths, bottleneck=False,
                                name="resnet")
        elif name in ("resnet", "resnet50", "resnet101"):
            depths = (3, 4, 23, 3) if name == "resnet101" else (3, 4, 6, 3)
            self.trunk = ResNet(depths=depths, name="resnet")
        elif name in ("densenet", "densenet121"):
            self.trunk = DenseNet(name="densenet")
        elif name in ("mnasnet", "mnasnet1_0"):
            self.trunk = MNASNet(name="mnasnet")
        elif name in ("shufflenet", "shufflenet_v2"):
            self.trunk = ShuffleNetV2(name="shufflenet")
        else:
            raise ValueError(f"unknown CNN backbone '{name}'")
        self.fpn = FPN(out_channels=self.cfg.out_channels, name="fpn")

    def __call__(self, images, depth=None):
        return self.fpn(self.trunk(images))


from ovmono3d_tpu.models.dla import DLA_PRESETS as _DLA_PRESETS

_CNN_NAMES = (
    "dla", *_DLA_PRESETS, "resnet", "resnet18", "resnet34", "resnet50",
    "resnet101", "densenet", "densenet121", "mnasnet", "mnasnet1_0",
    "shufflenet", "shufflenet_v2",
)


def build_backbone(cfg: BackboneConfig) -> nn.Module:
    if cfg.name in VIT_PRESETS:
        if cfg.remat and (VIT_PRESETS[cfg.name].get("window_size")
                          or VIT_PRESETS[cfg.name].get("use_rel_pos")):
            import logging

            logging.getLogger("ovmono3d").warning(
                "backbone.remat only wraps plain (non-windowed, non-rel-pos)"
                " ViT blocks; '%s' keeps its windowed/rel-pos blocks "
                "un-rematerialized", cfg.name)
        return ViTSFPBackbone(cfg=cfg)
    if cfg.name in _CNN_NAMES:
        if cfg.remat:
            import logging

            logging.getLogger("ovmono3d").warning(
                "backbone.remat is not implemented for CNN trunks; '%s' "
                "runs without rematerialization", cfg.name)
        return CNNFPNBackbone(cfg=cfg)
    raise ValueError(f"unknown backbone '{cfg.name}'")

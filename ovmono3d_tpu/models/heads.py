"""Detection heads: RPN head, Fast R-CNN box head, Cube head (Flax).

TPU-native re-designs of the reference's heads:
- RPNHead: detectron2 StandardRPNHead (3x3 conv + 1x1 objectness/deltas).
- FastRCNNHead: FastRCNNConvFCHead (2xFC 1024) + linear predictors
  (cubercnn/modeling/roi_heads/fast_rcnn.py).
- CubeHead: shared/per-variable FC stacks + linear outputs for 2D center
  deltas, dims, pose (6d/quaternion/euler), virtual depth z and uncertainty
  (cubercnn/modeling/roi_heads/cube_head.py:20-204). With
  dims_priors_enabled the output heads are per-class (xC).

All heads take fixed-shape padded inputs and run in f32 (they are tiny
relative to the trunk; precision matters for the 3D decode).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ovmono3d_tpu.ops.rotation import (
    copysign,
    euler_angles_to_matrix,
    quaternion_to_matrix,
    rotation_6d_to_matrix,
)


# fvcore c2_xavier_fill == kaiming_uniform_(a=1): uniform(+-sqrt(3/fan_in)).
# The reference initializes every head FC stack with it (cube_head.py:72-100,
# detectron2 FastRCNNConvFCHead).
_C2_XAVIER = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


class RPNHead(nn.Module):
    """Shared conv + objectness/delta predictors, applied per level."""

    num_anchors: int
    conv_dim: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        # detectron2 StandardRPNHead init: normal(std=0.01) weights, zero
        # bias for all three convs.
        init = nn.initializers.normal(0.01)
        conv = nn.Conv(self.conv_dim, (3, 3), padding=1, kernel_init=init,
                       name="conv")
        obj = nn.Conv(self.num_anchors, (1, 1), kernel_init=init,
                      name="objectness")
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), kernel_init=init,
                         name="deltas")
        logits, regs = [], []
        for f in feats:
            t = nn.relu(conv(f))
            b = f.shape[0]
            logits.append(obj(t).reshape(b, -1))           # [B, H*W*A]
            regs.append(deltas(t).reshape(b, -1, 4))        # [B, H*W*A, 4]
        return logits, regs


class FastRCNNHead(nn.Module):
    """Box feature MLP + classification/regression predictors.

    Returns (scores [N, C+1 logits], proposal_deltas [N, Creg*4]).
    """

    num_classes: int
    num_fc: int = 2
    fc_dim: int = 1024
    cls_agnostic_bbox_reg: bool = False

    @nn.compact
    def __call__(self, pooled: jax.Array):
        x = pooled.reshape(pooled.shape[0], -1)
        for i in range(self.num_fc):
            x = nn.relu(nn.Dense(self.fc_dim, kernel_init=_C2_XAVIER,
                                 name=f"fc{i + 1}")(x))
        scores = nn.Dense(
            self.num_classes + 1,
            kernel_init=nn.initializers.normal(0.01),
            name="cls_score",
        )(x)
        num_reg = 1 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(
            num_reg * 4,
            kernel_init=nn.initializers.normal(0.001),
            name="bbox_pred",
        )(x)
        return scores, deltas


class CubeHead(nn.Module):
    """3D attribute regressor over pooled cube features.

    Outputs (reference cube_head.py:148-204):
      deltas_2d: [N, (C,) 2]       projected-center offsets in box units
      z:         [N, (bins,) (C,)] virtual depth logits/values
      dims:      [N, (C,) 3]       log-space dims (priors applied by caller)
      pose:      [N, (C,) 3, 3]    rotation matrices (from 6d/quat/euler)
      uncert:    [N, (C,)]         uncertainty (>= 0.01; bias init 5)
    Class axes are present iff dims_priors_enabled.
    """

    num_classes: int
    num_conv: int = 0
    conv_dim: int = 256
    num_fc: int = 2
    fc_dim: int = 1024
    shared_fc: bool = True
    z_type: str = "direct"
    pose_type: str = "6d"
    cluster_bins: int = 1
    dims_priors_enabled: bool = False
    use_confidence: float = 1.0

    def _mlp(self, x, name):
        for i in range(self.num_fc):
            x = nn.relu(nn.Dense(self.fc_dim, kernel_init=_C2_XAVIER,
                                 name=f"{name}_fc{i + 1}")(x))
        return x

    @nn.compact
    def __call__(self, pooled: jax.Array):
        # Optional conv stack over the pooled grid before flattening
        # (cube_head.py NUM_CONV/CONV_DIM; reference default 0).
        x = pooled
        for i in range(self.num_conv):
            x = nn.relu(
                nn.Conv(self.conv_dim, (3, 3), padding=1,
                        name=f"conv{i + 1}")(x)
            )
        x = x.reshape(x.shape[0], -1)
        n = x.shape[0]
        mult = self.num_classes if self.dims_priors_enabled else 1
        bins = max(self.cluster_bins, 1)

        if self.shared_fc:
            feat = self._mlp(x, "shared")
            feats = {k: feat for k in ("xy", "dims", "pose", "z", "conf")}
        else:
            feats = {
                k: self._mlp(x, k) for k in ("xy", "dims", "pose", "z", "conf")
            }

        small = nn.initializers.normal(0.001)
        deltas_2d = nn.Dense(mult * 2, kernel_init=small, name="center_deltas")(
            feats["xy"]
        )
        dims = nn.Dense(mult * 3, kernel_init=small, name="dims")(feats["dims"])
        pose_dims = {"6d": 6, "quaternion": 4, "euler": 3}[self.pose_type]
        pose_raw = nn.Dense(mult * pose_dims, kernel_init=small, name="pose")(
            feats["pose"]
        )
        z = nn.Dense(mult * bins, kernel_init=small, name="depth")(feats["z"])

        uncert = None
        if self.use_confidence > 0:
            uncert = nn.Dense(
                mult,
                kernel_init=small,
                bias_init=nn.initializers.constant(5.0),
                name="uncertainty",
            )(feats["conf"])
            uncert = jnp.clip(uncert, 0.01)

        # Pose representation -> rotation matrices.
        pose_flat = pose_raw.reshape(-1, pose_dims)
        if self.pose_type == "6d":
            pose = rotation_6d_to_matrix(pose_flat)
        elif self.pose_type == "quaternion":
            q = pose_flat
            scale = jnp.sum(q * q, axis=1)
            q = q / copysign(jnp.sqrt(jnp.maximum(scale, 1e-12)), q[:, 0])[:, None]
            pose = quaternion_to_matrix(q)
        else:
            pose = euler_angles_to_matrix(pose_flat, "XYZ")

        if self.dims_priors_enabled:
            deltas_2d = deltas_2d.reshape(n, self.num_classes, 2)
            dims = dims.reshape(n, self.num_classes, 3)
            pose = pose.reshape(n, self.num_classes, 3, 3)
            z = (
                z.reshape(n, self.cluster_bins, self.num_classes)
                if self.cluster_bins > 1
                else z.reshape(n, self.num_classes)
            )
        else:
            deltas_2d = deltas_2d.reshape(n, 2)
            dims = dims.reshape(n, 3)
            pose = pose.reshape(n, 3, 3)
            z = (
                z.reshape(n, self.cluster_bins)
                if self.cluster_bins > 1
                else z.reshape(n)
            )
        if uncert is not None:
            uncert = uncert.reshape(n, -1)[:, 0] if mult == 1 else uncert.reshape(
                n, self.num_classes
            )
        return {
            "deltas_2d": deltas_2d,
            "z": z,
            "dims": dims,
            "pose": pose,
            "uncert": uncert,
        }

"""Released-checkpoint loading: torch .pth files -> model params.

The reference's CLIs are only useful with the released weights
(DetectionCheckpointer.resume_or_load, reference tools/train_net.py:151-168;
demo.py:144-150; GroundingDINO load at roi_heads_gdino.py:87-91). This module
is the CLI-facing glue over the converters:

  load_torch_state      .pth -> flat {name: np.ndarray} (handles wrappers)
  load_rcnn_params      ovmono3d_lift.pth  -> RCNN3D params
  load_gdino_params     groundingdino .pth -> GroundingDINO params
"""
from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)


def load_torch_state(path: str | Path) -> dict[str, np.ndarray]:
    """Load a torch checkpoint into a flat numpy state dict.

    Unwraps the common containers ({'model': ...}, {'state_dict': ...}) and
    strips DDP 'module.' prefixes.
    """
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=False)
    for key in ("model", "state_dict", "ema_state_dict"):
        if isinstance(obj, dict) and isinstance(obj.get(key), dict):
            obj = obj[key]
            break
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v)
    return out


def _merge_subtrees(params: dict, converted: dict) -> dict:
    """Replace params['params'] with the converted tree, shape-validated
    leaf by leaf (converters return the complete tree)."""
    from ovmono3d_tpu.utils.checkpoint_convert import merge_into_params

    return merge_into_params(params, converted, ("params",))


def load_npz_params(params: dict, path: str | Path) -> dict:
    """Load an .npz of flat '/'-joined param paths into a params pytree,
    shape-validated. Complement of:
      np.savez(path, **{'/'.join(p): v for p, v in flattened params})
    """
    import jax

    flat = dict(np.load(str(path)))
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for keypath, old in leaves:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in keypath)
        if name not in flat:
            raise KeyError(f"{path} is missing param '{name}'")
        new = flat[name]
        if np.shape(new) != np.shape(old):
            raise ValueError(
                f"shape mismatch at {name}: model {np.shape(old)} vs "
                f"file {np.shape(new)}"
            )
        out.append(np.asarray(new, dtype=np.asarray(old).dtype))
    logger.info("loaded %d params from %s", len(out), path)
    return jax.tree_util.tree_unflatten(treedef, out)


def load_rcnn_params(params: dict, path: str | Path, model_cfg) -> dict:
    """Load a converted ovmono3d_lift.pth (detectron2 format) into RCNN3D
    params (init'd via model.init). `model_cfg` is cfg.model."""
    from ovmono3d_tpu.utils.lift_convert import convert_ovmono3d_lift

    state = load_torch_state(path)
    converted = convert_ovmono3d_lift(
        state,
        depth=model_cfg.backbone.depth,
        scale_factors=tuple(model_cfg.backbone.scale_factors),
        patch_size=model_cfg.backbone.patch_size,
        shared_fc=model_cfg.cube.shared_fc,
    )
    params = _merge_subtrees(params, converted)
    logger.info("loaded RCNN3D weights from %s (%d tensors)", path,
                len(state))
    return params


def load_gdino_params(params: dict, path: str | Path) -> dict:
    """Load a converted GroundingDINO SwinB checkpoint into GroundingDINO
    params (init'd via model.init)."""
    from ovmono3d_tpu.utils.gdino_convert import convert_groundingdino

    state = load_torch_state(path)
    converted = convert_groundingdino(state)
    params = _merge_subtrees(params, converted)
    logger.info("loaded GroundingDINO weights from %s (%d tensors)", path,
                len(state))
    return params


def load_sam_params(encoder_params: dict, segmenter_params: dict,
                    path: str | Path, depth: int = 12) -> tuple[dict, dict]:
    """Load an official sam_vit_*.pth into (VisionTransformer params,
    SamSegmenter params). `depth` is the encoder depth (12 for vit_b,
    32 for vit_h)."""
    from ovmono3d_tpu.utils.sam_convert import (
        convert_sam_encoder,
        convert_sam_segmenter,
    )

    state = load_torch_state(path)
    encoder_params = _merge_subtrees(
        encoder_params, convert_sam_encoder(state, depth=depth)
    )
    segmenter_params = _merge_subtrees(
        segmenter_params, convert_sam_segmenter(state)
    )
    logger.info("loaded SAM weights from %s (%d tensors)", path, len(state))
    return encoder_params, segmenter_params

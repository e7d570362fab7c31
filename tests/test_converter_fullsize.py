"""Converter dry-runs at the RELEASED checkpoint scales.

tests/test_hf_crossval.py proves converter NUMERICS at small matched
scales; this pins converter KEY NAMING and SHAPES at the full scales of
the checkpoints the reference downloads (/root/reference/setup.sh:1-12:
groundingdino_swinb_cogcoor, sam_vit_h_4b8939, DepthPro) so naming drift
at released scale is impossible. The HF models are instantiated on the
meta device and materialized with to_empty (shape-only, no init math —
full SwinB-GDINO/ViT-H/DepthPro inits would take minutes on one core),
then every converter runs on the real full-size state dict and the result
is matched LEAF-FOR-LEAF (structure both ways + every shape) against
jax.eval_shape of our model's init — a stronger key-drift guarantee than
loading + forward, at trace cost only.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _materialize_meta(cls, *args, **kwargs):
    """Instantiate an HF model with shapes but no init math."""
    with torch.device("meta"):
        model = cls(*args, **kwargs)
    return model.to_empty(device="cpu")


def _state_np(model) -> dict:
    # to_empty leaves garbage values — replace with zeros so converter
    # arithmetic (splits/transposes) runs on well-defined floats.
    return {k: np.zeros(tuple(v.shape), np.float32)
            for k, v in model.state_dict().items()}


def _state_torch(model) -> dict:
    # Same, but torch tensors (for key shims that call .numpy()).
    return {k: torch.zeros(tuple(v.shape))
            for k, v in model.state_dict().items()}


def _assert_matches_init_shapes(model, example_args, converted: dict,
                                init_kwargs: dict | None = None):
    """converted must equal the init param tree in STRUCTURE (both
    directions) and leaf SHAPES; jax.tree.map raises with the offending
    key path otherwise."""
    shapes = jax.eval_shape(
        lambda rng: model.init(rng, *example_args, **(init_kwargs or {})),
        jax.random.PRNGKey(0),
    )
    want = shapes["params"]
    got = converted["params"] if "params" in converted else converted

    def chk(w, g):
        assert tuple(w.shape) == tuple(np.shape(g)), (
            f"shape mismatch: model {tuple(w.shape)} vs converted "
            f"{tuple(np.shape(g))}"
        )
        return 0

    jax.tree.map(chk, want, got)
    n = len(jax.tree.leaves(want))
    assert n > 0
    return n


def test_gdino_swinb_fullsize_convert():
    """GroundingDINO SwinB-384-22k full scale: 6+6 layers, 900 queries,
    Swin-B (128, (2,2,18,2), window 12), BERT-base, text len 256 — the
    groundingdino_swinb_cogcoor.pth geometry."""
    from transformers import (
        BertConfig,
        GroundingDinoConfig,
        GroundingDinoForObjectDetection,
        SwinConfig,
    )

    from ovmono3d_tpu.models.gdino.model import GroundingDINO
    from ovmono3d_tpu.utils.gdino_convert import convert_groundingdino
    from test_hf_crossval import _hf_to_original_keys

    depths = (2, 2, 18, 2)
    swin = SwinConfig(
        image_size=384, patch_size=4, embed_dim=128, depths=list(depths),
        num_heads=[4, 8, 16, 32], window_size=12,
        out_features=["stage2", "stage3", "stage4"], hidden_act="gelu",
    )
    bert = BertConfig()  # BERT-base: 768/12/12/3072, vocab 30522
    cfg = GroundingDinoConfig(
        backbone_config=swin, text_config=bert, d_model=256,
        encoder_layers=6, decoder_layers=6, num_queries=900,
        encoder_attention_heads=8, decoder_attention_heads=8,
        encoder_ffn_dim=2048, decoder_ffn_dim=2048, num_feature_levels=4,
        max_text_len=256, positional_embedding_temperature=20,
    )
    hf = _materialize_meta(GroundingDinoForObjectDetection, cfg)
    state = _state_np(hf)
    converted = convert_groundingdino(
        _hf_to_original_keys(state, depths, 6, 6)
    )

    model = GroundingDINO(compute_dtype=jnp.float32)  # released defaults
    T = 16
    image = jnp.zeros((1, 224, 224, 3))
    ids = jnp.zeros((1, T), jnp.int32)
    mask = jnp.ones((1, T), bool)
    self_mask = jnp.ones((1, T, T), bool)
    pos = jnp.zeros((1, T), jnp.int32)
    n = _assert_matches_init_shapes(
        model, (image, ids, mask, self_mask, pos), converted
    )
    assert n > 500  # full model: hundreds of parameter leaves


def test_sam_vith_encoder_fullsize_convert():
    """SAM ViT-H image encoder (sam_vit_h_4b8939.pth geometry): 1280 dim,
    32 blocks, window 14, global attention at 7/15/23/31, 1024^2 input."""
    from transformers.models.sam.configuration_sam import SamVisionConfig
    from transformers.models.sam.modeling_sam import SamVisionEncoder

    from ovmono3d_tpu.models.vit import VisionTransformer
    from ovmono3d_tpu.utils.sam_convert import convert_sam_encoder

    cfg = SamVisionConfig(
        hidden_size=1280, output_channels=256, num_hidden_layers=32,
        num_attention_heads=16, image_size=1024, patch_size=16,
        window_size=14, global_attn_indexes=[7, 15, 23, 31], mlp_dim=5120,
    )
    hf = _materialize_meta(SamVisionEncoder, cfg)
    sd = _state_np(hf)
    orig = {}
    for k, v in sd.items():
        orig["image_encoder." + k
             .replace("patch_embed.projection", "patch_embed.proj")
             .replace("layers.", "blocks.")
             .replace("layer_norm1", "norm1")
             .replace("layer_norm2", "norm2")
             .replace("neck.conv1", "neck.0")
             .replace("neck.norm1", "neck.1")
             .replace("neck.conv2", "neck.2")
             .replace("neck.norm2", "neck.3")] = v

    model = VisionTransformer(
        patch_size=16, embed_dim=1280, depth=32, num_heads=16,
        mlp_ratio=4.0, pretrain_grid=64, layerscale=False,
        use_depth_fusion=False, use_cls_token=False, window_size=14,
        global_blocks=(7, 15, 23, 31), use_rel_pos=True, neck_channels=256,
        dtype=jnp.float32,
    )
    n = _assert_matches_init_shapes(
        model, (jnp.zeros((1, 1024, 1024, 3)),),
        convert_sam_encoder(orig, depth=32),
    )
    assert n > 300


def test_sam_segmenter_fullsize_convert():
    """SAM prompt encoder + mask decoder at released scale (256/2048)."""
    from transformers import SamConfig, SamModel

    from ovmono3d_tpu.models.sam import SamSegmenter
    from ovmono3d_tpu.utils.sam_convert import convert_sam_segmenter
    from test_hf_crossval import _hf_sam_to_original_keys

    hf = _materialize_meta(SamModel, SamConfig())  # released defaults
    state = _state_torch(hf)  # the shim calls .numpy() per tensor
    converted = convert_sam_segmenter(_hf_sam_to_original_keys(state))

    model = SamSegmenter()  # 256 / 2048 defaults
    embed = jnp.zeros((1, 64, 64, 256))
    boxes = jnp.zeros((1, 4))
    shapes = jax.eval_shape(
        lambda rng: model.init(rng, embed, boxes, 1024.0),
        jax.random.PRNGKey(0),
    )

    def chk(w, g):
        assert tuple(w.shape) == tuple(np.shape(g))
        return 0

    jax.tree.map(chk, shapes["params"], converted)


def test_depth_pro_fullsize_convert():
    """Depth-Pro at apple/DepthPro-hf scale: dual ViT-L/16 @384 trunks,
    1536 pyramid, fusion 256, FOV head (DepthProConfig defaults ARE the
    released geometry)."""
    from transformers import DepthProConfig
    from transformers.models.depth_pro.modeling_depth_pro import (
        DepthProForDepthEstimation,
    )

    from ovmono3d_tpu.models.depth import DepthPro
    from ovmono3d_tpu.utils.depth_convert import convert_depth_pro

    # DepthProConfig() defaults to ViT-B/14 trunks; the released model
    # (apple/DepthPro-hf) uses dinov2l16_384 — ViT-L/16 @384 — matching
    # our DepthPro defaults (models/depth.py:131-141).
    vit = dict(model_type="dinov2", hidden_size=1024, num_hidden_layers=24,
               num_attention_heads=16, image_size=384, patch_size=16)
    cfg = DepthProConfig(patch_model_config=vit, image_model_config=vit,
                         fov_model_config=vit)
    hf = _materialize_meta(DepthProForDepthEstimation, cfg,
                           use_fov_model=True)
    converted = convert_depth_pro(_state_np(hf))

    model = DepthPro(dtype=jnp.float32)  # released defaults
    n = _assert_matches_init_shapes(
        model, (jnp.zeros((1, 1536, 1536, 3)),), converted
    )
    assert n > 300

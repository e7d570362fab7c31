"""Cross-validation against the official HuggingFace implementations.

The released GroundingDINO/SAM/Depth-Pro checkpoints are not available in
this environment, but `transformers` ships the official reference
ARCHITECTURES (converted from and numerically verified against the original
repos). Instantiating them tiny with random weights, exporting the state
dict, mapping it to the original-repo key format, running our converters,
and comparing forward outputs validates our numerics end-to-end — the same
evidence checkpoint-parity would give, minus the released weights
themselves.

Reference targets:
- transformers GroundingDinoForObjectDetection (the HF port of
  groundingdino.models.GroundingDINO, the model the reference loads at
  roi_heads_gdino.py:87-91).
- transformers BertModel (the text trunk, roi_heads_gdino.py caption path).
- The pure-torch MultiScaleDeformableAttention fallback (the semantics of
  the CUDA op in SURVEY.md §2.3).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _seed_all(seed=0):
    torch.manual_seed(seed)
    np.random.seed(seed)


# ---------------------------------------------------------------------------
# Multi-scale deformable attention core
# ---------------------------------------------------------------------------


def test_msda_core_matches_hf_torch():
    """deformable_attention_core vs the official pure-torch fallback
    (modeling_grounding_dino.MultiScaleDeformableAttention.forward)."""
    from transformers.models.grounding_dino.modeling_grounding_dino import (
        MultiScaleDeformableAttention,
    )

    from ovmono3d_tpu.models.gdino.deformable import deformable_attention_core

    _seed_all(0)
    B, H, D, Q, P = 2, 4, 8, 30, 4
    shapes = [(8, 8), (4, 4), (2, 2), (1, 1)]
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(0)
    value = rng.randn(B, S, H, D).astype(np.float32)
    # locations straddling borders exercise the zero-padding path
    loc = rng.uniform(-0.1, 1.1, (B, Q, H, L, P, 2)).astype(np.float32)
    attw = rng.rand(B, Q, H, L, P).astype(np.float32)
    attw /= attw.reshape(B, Q, H, -1).sum(-1)[..., None, None]

    mod = MultiScaleDeformableAttention()
    tshapes = torch.tensor(shapes, dtype=torch.long)
    start = torch.cat(
        (tshapes.new_zeros((1,)), tshapes.prod(1).cumsum(0)[:-1])
    )
    with torch.no_grad():
        want = mod(
            torch.from_numpy(value), tshapes, shapes, start,
            torch.from_numpy(loc), torch.from_numpy(attw), 64,
        ).numpy()

    got = np.asarray(
        deformable_attention_core(
            jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attw)
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# BERT text trunk
# ---------------------------------------------------------------------------


def test_bert_matches_hf_transformers():
    """BertEncoder vs the official BertModel under the GroundingDINO calling
    convention (3-D sub-sentence mask + per-span position ids)."""
    from transformers import BertConfig, BertModel

    from ovmono3d_tpu.models.gdino.bert import (
        BertEncoder,
        build_subsentence_masks,
    )
    from ovmono3d_tpu.utils.checkpoint_convert import merge_into_params
    from ovmono3d_tpu.utils.gdino_convert import convert_bert

    _seed_all(1)
    cfg = BertConfig(
        vocab_size=1100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    hf = BertModel(cfg, add_pooling_layer=False).eval()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}

    ids = np.array([[101, 11, 12, 1012, 13, 1012, 102, 0]], np.int64)
    mask3d, pos_ids = build_subsentence_masks(ids)

    with torch.no_grad():
        want = hf(
            torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask3d),
            position_ids=torch.from_numpy(pos_ids.astype(np.int64)),
        ).last_hidden_state.numpy()

    model = BertEncoder(vocab_size=1100, hidden=32, layers=2, heads=4,
                        intermediate=64, max_position=64)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask3d),
        jnp.asarray(pos_ids),
    )
    params = merge_into_params(params, convert_bert(state, 2, ""),
                               ("params",))
    got = np.asarray(
        model.apply(params, jnp.asarray(ids), jnp.asarray(mask3d),
                    jnp.asarray(pos_ids))
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Full GroundingDINO
# ---------------------------------------------------------------------------


# Moved to the package so tools/validate_release.py can consume HF-hub
# checkpoints too; these aliases keep the crossval tests proving the shims.
from ovmono3d_tpu.utils.hf_shims import (  # noqa: E402
    hf_gdino_to_original_keys as _hf_to_original_keys,
)
def test_groundingdino_matches_hf_transformers():
    """Full-model forward parity: tiny GroundingDinoForObjectDetection vs
    our GroundingDINO at identical (random) weights, random image, real
    caption token pattern."""
    from transformers import (
        BertConfig,
        GroundingDinoConfig,
        GroundingDinoForObjectDetection,
        SwinConfig,
    )

    from ovmono3d_tpu.models.gdino.bert import build_subsentence_masks
    from ovmono3d_tpu.models.gdino.model import GroundingDINO
    from ovmono3d_tpu.utils.checkpoint_convert import merge_into_params
    from ovmono3d_tpu.utils.gdino_convert import convert_groundingdino

    _seed_all(2)
    depths = (2, 2, 2, 2)
    # window 2: every stage resolution (32/16/8/4 at 128^2) is a window
    # multiple >= the window, so neither implementation hits its
    # small-input window-shrink special case and shifted windows are
    # exercised at every stage.
    swin = SwinConfig(
        image_size=128, patch_size=4, embed_dim=16, depths=list(depths),
        num_heads=[1, 2, 4, 8], window_size=2,
        out_features=["stage2", "stage3", "stage4"], hidden_act="gelu",
        drop_path_rate=0.0,
    )
    bert = BertConfig(
        vocab_size=1100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    cfg = GroundingDinoConfig(
        backbone_config=swin, text_config=bert, d_model=32,
        encoder_layers=2, decoder_layers=2, num_queries=20,
        encoder_attention_heads=8, decoder_attention_heads=8,
        encoder_ffn_dim=2048, decoder_ffn_dim=2048, num_feature_levels=4,
        encoder_n_points=4, decoder_n_points=4, max_text_len=64,
        dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        text_enhancer_dropout=0.0, fusion_dropout=0.0, fusion_droppath=0.0,
        positional_embedding_temperature=20,
    )
    hf = GroundingDinoForObjectDetection(cfg).eval()
    # HF zero-initializes the bbox-delta output layers (DETR convention);
    # perturb every parameter so the refinement/delta paths carry signal.
    with torch.no_grad():
        for p in hf.parameters():
            p.add_(torch.randn_like(p) * 0.02)

    rng = np.random.RandomState(3)
    image = rng.rand(1, 128, 128, 3).astype(np.float32)
    # "[CLS] tok tok . tok . [SEP] pad..." — the caption pattern the
    # reference builds (roi_heads_gdino.py:176-181)
    ids = np.zeros((1, 12), np.int64)
    ids[0, :7] = [101, 11, 12, 1012, 13, 1012, 102]
    pad_mask = (ids != 0).astype(np.int64)

    with torch.no_grad():
        want = hf(
            pixel_values=torch.from_numpy(
                image.transpose(0, 3, 1, 2)).contiguous(),
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(pad_mask),
        )
    want_logits = want.logits.numpy()          # [1, 20, 64]
    want_boxes = want.pred_boxes.numpy()       # [1, 20, 4]

    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    orig = _hf_to_original_keys(state, depths, 2, 2)
    converted = convert_groundingdino(orig)

    model = GroundingDINO(
        hidden_dim=32, nheads=8, enc_layers=2, dec_layers=2,
        num_queries=20, enc_points=4, dec_points=4, max_text_len=64,
        ffn_dim=2048, swin_embed_dim=16, swin_depths=depths,
        swin_heads=(1, 2, 4, 8), swin_window=2, bert_layers=2,
        bert_hidden=32, bert_heads=4, bert_intermediate=64, bert_vocab=1100,
        bert_max_position=64, compute_dtype=jnp.float32,
    )
    mask3d, pos_ids = build_subsentence_masks(ids)
    args = (
        jnp.asarray(image), jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(pad_mask.astype(bool)), jnp.asarray(mask3d),
        jnp.asarray(pos_ids),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    params = merge_into_params(params, converted["params"]
                           if "params" in converted else converted,
                           ("params",))
    got = jax.jit(model.apply)(params, *args)
    got_logits = np.asarray(got["pred_logits"])
    got_boxes = np.asarray(got["pred_boxes"])

    # Only valid text columns carry information (both implementations fill
    # masked columns with -inf/-1e9).
    valid_t = pad_mask[0].astype(bool)
    np.testing.assert_allclose(
        got_boxes, want_boxes, atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        got_logits[:, :, :12][:, :, valid_t],
        want_logits[:, :, :12][:, :, valid_t],
        atol=5e-4, rtol=1e-3,
    )


# ---------------------------------------------------------------------------
# SAM prompt encoder + mask decoder
# ---------------------------------------------------------------------------


from ovmono3d_tpu.utils.hf_shims import (  # noqa: E402
    hf_sam_to_original_keys as _hf_sam_to_original_keys,
)

def test_sam_segmenter_matches_hf_transformers():
    """SamSegmenter (prompt encoder + two-way mask decoder) vs the official
    transformers SamModel over precomputed image embeddings and a box
    prompt (the GEO path: run_seg_anything, ovmono3d_geo.py:213-217)."""
    from transformers import SamConfig, SamModel
    from transformers.models.sam.configuration_sam import (
        SamMaskDecoderConfig,
        SamPromptEncoderConfig,
        SamVisionConfig,
    )

    from ovmono3d_tpu.models.sam import SamSegmenter
    from ovmono3d_tpu.utils.checkpoint_convert import merge_into_params
    from ovmono3d_tpu.utils.sam_convert import convert_sam_segmenter

    _seed_all(4)
    v = SamVisionConfig(hidden_size=48, output_channels=32,
                        num_hidden_layers=1, num_attention_heads=4,
                        image_size=64, patch_size=8, num_pos_feats=16)
    p = SamPromptEncoderConfig(hidden_size=32, image_embedding_size=8,
                               image_size=128, mask_input_channels=8)
    d = SamMaskDecoderConfig(hidden_size=32, num_hidden_layers=2,
                             num_attention_heads=8, mlp_dim=64,
                             iou_head_hidden_dim=32)
    hf = SamModel(SamConfig(vision_config=v, prompt_encoder_config=p,
                            mask_decoder_config=d)).eval()
    with torch.no_grad():
        for prm in hf.parameters():
            prm.add_(torch.randn_like(prm) * 0.05)
        # The original SAM uses ONE PositionEmbeddingRandom for both the
        # sparse prompts and the image-wide dense PE; HF splits it into two
        # separately-initialized copies of the same checkpoint tensor — tie
        # them back together.
        hf.shared_image_embedding.positional_embedding.copy_(
            hf.prompt_encoder.shared_embedding.positional_embedding
        )

    rng = np.random.RandomState(5)
    embed = rng.randn(2, 32, 8, 8).astype(np.float32)  # [B, C, H, W]
    boxes = np.array([[[10.0, 20.0, 90.0, 110.0]],
                      [[5.0, 3.0, 40.0, 80.0]]], np.float32)

    with torch.no_grad():
        got_hf = hf(
            image_embeddings=torch.from_numpy(embed),
            input_boxes=torch.from_numpy(boxes),
            multimask_output=True,
        )
    want_masks = got_hf.pred_masks.numpy()[:, 0]   # [B, 3, 32, 32]
    want_iou = got_hf.iou_scores.numpy()[:, 0]     # [B, 3]

    model = SamSegmenter(embed_dim=32, decoder_mlp_dim=64)
    args = (
        jnp.asarray(embed.transpose(0, 2, 3, 1)),   # NHWC
        jnp.asarray(boxes[:, 0]),                   # [B, 4]
        128.0,
    )
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), *args
    )
    state = {k: v_ for k, v_ in hf.state_dict().items()}
    converted = convert_sam_segmenter(_hf_sam_to_original_keys(state))
    params = merge_into_params(params, converted, ("params",))
    masks, iou = model.apply(params, *args)
    np.testing.assert_allclose(np.asarray(masks), want_masks,
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(iou), want_iou,
                               atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# DINOv2 trunk (the flagship backbone)
# ---------------------------------------------------------------------------


def test_dinov2_matches_hf_transformers():
    """VisionTransformer (dinov2 preset) vs the official Dinov2Model at the
    pretrain grid (pre-final-norm hidden state, which is what the
    reference's backbone consumes — dino.py:70-120 runs blocks directly)."""
    from transformers import Dinov2Config, Dinov2Model

    from ovmono3d_tpu.models.vit import VisionTransformer
    from ovmono3d_tpu.utils.checkpoint_convert import (
        convert_dinov2_vit,
        merge_into_params,
    )

    _seed_all(6)
    cfg = Dinov2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        image_size=56, patch_size=14, layerscale_value=1.0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    hf = Dinov2Model(cfg).eval()
    with torch.no_grad():
        for prm in hf.parameters():
            prm.add_(torch.randn_like(prm) * 0.05)

    rng = np.random.RandomState(7)
    image = rng.rand(2, 56, 56, 3).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(image.transpose(0, 3, 1, 2)).contiguous(),
                 output_hidden_states=True)
    want = out.hidden_states[-1].numpy()  # pre-final-layernorm

    sd = hf.state_dict()

    def fuse_qkv(p):
        return {
            "weight": np.concatenate([
                sd[p + "query.weight"], sd[p + "key.weight"],
                sd[p + "value.weight"]], 0),
            "bias": np.concatenate([
                sd[p + "query.bias"], sd[p + "key.bias"],
                sd[p + "value.bias"]], 0),
        }

    hub = {
        "cls_token": sd["embeddings.cls_token"].numpy(),
        "pos_embed": sd["embeddings.position_embeddings"].numpy(),
        "patch_embed.proj.weight":
            sd["embeddings.patch_embeddings.projection.weight"].numpy(),
        "patch_embed.proj.bias":
            sd["embeddings.patch_embeddings.projection.bias"].numpy(),
    }
    for i in range(2):
        h = f"encoder.layer.{i}."
        o = f"blocks.{i}."
        qkv = fuse_qkv(h + "attention.attention.")
        hub[o + "attn.qkv.weight"] = qkv["weight"].numpy() \
            if hasattr(qkv["weight"], "numpy") else qkv["weight"]
        hub[o + "attn.qkv.bias"] = qkv["bias"]
        for src, dst in (
            ("norm1.weight", "norm1.weight"), ("norm1.bias", "norm1.bias"),
            ("attention.output.dense.weight", "attn.proj.weight"),
            ("attention.output.dense.bias", "attn.proj.bias"),
            ("layer_scale1.lambda1", "ls1.gamma"),
            ("layer_scale2.lambda1", "ls2.gamma"),
            ("norm2.weight", "norm2.weight"), ("norm2.bias", "norm2.bias"),
            ("mlp.fc1.weight", "mlp.fc1.weight"),
            ("mlp.fc1.bias", "mlp.fc1.bias"),
            ("mlp.fc2.weight", "mlp.fc2.weight"),
            ("mlp.fc2.bias", "mlp.fc2.bias"),
        ):
            hub[o + dst] = sd[h + src].numpy()

    model = VisionTransformer(
        patch_size=14, embed_dim=32, depth=2, num_heads=4, pretrain_grid=4,
        layerscale=True, use_depth_fusion=False, dtype=jnp.float32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(image))
    params = merge_into_params(
        params, convert_dinov2_vit(hub, depth=2), ("params",)
    )
    got = model.apply(params, jnp.asarray(image))
    np.testing.assert_allclose(
        np.asarray(got["last_feat"]).reshape(2, 16, 32), want[:, 1:],
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["cls"]), want[:, 0], atol=2e-5, rtol=1e-4
    )


# ---------------------------------------------------------------------------
# SAM image encoder (windowed ViT + decomposed rel-pos attention + neck)
# ---------------------------------------------------------------------------


def test_sam_encoder_matches_hf_transformers():
    """VisionTransformer (sam preset) vs the official SamVisionEncoder,
    with a window size that does NOT divide the grid so the pad-after-norm
    ordering in the windowed blocks is exercised."""
    from transformers.models.sam.configuration_sam import SamVisionConfig
    from transformers.models.sam.modeling_sam import SamVisionEncoder

    from ovmono3d_tpu.models.vit import VisionTransformer
    from ovmono3d_tpu.utils.checkpoint_convert import merge_into_params
    from ovmono3d_tpu.utils.sam_convert import convert_sam_encoder

    _seed_all(8)
    cfg = SamVisionConfig(
        hidden_size=32, output_channels=16, num_hidden_layers=3,
        num_attention_heads=4, image_size=64, patch_size=8, window_size=3,
        global_attn_indexes=[1], mlp_dim=64,
    )
    hf = SamVisionEncoder(cfg).eval()
    with torch.no_grad():
        for prm in hf.parameters():
            prm.add_(torch.randn_like(prm) * 0.05)

    rng = np.random.RandomState(9)
    image = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = hf(
            torch.from_numpy(image.transpose(0, 3, 1, 2)).contiguous()
        ).last_hidden_state.numpy()  # [B, 16, 8, 8]

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    orig = {}
    for k, v in sd.items():
        k2 = ("image_encoder." + k
              .replace("patch_embed.projection", "patch_embed.proj")
              .replace("layers.", "blocks.")
              .replace("layer_norm1", "norm1")
              .replace("layer_norm2", "norm2")
              .replace("neck.conv1", "neck.0")
              .replace("neck.norm1", "neck.1")
              .replace("neck.conv2", "neck.2")
              .replace("neck.norm2", "neck.3"))
        orig[k2] = v

    model = VisionTransformer(
        patch_size=8, embed_dim=32, depth=3, num_heads=4, mlp_ratio=2.0,
        pretrain_grid=8, layerscale=False, use_depth_fusion=False,
        use_cls_token=False, window_size=3, global_blocks=(1,),
        use_rel_pos=True, neck_channels=16, dtype=jnp.float32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(image))
    params = merge_into_params(
        params, convert_sam_encoder(orig, depth=3), ("params",)
    )
    got = model.apply(params, jnp.asarray(image))
    np.testing.assert_allclose(
        np.asarray(got["last_feat"]).transpose(0, 3, 1, 2), want,
        atol=5e-5, rtol=1e-4,
    )


# ---------------------------------------------------------------------------
# Depth-Pro (multi-scale patchwork encoder + DPT fusion + FOV network)
# ---------------------------------------------------------------------------


def test_depth_pro_matches_hf_transformers():
    """DepthPro vs the official transformers DepthProForDepthEstimation at
    matched random weights: 3-scale pyramid (1 + 9 + 25 crops, the real
    patch layout), patch/image/fov encoders, neck, fusion, both heads."""
    from transformers import DepthProConfig
    from transformers.models.depth_pro.modeling_depth_pro import (
        DepthProForDepthEstimation,
    )

    from ovmono3d_tpu.models.depth import DepthPro
    from ovmono3d_tpu.utils.checkpoint_convert import merge_into_params
    from ovmono3d_tpu.utils.depth_convert import convert_depth_pro

    _seed_all(10)
    vit = dict(model_type="dinov2", hidden_size=32, num_hidden_layers=2,
               num_attention_heads=4, image_size=32, patch_size=8,
               layerscale_value=1.0, hidden_dropout_prob=0.0,
               attention_probs_dropout_prob=0.0, drop_path_rate=0.0)
    cfg = DepthProConfig(
        patch_size=32, patch_model_config=vit, image_model_config=vit,
        fov_model_config=vit,
        scaled_images_ratios=[0.25, 0.5, 1.0],
        scaled_images_overlap_ratios=[0.0, 0.5, 0.25],
        scaled_images_feature_dims=[16, 16, 8],
        intermediate_hook_ids=[1], intermediate_feature_dims=[8],
        fusion_hidden_size=8, merge_padding_value=1,
        num_fov_head_layers=2, use_fov_model=True,
    )
    hf = DepthProForDepthEstimation(cfg, use_fov_model=True).eval()
    with torch.no_grad():
        for prm in hf.parameters():
            prm.add_(torch.randn_like(prm) * 0.05)

    rng = np.random.RandomState(11)
    image = rng.rand(2, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(image.transpose(0, 3, 1, 2)).contiguous())
    want_depth = want.predicted_depth.numpy()     # [B, 128, 128]
    want_fov = want.field_of_view.numpy()         # [B]

    model = DepthPro(
        patch_size=8, encoder_size=32, vit_dim=32, vit_depth=2, vit_heads=4,
        scaled_ratios=(0.25, 0.5, 1.0), overlap_ratios=(0.0, 0.5, 0.25),
        scaled_dims=(16, 16, 8), hook_ids=(1,), hook_dims=(8,),
        fusion_dim=8, merge_padding=1, num_fov_layers=2, use_fov=True,
        dtype=jnp.float32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(image))
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = merge_into_params(params, convert_depth_pro(state), ("params",))
    got = jax.jit(model.apply)(params, jnp.asarray(image))
    # atol covers f32 accumulation noise at the final relu boundary (output
    # values range to ~50; measured max abs diff ~5e-4).
    np.testing.assert_allclose(
        np.asarray(got["canonical_inverse_depth"]), want_depth,
        atol=1e-3, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["fov_deg"]), want_fov, atol=5e-5, rtol=1e-4
    )


# ---------------------------------------------------------------------------
# CLIP vision tower
# ---------------------------------------------------------------------------


def test_clip_tower_matches_hf_transformers():
    """VisionTransformer (clip preset: pre-LN, QuickGELU, eps 1e-5) vs the
    official CLIPVisionModel, pre-post_layernorm hidden state (the
    reference taps raw block outputs, clip.py:80-92)."""
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from ovmono3d_tpu.models.vit import VisionTransformer
    from ovmono3d_tpu.utils.checkpoint_convert import (
        convert_clip_vit,
        merge_into_params,
    )

    _seed_all(12)
    cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16,
        hidden_act="quick_gelu", attention_dropout=0.0,
    )
    hf = CLIPVisionModel(cfg).eval()
    with torch.no_grad():
        for prm in hf.parameters():
            prm.add_(torch.randn_like(prm) * 0.05)

    rng = np.random.RandomState(13)
    image = rng.rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(image.transpose(0, 3, 1, 2)).contiguous(),
                 output_hidden_states=True)
    want = out.hidden_states[-1].numpy()

    # HF CLIPVisionModel names -> open_clip visual tower names
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    oc = {}
    for k, v in sd.items():
        k = k.replace("vision_model.", "")
        k = (k.replace("embeddings.class_embedding", "class_embedding")
              .replace("embeddings.position_embedding.weight",
                       "positional_embedding")
              .replace("embeddings.patch_embedding.weight", "conv1.weight")
              .replace("pre_layrnorm", "ln_pre")
              .replace("encoder.layers.", "transformer.resblocks.")
              .replace("layer_norm1", "ln_1")
              .replace("layer_norm2", "ln_2")
              .replace("self_attn.out_proj", "attn.out_proj")
              .replace("mlp.fc1", "mlp.c_fc")
              .replace("mlp.fc2", "mlp.c_proj"))
        oc["visual." + k] = v
    n_layers = 2
    for i in range(n_layers):
        p = f"visual.transformer.resblocks.{i}.self_attn."
        oc[f"visual.transformer.resblocks.{i}.attn.in_proj_weight"] = (
            np.concatenate([oc.pop(p + "q_proj.weight"),
                            oc.pop(p + "k_proj.weight"),
                            oc.pop(p + "v_proj.weight")], 0))
        oc[f"visual.transformer.resblocks.{i}.attn.in_proj_bias"] = (
            np.concatenate([oc.pop(p + "q_proj.bias"),
                            oc.pop(p + "k_proj.bias"),
                            oc.pop(p + "v_proj.bias")], 0))

    model = VisionTransformer(
        patch_size=16, embed_dim=32, depth=2, num_heads=4, pretrain_grid=2,
        layerscale=False, use_depth_fusion=False, pre_ln=True,
        quick_gelu=True, norm_eps=1e-5, dtype=jnp.float32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(image))
    params = merge_into_params(params, convert_clip_vit(oc), ("params",))
    got = model.apply(params, jnp.asarray(image))
    np.testing.assert_allclose(
        np.asarray(got["last_feat"]).reshape(2, 4, 32), want[:, 1:],
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["cls"]), want[:, 0], atol=2e-5, rtol=1e-4
    )


# ---------------------------------------------------------------------------
# MAE trunk (sin-cos position rebuild at a non-pretrain grid)
# ---------------------------------------------------------------------------


def test_mae_matches_reference_path():
    """VisionTransformer (mae preset semantics) vs the reference's exact
    computation — ViTMAE patch embeddings + dynamically rebuilt 2D sin-cos
    positions + encoder (mae.py:61-113 embed_forward/resize_pos_embed) —
    at a rectangular, non-pretrain grid."""
    from transformers import ViTMAEConfig
    from transformers.models.vit_mae.modeling_vit_mae import ViTMAEModel

    from ovmono3d_tpu.models.vit import VisionTransformer
    from ovmono3d_tpu.utils.checkpoint_convert import (
        convert_mae_vit,
        merge_into_params,
    )

    _seed_all(14)
    cfg = ViTMAEConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    hf = ViTMAEModel(cfg).eval()
    with torch.no_grad():
        for prm in hf.parameters():
            prm.add_(torch.randn_like(prm) * 0.05)

    # reference embed_forward at 64x32 (grid 4x2 != pretrain 2x2)
    from cmath import inf  # noqa: F401  (keep torch import scope tidy)
    import numpy as _np

    def sincos_1d(dim, pos):
        omega = 1.0 / 10000 ** (_np.arange(dim // 2, dtype=_np.float64)
                                / (dim // 2))
        x = _np.einsum("n,d->nd", pos, omega)
        return _np.concatenate([_np.sin(x), _np.cos(x)], -1)

    def sincos_2d(dim, h, w):
        gw, gh = _np.meshgrid(_np.arange(w, dtype=_np.float32),
                              _np.arange(h, dtype=_np.float32))
        return _np.concatenate(
            [sincos_1d(dim // 2, gw.reshape(-1)),
             sincos_1d(dim // 2, gh.reshape(-1))], -1
        ).astype(_np.float32)

    rng = np.random.RandomState(15)
    image = rng.rand(2, 64, 32, 3).astype(np.float32)
    with torch.no_grad():
        timg = torch.from_numpy(image.transpose(0, 3, 1, 2)).contiguous()
        hf.embeddings.patch_embeddings.image_size = (64, 32)
        emb = hf.embeddings.patch_embeddings(timg)
        pos = torch.from_numpy(sincos_2d(32, 4, 2))
        emb = emb + pos[None]
        cls = hf.embeddings.cls_token.expand(2, -1, -1)
        emb = torch.cat([cls, emb], dim=1)
        want = hf.encoder(emb).last_hidden_state.numpy()

    model = VisionTransformer(
        patch_size=16, embed_dim=32, depth=2, num_heads=4, pretrain_grid=2,
        layerscale=False, use_depth_fusion=False, pos_sincos=True,
        norm_eps=1e-12, dtype=jnp.float32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(image))
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = merge_into_params(params, convert_mae_vit(state, ""),
                               ("params",))
    got = model.apply(params, jnp.asarray(image))
    np.testing.assert_allclose(
        np.asarray(got["last_feat"]).reshape(2, 8, 32), want[:, 1:],
        atol=2e-5, rtol=1e-4,
    )


# ---------------------------------------------------------------------------
# MiDaS trunk (timm ViT-L/16; plain ViT with learned positions)
# ---------------------------------------------------------------------------


def test_midas_trunk_matches_hf_vit():
    """VisionTransformer (midas preset semantics) vs the official plain-ViT
    executor (transformers ViTModel at timm eps 1e-6), through
    convert_midas_vit on a timm-named state dict (midas_final.py:57-85 runs
    patch_embed + cls + pos + blocks with no final norm)."""
    from transformers import ViTConfig, ViTModel

    from ovmono3d_tpu.models.vit import VisionTransformer
    from ovmono3d_tpu.utils.checkpoint_convert import (
        convert_midas_vit,
        merge_into_params,
    )

    _seed_all(16)
    cfg = ViTConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16,
        layer_norm_eps=1e-6, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    hf = ViTModel(cfg, add_pooling_layer=False).eval()
    with torch.no_grad():
        for prm in hf.parameters():
            prm.add_(torch.randn_like(prm) * 0.05)

    rng = np.random.RandomState(17)
    image = rng.rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(image.transpose(0, 3, 1, 2)).contiguous(),
                 output_hidden_states=True, interpolate_pos_encoding=False)
    want = out.hidden_states[-1].numpy()  # pre-final-norm (reference taps
    # raw block outputs, midas_final.py:76-85)

    # HF ViTModel names -> timm/MiDaS names consumed by convert_midas_vit
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    timm = {
        "pretrained.model.cls_token": sd["embeddings.cls_token"],
        "pretrained.model.pos_embed": sd["embeddings.position_embeddings"],
        "pretrained.model.patch_embed.proj.weight":
            sd["embeddings.patch_embeddings.projection.weight"],
        "pretrained.model.patch_embed.proj.bias":
            sd["embeddings.patch_embeddings.projection.bias"],
    }
    for i in range(2):
        h = f"encoder.layer.{i}."
        o = f"pretrained.model.blocks.{i}."
        timm[o + "attn.qkv.weight"] = np.concatenate([
            sd[h + "attention.attention.query.weight"],
            sd[h + "attention.attention.key.weight"],
            sd[h + "attention.attention.value.weight"]], 0)
        timm[o + "attn.qkv.bias"] = np.concatenate([
            sd[h + "attention.attention.query.bias"],
            sd[h + "attention.attention.key.bias"],
            sd[h + "attention.attention.value.bias"]], 0)
        for src, dst in (
            ("layernorm_before.weight", "norm1.weight"),
            ("layernorm_before.bias", "norm1.bias"),
            ("attention.output.dense.weight", "attn.proj.weight"),
            ("attention.output.dense.bias", "attn.proj.bias"),
            ("layernorm_after.weight", "norm2.weight"),
            ("layernorm_after.bias", "norm2.bias"),
            ("intermediate.dense.weight", "mlp.fc1.weight"),
            ("intermediate.dense.bias", "mlp.fc1.bias"),
            ("output.dense.weight", "mlp.fc2.weight"),
            ("output.dense.bias", "mlp.fc2.bias"),
        ):
            timm[o + dst] = sd[h + src]

    model = VisionTransformer(
        patch_size=16, embed_dim=32, depth=2, num_heads=4, pretrain_grid=2,
        layerscale=False, use_depth_fusion=False, norm_eps=1e-6,
        dtype=jnp.float32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(image))
    params = merge_into_params(params, convert_midas_vit(timm), ("params",))
    got = model.apply(params, jnp.asarray(image))
    np.testing.assert_allclose(
        np.asarray(got["last_feat"]).reshape(2, 4, 32), want[:, 1:],
        atol=2e-5, rtol=1e-4,
    )


# ---------------------------------------------------------------------------
# WordPiece tokenizer
# ---------------------------------------------------------------------------


def test_tokenizer_matches_hf_bert_tokenizer(tmp_path):
    """Our self-contained WordPiece tokenizer vs transformers.BertTokenizer
    built from the same vocab file (the reference tokenizes captions with
    AutoTokenizer('bert-base-uncased'), roi_heads_gdino.py:196-200)."""
    from transformers import BertTokenizer as HFTok

    from ovmono3d_tpu.models.gdino.tokenizer import (
        BertTokenizer,
        build_caption,
    )

    vocab = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", ".", ",", "-", "'",
        "chair", "lap", "##top", "cereal", "box", "couch", "tv", "stand",
        "fire", "##place", "book", "##s", "caf", "##e", "night", "##stand",
        "x", "##y", "##z",
    ]
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(vocab) + "\n")
    hf = HFTok(str(path), do_lower_case=True)
    ours = BertTokenizer(str(path))

    captions = [
        build_caption(["chair", "laptop", "cereal box"]),
        build_caption(["TV stand", "fireplace", "nightstand"]),
        "café books , x-yz .",           # accents, punct splits
        "unknownword . chair.laptop",         # UNK + glued punctuation
        "  chair   laptop  ",                 # whitespace runs
        "x" * 120 + " . chair",               # >100-char word -> [UNK]
        "chair\x00lap�top",              # control/replacement chars
        "椅子 chair 桌",                      # CJK chars split per-char
        "chair\tlaptop\nbooks",               # tab/newline whitespace
    ]
    for text in captions:
        want = hf.encode(text)                 # [CLS] ... [SEP]
        got, n = ours.encode(text, max_len=64)
        assert got[:n] == want, (text, got[:n], want)


# ---------------------------------------------------------------------------
# Swin trunk with PADDED windows (the real SwinB@800 case: 200 -> 204)
# ---------------------------------------------------------------------------


def test_swin_padded_windows_match_hf():
    """SwinTransformer vs the official SwinBackbone at a window that does
    NOT divide the stage grids (pads on every stage, shifted masks over
    padded regions) — the geometry the released SwinB@800 runs."""
    from transformers import SwinConfig
    from transformers.models.swin.modeling_swin import SwinBackbone

    from ovmono3d_tpu.models.gdino.swin import SwinTransformer
    from ovmono3d_tpu.utils.checkpoint_convert import merge_into_params
    from ovmono3d_tpu.utils.gdino_convert import convert_swin

    _seed_all(18)
    depths = (2, 2, 2, 2)
    cfg = SwinConfig(
        image_size=128, patch_size=4, embed_dim=16, depths=list(depths),
        num_heads=[1, 2, 4, 8], window_size=3,
        out_features=["stage2", "stage3", "stage4"], hidden_act="gelu",
        drop_path_rate=0.0, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    hf = SwinBackbone(cfg).eval()
    with torch.no_grad():
        for prm in hf.parameters():
            prm.add_(torch.randn_like(prm) * 0.05)

    rng = np.random.RandomState(19)
    image = rng.rand(2, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        want = hf(
            torch.from_numpy(image.transpose(0, 3, 1, 2)).contiguous()
        ).feature_maps  # 3 maps, NCHW

    # reuse the GDINO shim's Swin section by wrapping keys in its prefix
    sd = {("model.backbone.conv_encoder.model." + k): v.numpy()
          for k, v in hf.state_dict().items()}
    out = {}
    _swin_keys_to_original(sd, out, depths)
    converted = convert_swin(out, depths=depths)

    model = SwinTransformer(embed_dim=16, depths=depths,
                            num_heads=(1, 2, 4, 8), window=3,
                            dtype=jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(image))
    params = merge_into_params(params, converted, ("params",))
    got = model.apply(params, jnp.asarray(image))
    for key, w in zip(("s1", "s2", "s3"), want):
        np.testing.assert_allclose(
            np.asarray(got[key]).transpose(0, 3, 1, 2), w.numpy(),
            atol=5e-5, rtol=1e-4,
        )


def _swin_keys_to_original(sd, out, depths):
    """The Swin section of _hf_to_original_keys, reusable standalone."""

    def fuse(dst, src):
        out[dst + "weight"] = np.concatenate(
            [sd[src + "query.weight"], sd[src + "key.weight"],
             sd[src + "value.weight"]], 0)
        out[dst + "bias"] = np.concatenate(
            [sd[src + "query.bias"], sd[src + "key.bias"],
             sd[src + "value.bias"]], 0)

    def copy(dst, src):
        for s in (".weight", ".bias"):
            out[dst + s] = sd[src + s]

    sw_hf = "model.backbone.conv_encoder.model."
    sw = "backbone.0."
    copy(sw + "patch_embed.proj",
         sw_hf + "embeddings.patch_embeddings.projection")
    copy(sw + "patch_embed.norm", sw_hf + "embeddings.norm")
    for si, depth in enumerate(depths):
        for bi in range(depth):
            hb = f"{sw_hf}encoder.layers.{si}.blocks.{bi}."
            ob = f"{sw}layers.{si}.blocks.{bi}."
            copy(ob + "norm1", hb + "layernorm_before")
            fuse(ob + "attn.qkv.", hb + "attention.self.")
            out[ob + "attn.relative_position_bias_table"] = sd[
                hb + "attention.self.relative_position_bias_table"]
            copy(ob + "attn.proj", hb + "attention.output.dense")
            copy(ob + "norm2", hb + "layernorm_after")
            copy(ob + "mlp.fc1", hb + "intermediate.dense")
            copy(ob + "mlp.fc2", hb + "output.dense")
        if si < len(depths) - 1:
            hd = f"{sw_hf}encoder.layers.{si}.downsample."
            out[f"{sw}layers.{si}.downsample.reduction.weight"] = sd[
                hd + "reduction.weight"]
            copy(f"{sw}layers.{si}.downsample.norm", hd + "norm")
    for oi, stage in ((1, "stage2"), (2, "stage3"), (3, "stage4")):
        copy(f"{sw}norm{oi}", sw_hf + f"hidden_states_norms.{stage}")


# ---------------------------------------------------------------------------
# Positional-embedding bicubic interpolation (torch conventions)
# ---------------------------------------------------------------------------


def test_pos_embed_resize_matches_torch_bicubic():
    """resize_pos_embed vs torch F.interpolate(mode='bicubic') for both
    mappings the trunks use: size-based (CLIP/SAM/MiDaS resize helpers) and
    DINOv2's scale_factor=(new+0.1)/old (interpolate_pos_encoding) — the
    flagship 37->64 grid resize at 896² runs through this every forward.
    torch's cubic kernel (a=-0.75) differs from jax.image.resize (a=-0.5)."""
    import torch.nn.functional as F

    from ovmono3d_tpu.models.vit import resize_pos_embed

    rng = np.random.RandomState(20)
    g, c = 37, 16
    table = rng.randn(1, 1 + g * g, c).astype(np.float32)
    grid_t = torch.from_numpy(
        table[:, 1:].reshape(1, g, g, c).transpose(0, 3, 1, 2)
    )

    for h, w, offset in ((64, 64, 0.1), (64, 64, 0.0), (24, 31, 0.0),
                         (24, 31, 0.1)):
        if offset:
            want = F.interpolate(
                grid_t, scale_factor=((h + offset) / g, (w + offset) / g),
                mode="bicubic", align_corners=False,
                recompute_scale_factor=False,
            )
        else:
            want = F.interpolate(grid_t, size=(h, w), mode="bicubic",
                                 align_corners=False)
        assert want.shape[-2:] == (h, w)
        want = want.permute(0, 2, 3, 1).reshape(1, h * w, c).numpy()
        got = np.asarray(
            resize_pos_embed(jnp.asarray(table), (h, w), offset)
        )
        np.testing.assert_allclose(got[:, 0], table[:, 0], atol=0)
        np.testing.assert_allclose(got[:, 1:], want, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# CLIP visual tower (pre-LN + QuickGELU; reference clip.py:93-133)
# ---------------------------------------------------------------------------


def test_clip_vision_matches_hf_transformers():
    """VisionTransformer (clip preset knobs) vs the official CLIPVisionModel
    with hidden_act='quick_gelu' (what the 'openai' open_clip checkpoints the
    reference loads use). Compares the pre-post_layernorm hidden state, which
    is what the reference's manual block loop consumes (clip.py:93-133)."""
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from ovmono3d_tpu.models.vit import VisionTransformer
    from ovmono3d_tpu.utils.checkpoint_convert import (
        convert_clip_vit,
        merge_into_params,
    )

    _seed_all(11)
    cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=48, patch_size=16,
        hidden_act="quick_gelu", attention_dropout=0.0, layer_norm_eps=1e-5,
    )
    hf = CLIPVisionModel(cfg).eval()
    with torch.no_grad():
        for prm in hf.parameters():
            prm.add_(torch.randn_like(prm) * 0.05)

    rng = np.random.RandomState(12)
    image = rng.rand(2, 48, 48, 3).astype(np.float32)
    with torch.no_grad():
        out = hf(
            torch.from_numpy(image.transpose(0, 3, 1, 2)).contiguous(),
            output_hidden_states=True,
        )
    want = out.hidden_states[-1].numpy()  # pre post_layernorm

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    # HF spells the embedding-side LayerNorm 'pre_layrnorm' (kept for ckpt
    # compat in transformers); tolerate either spelling.
    pre = ("vision_model.pre_layrnorm."
           if "vision_model.pre_layrnorm.weight" in sd
           else "vision_model.pre_layernorm.")
    oc = {
        "visual.class_embedding":
            sd["vision_model.embeddings.class_embedding"],
        "visual.positional_embedding":
            sd["vision_model.embeddings.position_embedding.weight"],
        "visual.conv1.weight":
            sd["vision_model.embeddings.patch_embedding.weight"],
        "visual.ln_pre.weight": sd[pre + "weight"],
        "visual.ln_pre.bias": sd[pre + "bias"],
    }
    for i in range(2):
        h = f"vision_model.encoder.layers.{i}."
        o = f"visual.transformer.resblocks.{i}."
        oc[o + "attn.in_proj_weight"] = np.concatenate([
            sd[h + "self_attn.q_proj.weight"],
            sd[h + "self_attn.k_proj.weight"],
            sd[h + "self_attn.v_proj.weight"]], 0)
        oc[o + "attn.in_proj_bias"] = np.concatenate([
            sd[h + "self_attn.q_proj.bias"],
            sd[h + "self_attn.k_proj.bias"],
            sd[h + "self_attn.v_proj.bias"]], 0)
        for src, dst in (
            ("self_attn.out_proj.weight", "attn.out_proj.weight"),
            ("self_attn.out_proj.bias", "attn.out_proj.bias"),
            ("layer_norm1.weight", "ln_1.weight"),
            ("layer_norm1.bias", "ln_1.bias"),
            ("layer_norm2.weight", "ln_2.weight"),
            ("layer_norm2.bias", "ln_2.bias"),
            ("mlp.fc1.weight", "mlp.c_fc.weight"),
            ("mlp.fc1.bias", "mlp.c_fc.bias"),
            ("mlp.fc2.weight", "mlp.c_proj.weight"),
            ("mlp.fc2.bias", "mlp.c_proj.bias"),
        ):
            oc[o + dst] = sd[h + src]

    model = VisionTransformer(
        patch_size=16, embed_dim=32, depth=2, num_heads=4, pretrain_grid=3,
        layerscale=False, pre_ln=True, quick_gelu=True, norm_eps=1e-5,
        use_depth_fusion=False, dtype=jnp.float32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(image))
    params = merge_into_params(params, convert_clip_vit(oc), ("params",))
    got = model.apply(params, jnp.asarray(image))
    np.testing.assert_allclose(
        np.asarray(got["last_feat"]).reshape(2, 9, 32), want[:, 1:],
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["cls"]), want[:, 0], atol=2e-5, rtol=1e-4
    )


# ---------------------------------------------------------------------------
# MAE trunk (fixed 2D sin-cos position embeddings; reference mae.py)
# ---------------------------------------------------------------------------


def test_mae_vit_matches_hf_transformers():
    """VisionTransformer (mae preset knobs) vs the official ViTMAEModel at
    mask_ratio=0 with identity shuffle noise. Proves our runtime sin-cos
    position-table rebuild (sincos_pos_embed_2d) matches HF's
    get_2d_sincos_pos_embed bit-for-bit semantics (reference mae.py:61-76
    rebuilds the table the same way at the runtime grid)."""
    from transformers import ViTMAEConfig, ViTMAEModel

    from ovmono3d_tpu.models.vit import VisionTransformer
    from ovmono3d_tpu.utils.checkpoint_convert import (
        convert_mae_vit,
        merge_into_params,
    )

    _seed_all(13)
    cfg = ViTMAEConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=48, patch_size=16,
        mask_ratio=0.0, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12,
    )
    hf = ViTMAEModel(cfg).eval()
    with torch.no_grad():
        for name, prm in hf.named_parameters():
            # position_embeddings is the fixed sin-cos table our model
            # rebuilds in-graph — it must stay exact.
            if "position_embeddings" not in name:
                prm.add_(torch.randn_like(prm) * 0.05)

    rng = np.random.RandomState(14)
    image = rng.rand(2, 48, 48, 3).astype(np.float32)
    # Identity shuffle: ascending noise keeps all 9 tokens in order.
    noise = (torch.arange(9, dtype=torch.float32)[None].repeat(2, 1)) / 9.0
    with torch.no_grad():
        out = hf(
            torch.from_numpy(image.transpose(0, 3, 1, 2)).contiguous(),
            noise=noise, output_hidden_states=True,
        )
    want = out.hidden_states[-1].numpy()  # pre final layernorm

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    model = VisionTransformer(
        patch_size=16, embed_dim=32, depth=2, num_heads=4, pretrain_grid=3,
        layerscale=False, pos_sincos=True, norm_eps=1e-12,
        use_depth_fusion=False, dtype=jnp.float32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(image))
    params = merge_into_params(
        params, convert_mae_vit(sd, prefix=""), ("params",)
    )
    got = model.apply(params, jnp.asarray(image))
    np.testing.assert_allclose(
        np.asarray(got["last_feat"]).reshape(2, 9, 32), want[:, 1:],
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["cls"]), want[:, 0], atol=2e-5, rtol=1e-4
    )


# ---------------------------------------------------------------------------
# MiDaS trunk (plain ViT, learned pos embeds; reference midas_final.py)
# ---------------------------------------------------------------------------


def test_midas_trunk_matches_hf_vit():
    """VisionTransformer (midas preset knobs: plain ViT, learned pos table,
    eps 1e-6) vs the official transformers ViTModel — the same architecture
    as the timm vit_large_patch16_384 inside the MiDaS DPT_Large checkpoint
    the reference loads (midas_final.py:23-24), shrunk. Exercises
    convert_midas_vit via the hub/timm fused-qkv key format."""
    from transformers import ViTConfig, ViTModel

    from ovmono3d_tpu.models.vit import VisionTransformer
    from ovmono3d_tpu.utils.checkpoint_convert import (
        convert_midas_vit,
        merge_into_params,
    )

    _seed_all(15)
    cfg = ViTConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=48, patch_size=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-6,
    )
    hf = ViTModel(cfg, add_pooling_layer=False).eval()
    with torch.no_grad():
        for prm in hf.parameters():
            prm.add_(torch.randn_like(prm) * 0.05)

    rng = np.random.RandomState(16)
    image = rng.rand(2, 48, 48, 3).astype(np.float32)
    with torch.no_grad():
        out = hf(
            torch.from_numpy(image.transpose(0, 3, 1, 2)).contiguous(),
            output_hidden_states=True,
        )
    want = out.hidden_states[-1].numpy()  # pre final layernorm

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    hub = {
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "patch_embed.proj.weight":
            sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            sd["embeddings.patch_embeddings.projection.bias"],
    }
    for i in range(2):
        h = f"encoder.layer.{i}."
        o = f"blocks.{i}."
        hub[o + "attn.qkv.weight"] = np.concatenate([
            sd[h + "attention.attention.query.weight"],
            sd[h + "attention.attention.key.weight"],
            sd[h + "attention.attention.value.weight"]], 0)
        hub[o + "attn.qkv.bias"] = np.concatenate([
            sd[h + "attention.attention.query.bias"],
            sd[h + "attention.attention.key.bias"],
            sd[h + "attention.attention.value.bias"]], 0)
        for src, dst in (
            ("layernorm_before.weight", "norm1.weight"),
            ("layernorm_before.bias", "norm1.bias"),
            ("attention.output.dense.weight", "attn.proj.weight"),
            ("attention.output.dense.bias", "attn.proj.bias"),
            ("layernorm_after.weight", "norm2.weight"),
            ("layernorm_after.bias", "norm2.bias"),
            ("intermediate.dense.weight", "mlp.fc1.weight"),
            ("intermediate.dense.bias", "mlp.fc1.bias"),
            ("output.dense.weight", "mlp.fc2.weight"),
            ("output.dense.bias", "mlp.fc2.bias"),
        ):
            hub[o + dst] = sd[h + src]

    model = VisionTransformer(
        patch_size=16, embed_dim=32, depth=2, num_heads=4, pretrain_grid=3,
        layerscale=False, norm_eps=1e-6, pos_interp_offset=0.0,
        use_depth_fusion=False, dtype=jnp.float32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(image))
    params = merge_into_params(
        params, convert_midas_vit(hub, prefix=""), ("params",)
    )
    got = model.apply(params, jnp.asarray(image))
    np.testing.assert_allclose(
        np.asarray(got["last_feat"]).reshape(2, 9, 32), want[:, 1:],
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["cls"]), want[:, 0], atol=2e-5, rtol=1e-4
    )

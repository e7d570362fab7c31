"""GDINO converter structural test: a synthetic torch-layout state dict for
the tiny architecture must merge shape-clean into the Flax params and keep
the model runnable."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ovmono3d_tpu.models.gdino.model import GroundingDINO
from ovmono3d_tpu.utils.checkpoint_convert import merge_into_params
from ovmono3d_tpu.utils.gdino_convert import convert_groundingdino

# Tiny architecture (matches test_gdino end-to-end config).
HID, HEADS, ENC, DEC, Q = 32, 2, 1, 1, 20
SWIN_E, SWIN_D, SWIN_H, WIN = 8, (1, 1, 1, 1), (1, 2, 4, 8), 4
BERT_L, BERT_H, VOCAB = 1, 768, 30522
TEXT = 32


def _lin(rng, din, dout):
    return {
        ".weight": rng.randn(dout, din).astype(np.float32) * 0.02,
        ".bias": rng.randn(dout).astype(np.float32) * 0.02,
    }


def _emit(state, prefix, d):
    for suffix, v in d.items():
        state[prefix + suffix] = v


def _synthetic_state(rng):
    s = {}

    def lin(prefix, din, dout):
        _emit(s, prefix, _lin(rng, din, dout))

    def ln(prefix, d):
        s[prefix + ".weight"] = np.ones(d, np.float32)
        s[prefix + ".bias"] = np.zeros(d, np.float32)

    def mha(prefix, d):
        s[prefix + ".in_proj_weight"] = rng.randn(3 * d, d).astype(
            np.float32
        ) * 0.02
        s[prefix + ".in_proj_bias"] = np.zeros(3 * d, np.float32)
        lin(prefix + ".out_proj", d, d)

    # --- swin ---
    s["backbone.0.patch_embed.proj.weight"] = rng.randn(
        SWIN_E, 3, 4, 4
    ).astype(np.float32) * 0.02
    s["backbone.0.patch_embed.proj.bias"] = np.zeros(SWIN_E, np.float32)
    ln("backbone.0.patch_embed.norm", SWIN_E)
    dim = SWIN_E
    for si, depth in enumerate(SWIN_D):
        for bi in range(depth):
            p = f"backbone.0.layers.{si}.blocks.{bi}."
            ln(p + "norm1", dim)
            lin(p + "attn.qkv", dim, 3 * dim)
            lin(p + "attn.proj", dim, dim)
            s[p + "attn.relative_position_bias_table"] = rng.randn(
                (2 * WIN - 1) ** 2, SWIN_H[si]
            ).astype(np.float32) * 0.02
            ln(p + "norm2", dim)
            lin(p + "mlp.fc1", dim, 4 * dim)
            lin(p + "mlp.fc2", 4 * dim, dim)
        if si < 3:
            p = f"backbone.0.layers.{si}.downsample."
            ln(p + "norm", 4 * dim)
            s[p + "reduction.weight"] = rng.randn(
                2 * dim, 4 * dim
            ).astype(np.float32) * 0.02
            dim *= 2
    dims = [SWIN_E * 2**i for i in range(4)]
    for si in (1, 2, 3):
        ln(f"backbone.0.norm{si}", dims[si])

    # --- bert ---
    s["bert.embeddings.word_embeddings.weight"] = rng.randn(
        VOCAB, BERT_H
    ).astype(np.float32) * 0.02
    s["bert.embeddings.position_embeddings.weight"] = rng.randn(
        512, BERT_H
    ).astype(np.float32) * 0.02
    s["bert.embeddings.token_type_embeddings.weight"] = rng.randn(
        2, BERT_H
    ).astype(np.float32) * 0.02
    ln("bert.embeddings.LayerNorm", BERT_H)
    for i in range(BERT_L):
        p = f"bert.encoder.layer.{i}."
        lin(p + "attention.self.query", BERT_H, BERT_H)
        lin(p + "attention.self.key", BERT_H, BERT_H)
        lin(p + "attention.self.value", BERT_H, BERT_H)
        lin(p + "attention.output.dense", BERT_H, BERT_H)
        ln(p + "attention.output.LayerNorm", BERT_H)
        lin(p + "intermediate.dense", BERT_H, 3072)
        lin(p + "output.dense", 3072, BERT_H)
        ln(p + "output.LayerNorm", BERT_H)

    # --- projections, transformer ---
    lin("feat_map", BERT_H, HID)
    for i, din in enumerate(dims[1:]):
        s[f"input_proj.{i}.0.weight"] = rng.randn(HID, din, 1, 1).astype(
            np.float32
        ) * 0.02
        s[f"input_proj.{i}.0.bias"] = np.zeros(HID, np.float32)
        ln(f"input_proj.{i}.1", HID)
    s["input_proj.3.0.weight"] = rng.randn(HID, dims[3], 3, 3).astype(
        np.float32
    ) * 0.02
    s["input_proj.3.0.bias"] = np.zeros(HID, np.float32)
    ln("input_proj.3.1", HID)

    s["transformer.level_embed"] = rng.randn(4, HID).astype(np.float32)
    s["transformer.tgt_embed.weight"] = rng.randn(Q, HID).astype(np.float32)
    lin("transformer.enc_output", HID, HID)
    ln("transformer.enc_output_norm", HID)
    ln("transformer.decoder.norm", HID)

    FFN = 64
    for i in range(ENC):
        p = f"transformer.encoder.layers.{i}."
        lin(p + "self_attn.sampling_offsets", HID, HEADS * 4 * 2 * 2)
        lin(p + "self_attn.attention_weights", HID, HEADS * 4 * 2)
        lin(p + "self_attn.value_proj", HID, HID)
        lin(p + "self_attn.output_proj", HID, HID)
        lin(p + "linear1", HID, FFN)
        lin(p + "linear2", FFN, HID)
        ln(p + "norm1", HID)
        ln(p + "norm2", HID)
        p = f"transformer.encoder.text_layers.{i}."
        mha(p + "self_attn", HID)
        lin(p + "linear1", HID, 1024)
        lin(p + "linear2", 1024, HID)
        ln(p + "norm1", HID)
        ln(p + "norm2", HID)
        p = f"transformer.encoder.fusion_layers.{i}."
        ln(p + "layer_norm_v", HID)
        ln(p + "layer_norm_l", HID)
        for name in ("v_proj", "l_proj", "values_v_proj", "values_l_proj"):
            lin(p + "attn." + name, HID, 1024)
        lin(p + "attn.out_v_proj", 1024, HID)
        lin(p + "attn.out_l_proj", 1024, HID)
        s[p + "gamma_v"] = np.full(HID, 1 / 6, np.float32)
        s[p + "gamma_l"] = np.full(HID, 1 / 6, np.float32)
    for i in range(DEC):
        p = f"transformer.decoder.layers.{i}."
        lin(p + "cross_attn.sampling_offsets", HID, HEADS * 4 * 2 * 2)
        lin(p + "cross_attn.attention_weights", HID, HEADS * 4 * 2)
        lin(p + "cross_attn.value_proj", HID, HID)
        lin(p + "cross_attn.output_proj", HID, HID)
        mha(p + "self_attn", HID)
        mha(p + "ca_text", HID)
        lin(p + "linear1", HID, FFN)
        lin(p + "linear2", FFN, HID)
        for nm in ("norm1", "norm2", "norm3", "catext_norm"):
            ln(p + nm, HID)
    for j in range(3):
        lin(f"bbox_embed.0.layers.{j}", HID, 4 if j == 2 else HID)
        lin(f"transformer.enc_out_bbox_embed.layers.{j}", HID,
            4 if j == 2 else HID)
    lin("transformer.decoder.ref_point_head.layers.0", HID * 2, HID)
    lin("transformer.decoder.ref_point_head.layers.1", HID, HID)
    return s


def test_convert_merges_shape_clean_and_runs():
    rng = np.random.RandomState(0)
    model = GroundingDINO(
        hidden_dim=HID, nheads=HEADS, enc_layers=ENC, dec_layers=DEC,
        num_queries=Q, enc_points=2, dec_points=2, max_text_len=TEXT,
        ffn_dim=64, swin_embed_dim=SWIN_E, swin_depths=SWIN_D,
        swin_heads=SWIN_H, swin_window=WIN, bert_layers=BERT_L,
    )
    img = jnp.zeros((1, 64, 64, 3))
    ids = jnp.zeros((1, TEXT), jnp.int32)
    mask = jnp.ones((1, TEXT), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, ids, mask)

    converted = convert_groundingdino(_synthetic_state(rng))
    merged = merge_into_params(params, converted, ("params",))

    out = jax.jit(model.apply)(merged, img, ids, mask)
    assert out["pred_boxes"].shape == (1, Q, 4)
    assert np.all(np.isfinite(np.asarray(out["pred_boxes"])))
    # Converted weights actually land (different output from random init).
    out0 = jax.jit(model.apply)(params, img, ids, mask)
    assert not np.allclose(
        np.asarray(out["pred_logits"]), np.asarray(out0["pred_logits"])
    )

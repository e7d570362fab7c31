"""GroundingDINO model: Swin-B + BERT + cross-modality DETR (Flax).

Assembly mirroring `groundingdino.models.GroundingDINO` with the reference's
SwinB config (configs/GroundingDINO_SwinB_cfg.py): 4 feature levels (Swin
stages 1-3 projected to 256 + one stride-2 extra level), 6 enhancer layers
(fusion + text enhancer + image deformable), standard two-stage query
selection (top-900 encoder tokens by max text logit), 6 decoder layers with
text cross-attention, contrastive (dot-product) classification against the
projected text features, and iterative sigmoid-space box refinement.

Outputs raw `pred_logits` [B, Q, max_text_len] and `pred_boxes` [B, Q, 4]
(cxcywh, normalized) — the same contract the reference's inference glue
consumes (roi_heads_gdino.py:186-190).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ovmono3d_tpu.models.gdino.bert import BertEncoder
from ovmono3d_tpu.models.gdino.swin import SwinTransformer
from ovmono3d_tpu.models.gdino.transformer import (
    BiAttentionBlock,
    BoxMLP,
    DecoderLayer,
    DeformableLayer,
    TextEnhancerLayer,
    coordinate_sine_embedding,
    inverse_sigmoid,
    make_reference_points,
    sine_position_embedding,
)

Dtype = Any


class GroundingDINO(nn.Module):
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    num_queries: int = 900
    num_levels: int = 4
    enc_points: int = 4
    dec_points: int = 4
    max_text_len: int = 256
    ffn_dim: int = 2048
    swin_embed_dim: int = 128
    swin_depths: tuple = (2, 2, 18, 2)
    swin_heads: tuple = (4, 8, 16, 32)
    swin_window: int = 12
    bert_layers: int = 12
    bert_hidden: int = 768
    bert_heads: int = 12
    bert_intermediate: int = 3072
    bert_vocab: int = 30522
    bert_max_position: int = 512
    # Heavy enhancer/decoder matmuls run bf16 (f32 layernorms/heads).
    compute_dtype: Dtype = jnp.bfloat16
    dtype: Dtype = jnp.float32
    # Ablation/bench only: skip named sub-blocks (encoder: "fusion",
    # "text", "image"; decoder: "dec:self", "dec:text_cross", "dec:deform")
    # and/or restrict encoder/decoder deformable sampling levels.
    debug_skip: tuple = ()
    sample_levels: tuple | None = None
    dec_sample_levels: tuple | None = None

    def setup(self):
        self.backbone = SwinTransformer(
            embed_dim=self.swin_embed_dim,
            depths=self.swin_depths,
            num_heads=self.swin_heads,
            window=self.swin_window,
            dtype=self.compute_dtype,
            name="backbone",
        )
        self.bert = BertEncoder(
            layers=self.bert_layers, hidden=self.bert_hidden,
            heads=self.bert_heads, intermediate=self.bert_intermediate,
            vocab_size=self.bert_vocab,
            max_position=self.bert_max_position, name="bert",
        )
        self.feat_map = nn.Dense(self.hidden_dim, name="feat_map")
        # input projections: 3 swin stages + 1 extra stride-2 conv
        self.input_proj = [
            nn.Conv(self.hidden_dim, (1, 1), name=f"input_proj{i}")
            for i in range(3)
        ]
        self.input_proj_norms = [
            nn.GroupNorm(num_groups=32, epsilon=1e-5,
                         name=f"input_proj_norm{i}")
            for i in range(3)
        ]
        self.extra_proj = nn.Conv(
            self.hidden_dim, (3, 3), strides=(2, 2), padding=1,
            name="extra_proj",
        )
        self.extra_norm = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                       name="extra_norm")

        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_levels, self.hidden_dim), jnp.float32,
        )
        self.fusion_layers = [
            BiAttentionBlock(self.hidden_dim, dtype=self.compute_dtype,
                             name=f"fusion{i}")
            for i in range(self.enc_layers)
        ]
        self.text_layers = [
            TextEnhancerLayer(self.hidden_dim, dtype=self.compute_dtype,
                              name=f"text_enh{i}")
            for i in range(self.enc_layers)
        ]
        self.image_layers = [
            DeformableLayer(
                self.hidden_dim, self.nheads, self.enc_points,
                self.num_levels, self.ffn_dim, dtype=self.compute_dtype,
                sample_levels=self.sample_levels,
                name=f"img_enc{i}",
            )
            for i in range(self.enc_layers)
        ]
        self.enc_output = nn.Dense(self.hidden_dim, name="enc_output")
        self.enc_output_norm = nn.LayerNorm(epsilon=1e-5, name="enc_output_norm")
        self.enc_bbox_head = BoxMLP(self.hidden_dim, name="enc_bbox_head")
        self.tgt_embed = self.param(
            "tgt_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim), jnp.float32,
        )
        self.ref_point_head = BoxMLP(
            self.hidden_dim, out=self.hidden_dim, layers=2,
            name="ref_point_head",
        )
        self.decoder_layers = [
            DecoderLayer(
                self.hidden_dim, self.nheads, self.dec_points,
                self.num_levels, self.ffn_dim, dtype=self.compute_dtype,
                debug_skip=tuple(
                    s[4:] for s in self.debug_skip if s.startswith("dec:")
                ),
                sample_levels=self.dec_sample_levels,
                name=f"dec{i}",
            )
            for i in range(self.dec_layers)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        self.bbox_head = BoxMLP(self.hidden_dim, name="bbox_head")

    def encode_text(self, input_ids, text_mask, self_attn_mask=None,
                    position_ids=None):
        """input_ids [B, T]; text_mask [B, T] valid; optional [B, T, T]
        sub-sentence mask + per-span position ids. Returns projected text
        features [B, T, C]."""
        mask = self_attn_mask if self_attn_mask is not None else text_mask
        feat = self.bert(input_ids, mask, position_ids)
        return self.feat_map(feat)

    def __call__(self, images, input_ids, text_mask, text_self_mask=None,
                 text_position_ids=None, swin_rel_biases=None):
        """images [B, H, W, 3] normalized; H, W multiples of 32.

        swin_rel_biases: optional precomputed Swin rel-pos biases
        (swin.expand_rel_pos_biases(params['params']['backbone'])) — a
        bit-identical frozen-trunk fast path that hoists the per-block
        bias-table gathers out of the forward.

        Returns dict(pred_logits [B, Q, max_text_len] raw, pred_boxes
        [B, Q, 4] cxcywh in [0,1]).
        """
        B = images.shape[0]
        txt = self.encode_text(input_ids, text_mask, text_self_mask,
                               text_position_ids)
        T = txt.shape[1]

        feats = self.backbone(images, swin_rel_biases)
        srcs = []
        shapes = []
        for i, key in enumerate(("s1", "s2", "s3")):
            f = self.input_proj_norms[i](self.input_proj[i](feats[key]))
            srcs.append(f)
            shapes.append((f.shape[1], f.shape[2]))
        extra = self.extra_norm(self.extra_proj(feats["s3"]))
        srcs.append(extra)
        shapes.append((extra.shape[1], extra.shape[2]))

        tokens = [s.reshape(B, -1, self.hidden_dim) for s in srcs]
        src = jnp.concatenate(tokens, axis=1)  # [B, S, C]
        pos = sine_position_embedding(shapes, self.hidden_dim)
        lvl = jnp.concatenate(
            [
                jnp.broadcast_to(
                    self.level_embed[i], (h * w, self.hidden_dim)
                )
                for i, (h, w) in enumerate(shapes)
            ]
        )
        pos = pos + lvl
        refs = make_reference_points(shapes)

        # --- feature enhancer ---
        # Text enhancer q/k get sine embeddings of the per-span position
        # ids, and its self-attention uses the sub-sentence block mask
        # (transformer.py TransformerEncoder: pos_text via
        # get_sine_pos_embed(position_ids), mask=text_self_attention_masks).
        pos_src = (
            text_position_ids if text_position_ids is not None
            else jnp.arange(T)[None]
        )
        text_pos = coordinate_sine_embedding(
            pos_src[..., None].astype(jnp.float32), 2 * self.hidden_dim
        )
        enh_mask = text_self_mask if text_self_mask is not None else text_mask
        img, text = src, txt
        for i in range(self.enc_layers):
            if "fusion" not in self.debug_skip:
                img, text = self.fusion_layers[i](img, text, text_mask)
            if "text" not in self.debug_skip:
                text = self.text_layers[i](text, enh_mask, text_pos)
            if "image" not in self.debug_skip:
                img = self.image_layers[i](img, pos, refs, shapes)

        memory = img
        # --- two-stage query selection ---
        # proposals from per-token reference points + enc bbox deltas
        base = refs[:, 0, :]  # [S, 2]
        wh = jnp.concatenate(
            [
                jnp.full((h * w, 2), 0.05 * 2.0**i)
                for i, (h, w) in enumerate(shapes)
            ]
        )
        prop = jnp.concatenate([base, wh], axis=-1)  # [S, 4] sigmoid space
        # gen_encoder_output_proposals: proposals with any coordinate
        # outside (0.01, 0.99) are invalid — their memory is zeroed before
        # the enc_output projection and their box logits forced to +inf
        # (sigmoid -> 1).
        prop_valid = jnp.all((prop > 0.01) & (prop < 0.99), axis=-1)  # [S]
        mem_masked = jnp.where(prop_valid[None, :, None], memory, 0.0)
        out_mem = self.enc_output_norm(self.enc_output(mem_masked))
        txt_masked = jnp.where(text_mask[..., None], text, 0.0)
        # HIGHEST: the default f32 matmul runs bf16 passes on TPU;
        # ~0.4% logit error reorders the top-900 query selection near ties
        # (inference.py pins the downstream span matmul for the same
        # reason). [S,C]x[C,T] is tiny — exactness is free.
        enc_logits = jnp.einsum(
            "bsc,btc->bst", out_mem, txt_masked,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        enc_logits = jnp.where(
            text_mask[:, None, :], enc_logits, -1e9
        )
        enc_scores = jnp.max(enc_logits, axis=-1)  # [B, S]
        delta = self.enc_bbox_head(out_mem)
        prop_logits = jnp.where(
            prop_valid[:, None], inverse_sigmoid(prop), jnp.inf
        )
        prop_logits = jnp.broadcast_to(prop_logits, (B,) + prop.shape)
        boxes_all = jax.nn.sigmoid(prop_logits + delta)

        k = self.num_queries
        top_scores, top_idx = jax.lax.top_k(enc_scores, k)  # [B, Q]
        ref_boxes = jnp.take_along_axis(
            boxes_all, top_idx[..., None], axis=1
        )  # [B, Q, 4]
        tgt = jnp.broadcast_to(
            self.tgt_embed[None], (B, k, self.hidden_dim)
        )

        # --- decoder ---
        ref = jax.lax.stop_gradient(ref_boxes)
        ref_in = ref
        for i, layer in enumerate(self.decoder_layers):
            # Each of the 4 box coords gets hidden/2 sine features -> the
            # ref_point_head MLP consumes 2*hidden (DINO get_sine_pos_embed,
            # exchange_xy: [pos(cy), pos(cx), pos(w), pos(h)]).
            q_sine = coordinate_sine_embedding(
                ref, self.hidden_dim, exchange_xy=True
            )
            query_pos = self.ref_point_head(q_sine)
            tgt = layer(
                tgt, query_pos, memory, pos, text, text_mask, ref, shapes
            )
            # In-loop refinement consumes the RAW layer output; decoder_norm
            # is applied only to the emitted intermediates (TransformerDecoder
            # forward: delta_unsig = bbox_embed(output);
            # intermediate.append(norm(output))).
            ref_in = ref
            delta = self.bbox_head(tgt)
            ref = jax.lax.stop_gradient(
                jax.nn.sigmoid(inverse_sigmoid(ref) + delta)
            )

        hs = self.decoder_norm(tgt)
        # Final boxes are recomputed from the NORMED last hidden state plus
        # the reference that ENTERED the last layer (GroundingDINO.forward:
        # zip(reference[:-1], bbox_embed, hs) over normed intermediates).
        out_boxes = jax.nn.sigmoid(
            self.bbox_head(hs) + inverse_sigmoid(ref_in)
        )
        # HIGHEST like the encoder logits above: these scores feed the
        # 0.001 box_threshold through sigmoid+span-sum — bf16-pass noise
        # flips borderline detections vs the reference.
        logits = jnp.einsum(
            "bqc,btc->bqt", hs, jnp.where(text_mask[..., None], text, 0.0),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        logits = jnp.where(text_mask[:, None, :], logits, -1e9)
        # pad/trim text axis to max_text_len
        pad = self.max_text_len - logits.shape[-1]
        if pad > 0:
            logits = jnp.pad(
                logits, ((0, 0), (0, 0), (0, pad)), constant_values=-1e9
            )
        elif pad < 0:
            logits = logits[..., : self.max_text_len]
        return {"pred_logits": logits, "pred_boxes": out_boxes}

"""GroundingDINO cross-modality transformer (Flax).

Feature enhancer (image deformable self-attn + text self-attn +
bi-directional image<->text fusion), language-guided query selection, and the
cross-modality decoder — the architecture behind
`groundingdino.models.build_model` (configs/GroundingDINO_SwinB_cfg.py:
enc_layers=6, dec_layers=6, hidden_dim=256, nheads=8, num_queries=900,
num_feature_levels=4, enc/dec_n_points=4, two_stage_type='standard',
use_text_enhancer/use_fusion_layer/use_text_cross_attention=True).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.models.gdino.deformable import (
    deformable_attention_core,
    make_reference_points,
)

Dtype = Any


def sine_position_embedding(
    spatial_shapes: Sequence[tuple[int, int]],
    dim: int = 256,
    temperature: float = 20.0,
) -> jax.Array:
    """Per-token 2D sine embeddings for all levels, concat-flattened [S, dim]
    (position_embedding='sine', pe_temperature{H,W}=20).

    Built from jnp iotas, NOT a baked numpy literal: as a literal this is a
    ~13.6 MB f32 HLO constant at 800^2 shapes, which alone overflows the
    axon relay's remote-compile upload limit; as ops it folds to the same
    constant during compilation on the server side."""
    outs = []
    for h, w in spatial_shapes:
        # DETR PositionEmbeddingSine with normalize=True over a full-valid
        # mask: per-axis cumsum gives (i + 1), normalized by the last value
        # (+1e-6), times 2*pi.
        ys = jnp.arange(h, dtype=jnp.float32) + 1.0
        xs = jnp.arange(w, dtype=jnp.float32) + 1.0
        ys = ys / (h + 1e-6) * 2 * jnp.pi
        xs = xs / (w + 1e-6) * 2 * jnp.pi
        half = dim // 2
        dim_t = temperature ** (
            2 * (jnp.arange(half, dtype=jnp.float32) // 2) / half
        )
        pos_x = xs[:, None] / dim_t[None]
        pos_y = ys[:, None] / dim_t[None]
        pos_x = jnp.stack(
            [jnp.sin(pos_x[:, 0::2]), jnp.cos(pos_x[:, 1::2])], axis=2
        ).reshape(w, -1)
        pos_y = jnp.stack(
            [jnp.sin(pos_y[:, 0::2]), jnp.cos(pos_y[:, 1::2])], axis=2
        ).reshape(h, -1)
        grid = jnp.concatenate(
            [
                jnp.broadcast_to(pos_y[:, None, :], (h, w, half)),
                jnp.broadcast_to(pos_x[None, :, :], (h, w, half)),
            ],
            axis=-1,
        )
        outs.append(grid.reshape(h * w, dim))
    return jnp.concatenate(outs, axis=0)


def coordinate_sine_embedding(coords: jax.Array, dim: int = 256,
                              temperature: float = 10000.0,
                              exchange_xy: bool = False) -> jax.Array:
    """DINO get_sine_pos_embed of box coords: [..., n] -> [..., n*dim/2]
    (dim/2 features per coordinate, sin/cos interleaved).

    `exchange_xy=True` swaps the first two coordinates' feature blocks to
    [pos(y), pos(x), ...] — the original get_sine_pos_embed default, used
    for the decoder query position head (GroundingDINO utils.py
    get_sine_pos_embed exchange_xy=True)."""
    half = dim // 2
    dim_t = temperature ** (
        2 * (jnp.arange(half, dtype=jnp.float32) // 2) / half
    )
    x = coords[..., None] * 2 * jnp.pi / dim_t  # [..., n, half]
    emb = jnp.stack(
        [jnp.sin(x[..., 0::2]), jnp.cos(x[..., 1::2])], axis=-1
    ).reshape(*coords.shape[:-1], coords.shape[-1], half)
    if exchange_xy and coords.shape[-1] >= 2:
        emb = jnp.concatenate(
            [emb[..., 1:2, :], emb[..., 0:1, :], emb[..., 2:, :]], axis=-2
        )
    return emb.reshape(*coords.shape[:-1], coords.shape[-1] * half)


def inverse_sigmoid(x, eps=1e-3):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class MHA(nn.Module):
    """Standard multi-head attention with optional additive bias."""

    dim: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, bias=None):
        B, Nq, C = q.shape
        hd = self.dim // self.heads
        qh = nn.Dense(self.dim, dtype=self.dtype, name="q")(q)
        kh = nn.Dense(self.dim, dtype=self.dtype, name="k")(k)
        vh = nn.Dense(self.dim, dtype=self.dtype, name="v")(v)
        qh = qh.reshape(B, Nq, self.heads, hd)
        kh = kh.reshape(B, -1, self.heads, hd)
        vh = vh.reshape(B, -1, self.heads, hd)
        attn = jnp.einsum(
            "bnhd,bmhd->bhnm", qh, kh, preferred_element_type=jnp.float32
        ) / (hd**0.5)
        if bias is not None:
            attn = attn + bias
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "bhnm,bmhd->bnhd", attn.astype(vh.dtype), vh,
            preferred_element_type=jnp.float32,
        ).reshape(B, Nq, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(
            out.astype(self.dtype)
        )


class BiAttentionBlock(nn.Module):
    """GLIP-style bi-directional image<->text fusion with layer scale."""

    dim: int = 256
    fusion_dim: int = 1024
    heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img, txt, txt_mask):
        """img: [B, S, C]; txt: [B, T, C]; txt_mask: [B, T] bool."""
        vi = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_v")(img)
        li = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_l")(txt)
        hd = self.fusion_dim // self.heads
        B, S, _ = vi.shape
        T = li.shape[1]
        qv = nn.Dense(self.fusion_dim, dtype=self.dtype, name="v_proj")(vi)
        ql = nn.Dense(self.fusion_dim, dtype=self.dtype, name="l_proj")(li)
        vv = nn.Dense(self.fusion_dim, dtype=self.dtype, name="values_v")(vi)
        vl = nn.Dense(self.fusion_dim, dtype=self.dtype, name="values_l")(li)
        qv = qv.reshape(B, S, self.heads, hd)
        ql = ql.reshape(B, T, self.heads, hd)
        vv = vv.reshape(B, S, self.heads, hd)
        vl = vl.reshape(B, T, self.heads, hd)

        attn = jnp.einsum(
            "bshd,bthd->bhst", qv, ql, preferred_element_type=jnp.float32
        ) / (hd**0.5)
        attn = jnp.where(txt_mask[:, None, None, :], attn, -1e9)
        # image -> text attention (softmax over text) and text -> image
        # (softmax over image tokens of the transpose).
        a_v = jax.nn.softmax(attn, axis=-1)
        a_l = jax.nn.softmax(attn, axis=-2)
        dv = jnp.einsum(
            "bhst,bthd->bshd", a_v.astype(vl.dtype), vl,
            preferred_element_type=jnp.float32,
        ).reshape(B, S, self.fusion_dim)
        dl = jnp.einsum(
            "bhst,bshd->bthd", a_l.astype(vv.dtype), vv,
            preferred_element_type=jnp.float32,
        ).reshape(B, T, self.fusion_dim)
        dv = nn.Dense(self.dim, dtype=self.dtype, name="out_v")(
            dv.astype(self.dtype)
        )
        dl = nn.Dense(self.dim, dtype=self.dtype, name="out_l")(
            dl.astype(self.dtype)
        )
        gamma_v = self.param(
            "gamma_v", nn.initializers.constant(1e-4), (self.dim,),
            jnp.float32,
        )
        gamma_l = self.param(
            "gamma_l", nn.initializers.constant(1e-4), (self.dim,),
            jnp.float32,
        )
        # The residual adds onto the LAYER-NORMED stream, not the raw input
        # (fuse_modules.py BiAttentionBlock: v = layer_norm_v(v);
        # v = v + drop_path(gamma_v * delta_v)).
        return vi + dv * gamma_v, li + dl * gamma_l


class DeformableLayer(nn.Module):
    """Encoder image layer: deformable self-attn + FFN."""

    dim: int = 256
    heads: int = 8
    points: int = 4
    levels: int = 4
    ffn: int = 2048
    dtype: Dtype = jnp.float32
    # Ablation/bench only: restrict deformable sampling to these level
    # indices (None = all). Skipped levels' gathers are DCE'd by XLA.
    sample_levels: tuple[int, ...] | None = None

    @nn.compact
    def __call__(self, x, pos, ref_points, spatial_shapes):
        """x: [B, S, C]; pos: [S, C]; ref_points: [S, L, 2]."""
        B, S, C = x.shape
        q = x + pos[None]
        value = nn.Dense(self.dim, dtype=self.dtype, name="value_proj")(x)
        value = value.reshape(B, S, self.heads, C // self.heads)
        off = nn.Dense(
            self.heads * self.levels * self.points * 2,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="sampling_offsets",
        )(q).reshape(B, S, self.heads, self.levels, self.points, 2)
        attw = nn.Dense(
            self.heads * self.levels * self.points,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(q).reshape(B, S, self.heads, self.levels * self.points)
        attw = jax.nn.softmax(attw, axis=-1).reshape(
            B, S, self.heads, self.levels, self.points
        )
        # offsets normalized per level size
        norm = jnp.asarray(
            [[w, h] for h, w in spatial_shapes], jnp.float32
        )  # [L, 2]
        loc = ref_points[None, :, None, :, None, :] + off / norm[
            None, None, None, :, None, :
        ]
        sampled = deformable_attention_core(
            value, list(spatial_shapes), loc, attw,
            levels=self.sample_levels,
        )
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="output_proj")(
            sampled
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        h = nn.Dense(self.ffn, dtype=self.dtype, name="ffn1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x + h)


class TextEnhancerLayer(nn.Module):
    dim: int = 256
    heads: int = 4
    ffn: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, txt, txt_mask, pos=None):
        """txt: [B, T, C]; txt_mask: [B, T] padding mask OR [B, T, T]
        sub-sentence pairwise mask (the original feeds the per-phrase block
        mask, transformer.py TransformerEncoder text_layers); pos: [B, T, C]
        sine embeddings of the per-span position ids, added to q/k only
        (TransformerEncoderLayer with_pos_embed)."""
        if txt_mask.ndim == 3:
            bias = jnp.where(txt_mask, 0.0, -1e9)[:, None]
        else:
            bias = jnp.where(txt_mask, 0.0, -1e9)[:, None, None, :]
        q = txt if pos is None else txt + pos
        h = MHA(self.dim, self.heads, self.dtype, name="self_attn")(
            q, q, txt, bias
        )
        txt = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(txt + h)
        h = nn.Dense(self.ffn, dtype=self.dtype, name="ffn1")(txt)
        h = nn.relu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(txt + h)


class DecoderLayer(nn.Module):
    dim: int = 256
    heads: int = 8
    points: int = 4
    levels: int = 4
    ffn: int = 2048
    dtype: Dtype = jnp.float32
    # Ablation/bench only: skip named sub-blocks ("self", "text_cross",
    # "deform") and/or restrict deformable sampling levels.
    debug_skip: tuple = ()
    sample_levels: tuple | None = None

    @nn.compact
    def __call__(self, tgt, query_pos, memory, memory_pos, txt, txt_mask,
                 ref_points, spatial_shapes):
        """tgt: [B, Q, C]; ref_points: [B, Q, 4] (cxcywh, sigmoid space)."""
        B, Q, C = tgt.shape
        # self attention
        if "self" not in self.debug_skip:
            q = tgt + query_pos
            h = MHA(self.dim, self.heads, self.dtype,
                    name="self_attn")(q, q, tgt)
            tgt = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(tgt + h)
        # text cross attention
        if "text_cross" not in self.debug_skip:
            bias = jnp.where(txt_mask, 0.0, -1e9)[:, None, None, :]
            h = MHA(self.dim, self.heads, self.dtype, name="text_cross")(
                tgt + query_pos, txt, txt, bias
            )
            tgt = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm_text")(tgt + h)
        if "deform" in self.debug_skip:
            h = nn.Dense(self.ffn, dtype=self.dtype, name="ffn1")(tgt)
            h = nn.relu(h)
            h = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(h)
            return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(tgt + h)
        # deformable cross attention to image memory
        value = nn.Dense(self.dim, dtype=self.dtype, name="value_proj")(
            memory
        ).reshape(B, -1, self.heads, C // self.heads)
        qd = tgt + query_pos
        off = nn.Dense(
            self.heads * self.levels * self.points * 2,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="sampling_offsets",
        )(qd).reshape(B, Q, self.heads, self.levels, self.points, 2)
        attw = nn.Dense(
            self.heads * self.levels * self.points,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(qd).reshape(B, Q, self.heads, self.levels * self.points)
        attw = jax.nn.softmax(attw, axis=-1).reshape(
            B, Q, self.heads, self.levels, self.points
        )
        # reference boxes: offsets scaled by box size / points
        center = ref_points[:, :, None, None, None, :2]
        size = ref_points[:, :, None, None, None, 2:]
        loc = center + off / self.points * size * 0.5
        sampled = deformable_attention_core(
            value, list(spatial_shapes), loc, attw,
            levels=self.sample_levels,
        )
        h = nn.Dense(self.dim, dtype=self.dtype, name="output_proj")(sampled)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(tgt + h)
        h = nn.Dense(self.ffn, dtype=self.dtype, name="ffn1")(tgt)
        h = nn.relu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(tgt + h)


class BoxMLP(nn.Module):
    dim: int = 256
    out: int = 4
    layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.dim, dtype=self.dtype,
                                 name=f"l{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype,
                        name=f"l{self.layers - 1}",
                        kernel_init=nn.initializers.zeros)(x)

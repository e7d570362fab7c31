"""BERT-base text encoder (Flax) — GroundingDINO's language trunk.

Re-design of the `bert-base-uncased` encoder used via HF transformers
(configs/GroundingDINO_SwinB_cfg.py: text_encoder_type). Tokenization stays
host-side (transformers AutoTokenizer works without torch); the encoder runs
on device with an arbitrary additive attention mask — GroundingDINO feeds a
sub-sentence mask that isolates each category phrase between '.' separators
(sub_sentence_present=True).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class BertLayer(nn.Module):
    hidden: int = 768
    heads: int = 12
    intermediate: int = 3072
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        B, N, C = x.shape
        hd = self.hidden // self.heads
        q = nn.Dense(self.hidden, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.hidden, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.hidden, dtype=self.dtype, name="v")(x)
        q = q.reshape(B, N, self.heads, hd)
        k = k.reshape(B, N, self.heads, hd)
        v = v.reshape(B, N, self.heads, hd)
        attn = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
        ) / (hd**0.5)
        attn = attn + attn_bias[:, None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "bhnm,bmhd->bnhd", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).reshape(B, N, C)
        out = nn.Dense(self.hidden, dtype=self.dtype, name="attn_out")(
            out.astype(self.dtype)
        )
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="attn_norm")(
            x + out
        )
        h = nn.Dense(self.intermediate, dtype=self.dtype, name="inter")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="out")(h)
        return nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                            name="out_norm")(x + h)


class BertEncoder(nn.Module):
    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_position: int = 512
    type_vocab: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,        # [B, N] int32
        attention_mask: jax.Array,   # [B, N] bool (valid tokens) OR
                                     # [B, N, N] bool pairwise mask
        position_ids: jax.Array | None = None,  # [B, N] (GroundingDINO
                                     # restarts positions per phrase span)
    ) -> jax.Array:
        B, N = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.hidden,
                       dtype=self.dtype, name="word_embeddings")(input_ids)
        pos_ids = (
            position_ids if position_ids is not None
            else jnp.arange(N)[None]
        )
        pos = nn.Embed(self.max_position, self.hidden,
                       dtype=self.dtype, name="position_embeddings")(pos_ids)
        typ = nn.Embed(self.type_vocab, self.hidden, dtype=self.dtype,
                       name="token_type_embeddings")(
            jnp.zeros_like(input_ids)
        )
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                         name="embed_norm")(tok + pos + typ)

        if attention_mask.ndim == 2:
            pair = attention_mask[:, None, :] & attention_mask[:, :, None]
        else:
            pair = attention_mask
        bias = jnp.where(pair, 0.0, -1e9).astype(jnp.float32)

        for i in range(self.layers):
            x = BertLayer(
                self.hidden, self.heads, self.intermediate, self.dtype,
                name=f"layer{i}",
            )(x, bias)
        return x


def build_subsentence_masks(
    input_ids, special_ids=(101, 102, 1012, 1029)
):
    """GroundingDINO's generate_masks_with_special_tokens_and_transfer_map
    (host-side numpy): tokens between special tokens ([CLS], [SEP], '.',
    '?') attend only within their own phrase; every token always attends to
    itself; each phrase span is a dense block whose position_ids restart at
    0 (matching the public implementation bit-for-bit: special tokens at
    column 0 or the last column reset to self-only, every other special
    token closes the block [prev+1, col]; PAD is NOT a delimiter — padding
    rows keep only the identity diagonal).

    Returns (attn_mask [B, N, N] bool, position_ids [B, N] int32).
    """
    import numpy as np

    ids = np.asarray(input_ids)
    B, N = ids.shape
    special = np.isin(ids, np.asarray(special_ids))
    attn = np.zeros((B, N, N), bool)
    attn[:, np.arange(N), np.arange(N)] = True
    pos = np.zeros((B, N), np.int64)
    for b in range(B):
        prev = 0
        for col in np.where(special[b])[0]:
            if col == 0 or col == N - 1:
                attn[b, col, col] = True
                pos[b, col] = 0
            else:
                attn[b, prev + 1 : col + 1, prev + 1 : col + 1] = True
                pos[b, prev + 1 : col + 1] = np.arange(0, col - prev)
            prev = col
    return attn, pos.astype(np.int32)

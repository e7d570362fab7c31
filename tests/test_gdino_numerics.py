"""Numerical cross-validation of GDINO submodules against independent numpy
reference implementations (same spirit as the DINOv2 converter test)."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.models.gdino.bert import BertEncoder
from ovmono3d_tpu.models.gdino.swin import SwinBlock, WindowAttention
from ovmono3d_tpu.utils.checkpoint_convert import merge_into_params
from ovmono3d_tpu.utils.gdino_convert import convert_bert


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _gelu(x):
    return x * 0.5 * (1 + np.vectorize(math.erf)(x / np.sqrt(2)))


def test_bert_layer_matches_numpy():
    rng = np.random.RandomState(0)
    H, L, I = 768, 2, 3072
    state = {}

    def lin(prefix, din, dout):
        state[prefix + ".weight"] = rng.randn(dout, din).astype(
            np.float32) * 0.02
        state[prefix + ".bias"] = rng.randn(dout).astype(np.float32) * 0.02

    def norm(prefix, d):
        state[prefix + ".weight"] = 1 + rng.randn(d).astype(np.float32) * 0.01
        state[prefix + ".bias"] = rng.randn(d).astype(np.float32) * 0.01

    state["bert.embeddings.word_embeddings.weight"] = rng.randn(
        100, H).astype(np.float32) * 0.02
    state["bert.embeddings.position_embeddings.weight"] = rng.randn(
        512, H).astype(np.float32) * 0.02
    state["bert.embeddings.token_type_embeddings.weight"] = rng.randn(
        2, H).astype(np.float32) * 0.02
    norm("bert.embeddings.LayerNorm", H)
    for i in range(L):
        p = f"bert.encoder.layer.{i}."
        lin(p + "attention.self.query", H, H)
        lin(p + "attention.self.key", H, H)
        lin(p + "attention.self.value", H, H)
        lin(p + "attention.output.dense", H, H)
        norm(p + "attention.output.LayerNorm", H)
        lin(p + "intermediate.dense", H, I)
        lin(p + "output.dense", I, H)
        norm(p + "output.LayerNorm", H)

    model = BertEncoder(vocab_size=100, layers=L)
    ids = jnp.asarray(rng.randint(0, 100, (1, 12)), jnp.int32)
    mask = jnp.ones((1, 12), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids, mask)
    params = merge_into_params(
        params, convert_bert(state, layers=L), ("params",)
    )
    got = np.asarray(jax.jit(model.apply)(params, ids, mask))

    # Independent numpy forward (HF BERT semantics, float64).
    s = {k: v.astype(np.float64) for k, v in state.items()}
    x = (
        s["bert.embeddings.word_embeddings.weight"][np.asarray(ids)[0]]
        + s["bert.embeddings.position_embeddings.weight"][:12]
        + s["bert.embeddings.token_type_embeddings.weight"][0]
    )[None]
    x = _ln(x, s["bert.embeddings.LayerNorm.weight"],
            s["bert.embeddings.LayerNorm.bias"], 1e-12)
    heads, hd = 12, H // 12
    for i in range(L):
        p = f"bert.encoder.layer.{i}."
        q = x @ s[p + "attention.self.query.weight"].T + s[
            p + "attention.self.query.bias"]
        k = x @ s[p + "attention.self.key.weight"].T + s[
            p + "attention.self.key.bias"]
        v = x @ s[p + "attention.self.value.weight"].T + s[
            p + "attention.self.value.bias"]
        q = q.reshape(1, 12, heads, hd)
        k = k.reshape(1, 12, heads, hd)
        v = v.reshape(1, 12, heads, hd)
        att = np.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(hd)
        att = np.exp(att - att.max(-1, keepdims=True))
        att = att / att.sum(-1, keepdims=True)
        o = np.einsum("bhnm,bmhd->bnhd", att, v).reshape(1, 12, H)
        o = o @ s[p + "attention.output.dense.weight"].T + s[
            p + "attention.output.dense.bias"]
        x = _ln(x + o, s[p + "attention.output.LayerNorm.weight"],
                s[p + "attention.output.LayerNorm.bias"], 1e-12)
        h = x @ s[p + "intermediate.dense.weight"].T + s[
            p + "intermediate.dense.bias"]
        h = _gelu(h)
        h = h @ s[p + "output.dense.weight"].T + s[p + "output.dense.bias"]
        x = _ln(x + h, s[p + "output.LayerNorm.weight"],
                s[p + "output.LayerNorm.bias"], 1e-12)
    np.testing.assert_allclose(got, x, atol=2e-3, rtol=1e-3)


def test_swin_window_attention_matches_numpy():
    """Single full window (no shift): WindowAttention == plain softmax
    attention with the relative-position bias."""
    rng = np.random.RandomState(1)
    C, HEADS, WIN = 16, 2, 3
    N = WIN * WIN
    model = WindowAttention(C, HEADS, WIN, WIN, dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1, N, C).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    got = np.asarray(jax.jit(model.apply)(params, x))

    p = jax.tree.map(np.asarray, params["params"])
    qkv = np.asarray(x[0]) @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    qkv = qkv.reshape(N, 3, HEADS, C // HEADS)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    att = np.einsum("nhd,mhd->hnm", q, k) / np.sqrt(C // HEADS)
    # relative position bias
    from ovmono3d_tpu.models.gdino.swin import _rel_pos_index

    idx = _rel_pos_index(WIN)
    bias = p["attn"]["rel_pos_bias"] if "attn" in p else p["rel_pos_bias"]
    att = att + bias[idx.reshape(-1)].reshape(N, N, HEADS).transpose(2, 0, 1)
    att = np.exp(att - att.max(-1, keepdims=True))
    att = att / att.sum(-1, keepdims=True)
    o = np.einsum("hnm,mhd->nhd", att, v).reshape(N, C)
    want = o @ p["proj"]["kernel"] + p["proj"]["bias"]
    np.testing.assert_allclose(got[0], want, atol=2e-3, rtol=1e-2)


def test_swin_shifted_window_partition_invariance():
    """A shifted-window block on constant input must produce constant
    output (windowing/roll/unroll bookkeeping introduces no seams)."""
    model = SwinBlock(dim=16, num_heads=2, window=4, shift=2,
                      dtype=jnp.float32)
    x = jnp.full((1, 12 * 12, 16), 0.7)
    # hw must stay static: close over it rather than passing through jit.
    params = jax.jit(
        lambda k, x: model.init(k, x, (12, 12))
    )(jax.random.PRNGKey(0), x)
    out = np.asarray(jax.jit(
        lambda p, x: model.apply(p, x, (12, 12))
    )(params, x))
    # Constant input -> output constant across positions (channels vary).
    np.testing.assert_allclose(
        out, np.broadcast_to(out[:, :1, :], out.shape), atol=1e-4
    )

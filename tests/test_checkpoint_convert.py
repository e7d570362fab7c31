"""Checkpoint converter tests: a synthetic torch-layout DINOv2 state dict
must map loss-free onto the Flax ViT and produce a forward consistent with
an independent numpy reference implementation of the DINOv2 block."""
import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.models.vit import VisionTransformer
from ovmono3d_tpu.utils.checkpoint_convert import (
    convert_dinov2_vit,
    merge_into_params,
)

C, DEPTH, HEADS, PATCH, GRID = 32, 2, 2, 14, 8


def _torch_style_state(rng):
    state = {}
    state["cls_token"] = rng.randn(1, 1, C).astype(np.float32) * 0.02
    state["pos_embed"] = rng.randn(1, 1 + GRID * GRID, C).astype(np.float32) * 0.02
    state["patch_embed.proj.weight"] = rng.randn(C, 3, PATCH, PATCH).astype(
        np.float32
    ) * 0.02
    state["patch_embed.proj.bias"] = rng.randn(C).astype(np.float32) * 0.02
    for i in range(DEPTH):
        p = f"blocks.{i}."
        state[p + "norm1.weight"] = 1 + rng.randn(C).astype(np.float32) * 0.02
        state[p + "norm1.bias"] = rng.randn(C).astype(np.float32) * 0.02
        state[p + "attn.qkv.weight"] = rng.randn(3 * C, C).astype(np.float32) * 0.05
        state[p + "attn.qkv.bias"] = rng.randn(3 * C).astype(np.float32) * 0.02
        state[p + "attn.proj.weight"] = rng.randn(C, C).astype(np.float32) * 0.05
        state[p + "attn.proj.bias"] = rng.randn(C).astype(np.float32) * 0.02
        state[p + "ls1.gamma"] = rng.rand(C).astype(np.float32) * 0.1
        state[p + "ls2.gamma"] = rng.rand(C).astype(np.float32) * 0.1
        state[p + "norm2.weight"] = 1 + rng.randn(C).astype(np.float32) * 0.02
        state[p + "norm2.bias"] = rng.randn(C).astype(np.float32) * 0.02
        state[p + "mlp.fc1.weight"] = rng.randn(4 * C, C).astype(np.float32) * 0.05
        state[p + "mlp.fc1.bias"] = rng.randn(4 * C).astype(np.float32) * 0.02
        state[p + "mlp.fc2.weight"] = rng.randn(C, 4 * C).astype(np.float32) * 0.05
        state[p + "mlp.fc2.bias"] = rng.randn(C).astype(np.float32) * 0.02
    # keys that must be ignored
    state["norm.weight"] = np.ones(C, np.float32)
    state["norm.bias"] = np.zeros(C, np.float32)
    state["mask_token"] = np.zeros((1, C), np.float32)
    return state


def _np_reference_forward(state, img):
    """Independent numpy DINOv2 forward (patch embed + blocks, no final
    norm), float64 for stability."""

    def ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-6) * w + b

    H = img.shape[1] // PATCH
    # patch embed: conv stride PATCH == per-patch matmul
    w = state["patch_embed.proj.weight"].astype(np.float64)  # [C,3,P,P]
    b = state["patch_embed.proj.bias"].astype(np.float64)
    patches = img.reshape(1, H, PATCH, H, PATCH, 3).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(1, H * H, PATCH * PATCH * 3)
    wmat = w.transpose(2, 3, 1, 0).reshape(PATCH * PATCH * 3, C)
    x = patches @ wmat + b
    cls_tok = state["cls_token"].astype(np.float64)
    x = np.concatenate([np.tile(cls_tok, (1, 1, 1)), x], axis=1)
    x = x + state["pos_embed"].astype(np.float64)

    for i in range(DEPTH):
        p = f"blocks.{i}."
        h = ln(x, state[p + "norm1.weight"].astype(np.float64),
               state[p + "norm1.bias"].astype(np.float64))
        qkv = h @ state[p + "attn.qkv.weight"].astype(np.float64).T + state[
            p + "attn.qkv.bias"
        ].astype(np.float64)
        n = qkv.shape[1]
        qkv = qkv.reshape(1, n, 3, HEADS, C // HEADS)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = 1 / np.sqrt(C // HEADS)
        att = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
        att = np.exp(att - att.max(-1, keepdims=True))
        att = att / att.sum(-1, keepdims=True)
        o = np.einsum("bhqk,bkhd->bqhd", att, v).reshape(1, n, C)
        o = o @ state[p + "attn.proj.weight"].astype(np.float64).T + state[
            p + "attn.proj.bias"
        ].astype(np.float64)
        x = x + o * state[p + "ls1.gamma"].astype(np.float64)
        h = ln(x, state[p + "norm2.weight"].astype(np.float64),
               state[p + "norm2.bias"].astype(np.float64))
        h = h @ state[p + "mlp.fc1.weight"].astype(np.float64).T + state[
            p + "mlp.fc1.bias"
        ].astype(np.float64)
        h = h * 0.5 * (1 + np.vectorize(__import__("math").erf)(h / np.sqrt(2)))
        h = h @ state[p + "mlp.fc2.weight"].astype(np.float64).T + state[
            p + "mlp.fc2.bias"
        ].astype(np.float64)
        x = x + h * state[p + "ls2.gamma"].astype(np.float64)
    return x[:, 1:].reshape(1, H, H, C)


def test_convert_and_forward_matches_numpy_reference():
    rng = np.random.RandomState(0)
    state = _torch_style_state(rng)
    model = VisionTransformer(
        patch_size=PATCH, embed_dim=C, depth=DEPTH, num_heads=HEADS,
        pretrain_grid=GRID, use_depth_fusion=False, dtype=jnp.float32,
    )
    img = rng.randn(1, GRID * PATCH, GRID * PATCH, 3).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(img))
    converted = convert_dinov2_vit(state, depth=DEPTH)
    params = merge_into_params(params, converted, ("params",))
    out = jax.jit(model.apply)(params, jnp.asarray(img))["last_feat"]
    want = _np_reference_forward(state, img.astype(np.float64))
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-3, rtol=1e-3)


def test_merge_shape_mismatch_raises():
    rng = np.random.RandomState(1)
    state = _torch_style_state(rng)
    state["patch_embed.proj.weight"] = rng.randn(C, 3, 16, 16).astype(
        np.float32
    )
    model = VisionTransformer(
        patch_size=PATCH, embed_dim=C, depth=DEPTH, num_heads=HEADS,
        pretrain_grid=GRID, use_depth_fusion=False,
    )
    img = jnp.zeros((1, GRID * PATCH, GRID * PATCH, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    converted = convert_dinov2_vit(state, depth=DEPTH)
    import pytest

    with pytest.raises(ValueError, match="shape mismatch"):
        merge_into_params(params, converted, ("params",))

"""Int8 W8A8 dynamic-quant serving path (ops/quant.py).

Three claims: (1) quant="none" is BIT-identical to nn.Dense with the
same params (the default path must not change any golden); (2) the
int8 path's integer core matches an exact numpy int32 reference;
(3) end-to-end quantization error through a ViT trunk is bounded —
per-layer ~0.2-0.5 % relative, trunk feature cosine > 0.999 at random
weights (the standard W8A8 regime).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_qdense_none_bit_identical_to_nn_dense():
    from ovmono3d_tpu.ops.quant import QDense

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 37, 96), jnp.float32)
    qd = QDense(64, quant="none", dtype=jnp.bfloat16)
    params = qd.init(jax.random.PRNGKey(1), x)
    ref = nn.Dense(64, dtype=jnp.bfloat16)
    # identical param tree -> directly reusable
    got = qd.apply(params, x)
    want = ref.apply(params, x)
    assert got.dtype == want.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_core_exact_vs_numpy():
    from ovmono3d_tpu.ops.quant import quantize_int8

    x = jax.random.normal(jax.random.PRNGKey(2), (33, 48), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(3), (48, 24), jnp.float32)
    xq, xs = quantize_int8(x, axis=-1)
    wq, ws = quantize_int8(w, axis=0)
    assert xq.dtype == jnp.int8 and wq.dtype == jnp.int8
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    ref = np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)
    np.testing.assert_array_equal(np.asarray(acc), ref)
    # dequantized operands reconstruct the originals to half-lsb
    np.testing.assert_allclose(
        np.asarray(xq, np.float32) * np.asarray(xs),
        np.asarray(x, np.float32),
        atol=float(np.max(np.asarray(xs))) * 0.5 + 1e-6,
    )


def test_int8_matmul_error_bound():
    from ovmono3d_tpu.ops.quant import int8_matmul

    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (8, 256, 384), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(5), (384, 512), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(6), (512,), jnp.float32)
    got = np.asarray(int8_matmul(x, w, b, jnp.float32))
    want = np.asarray(x, np.float32) @ np.asarray(w) + np.asarray(b)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    # W8A8 dynamic per-row quant on gaussian data: ~0.3 % relative
    assert rel < 0.02, rel


def test_vit_trunk_quant_vs_bf16():
    """Tiny ViT: int8 serving output stays close to the bf16 path and the
    param tree is UNCHANGED (same checkpoints load in both modes)."""
    from ovmono3d_tpu.models.vit import VisionTransformer

    kw = dict(patch_size=8, embed_dim=64, depth=2, num_heads=2,
              pretrain_grid=8, use_depth_fusion=False)
    img = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3))
    vit = VisionTransformer(**kw)
    vit_q = VisionTransformer(quant="int8", **kw)
    params = jax.jit(vit.init)(jax.random.PRNGKey(8), img)
    assert (
        jax.tree_util.tree_structure(params)
        == jax.tree_util.tree_structure(
            jax.eval_shape(vit_q.init, jax.random.PRNGKey(8), img))
    )
    ref = np.asarray(jax.jit(vit.apply)(params, img)["last_feat"])
    got = np.asarray(jax.jit(vit_q.apply)(params, img)["last_feat"])
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel
    cos = float(
        (got.ravel() @ ref.ravel())
        / (np.linalg.norm(got) * np.linalg.norm(ref))
    )
    assert cos > 0.999, cos
    # and it is genuinely a different code path
    assert not np.array_equal(got, ref)


def test_train_cli_rejects_quant(tmp_path):
    """model.backbone.quant is serving-only: round() has zero gradient, so
    the train CLI must refuse it instead of silently freezing the trunk."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, "tools/train_net.py", "--synthetic",
         "--max-iter", "1", "--batch-size", "1",
         f"output_dir={tmp_path}",
         "model.backbone.quant=int8",
         "model.backbone.embed_dim=64", "model.backbone.depth=1",
         "model.backbone.num_heads=2", "model.backbone.pretrain_grid=8",
         "model.backbone.out_channels=64", "model.backbone.square_pad=224",
         "model.roi_box.fc_dim=64", "model.cube.fc_dim=64",
         "model.num_classes=9"],
        cwd=repo, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode != 0
    assert "SERVING-only" in (r.stderr + r.stdout)

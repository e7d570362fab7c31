"""Backbone factory tests: every family builds, runs, and exposes the right
pyramid shapes/strides."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ovmono3d_tpu.config import BackboneConfig
from ovmono3d_tpu.models.backbones import (
    VIT_PRESETS,
    build_backbone,
)


def _tiny(name, **kw):
    return BackboneConfig(
        name=name, embed_dim=32, depth=2, num_heads=2, pretrain_grid=4,
        out_channels=32, use_depth_fusion=False, **kw
    )


def _run(cfg, size):
    model = build_backbone(cfg)
    img = jnp.zeros((1, size, size, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    return model, jax.jit(model.apply)(params, img)


def test_dinov2_sfp():
    cfg = _tiny("dinov2", patch_size=14, scale_factors=(2.0, 1.0, 0.5))
    model, out = _run(cfg, 112)  # 8x8 grid
    assert model.strides == [7, 14, 28]
    assert model.feature_names == ["p2", "p3", "p4"]
    assert out["p2"].shape == (1, 16, 16, 32)
    assert out["p3"].shape == (1, 8, 8, 32)
    assert out["p4"].shape == (1, 4, 4, 32)


def test_clip_variant():
    cfg = _tiny("clip", scale_factors=(4.0, 2.0, 1.0, 0.5))
    model, out = _run(cfg, 64)  # patch 16 -> 4x4 grid
    assert model.strides == [4, 8, 16, 32]
    assert out["p2"].shape == (1, 16, 16, 32)
    assert out["p5"].shape == (1, 2, 2, 32)


def test_mae_variant():
    cfg = _tiny("mae", scale_factors=(2.0, 1.0))
    model, out = _run(cfg, 64)
    assert set(out) == {"p3", "p4"}
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))


def test_sam_variant_windowed():
    cfg = _tiny("sam", scale_factors=(1.0,))
    model, out = _run(cfg, 96)  # 6x6 grid with window 14 -> single window
    assert out["p4"].shape == (1, 6, 6, 32)
    # SAM preset: no cls token, neck conv present in params.
    m = build_backbone(cfg)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))
    vit_params = params["params"]["vit"]
    assert "cls_token" not in vit_params
    assert "neck_conv1" in vit_params


def test_midas_preset_is_large():
    assert VIT_PRESETS["midas"]["embed_dim"] == 1024
    assert VIT_PRESETS["midas"]["depth"] == 24


def test_dla_fpn():
    cfg = BackboneConfig(name="dla", out_channels=32)
    model = build_backbone(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    out = jax.jit(model.apply)(variables, img)
    assert model.strides == [4, 8, 16, 32, 64]
    assert out["p2"].shape == (1, 16, 16, 32)
    assert out["p3"].shape == (1, 8, 8, 32)
    assert out["p4"].shape == (1, 4, 4, 32)
    assert out["p5"].shape == (1, 2, 2, 32)
    assert out["p6"].shape == (1, 1, 1, 32)
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))


def test_unknown_backbone_raises():
    with pytest.raises(ValueError):
        build_backbone(BackboneConfig(name="resnet99"))


def test_rcnn3d_with_dla_backbone():
    """The meta-arch runs with a CNN backbone (5-level anchor config).

    DLA inputs must be divisible by 64 (stride-64 p6 with even-size trees,
    same constraint as the torch original).
    """
    import sys

    sys.path.insert(0, "tests")
    from test_model import tiny_config, _oracle

    cfg = tiny_config()
    bb = BackboneConfig(name="dla", out_channels=32, square_pad=128)
    anchors = dataclasses.replace(
        cfg.model.anchors,
        sizes=((16.0,), (32.0,), (64.0,), (96.0,), (112.0,)),
    )
    rpn = dataclasses.replace(
        cfg.model.rpn, in_features=("p2", "p3", "p4", "p5", "p6"),
        pre_nms_topk_test=32, post_nms_topk_test=16,
    )
    roi = dataclasses.replace(
        cfg.model.roi_box, in_features=("p2", "p3", "p4", "p5", "p6")
    )
    model_cfg = dataclasses.replace(
        cfg.model, backbone=bb, anchors=anchors, rpn=rpn, roi_box=roi
    )
    from ovmono3d_tpu.models.rcnn3d import build_model

    model = build_model(model_cfg)
    S = 128
    image = jax.random.uniform(jax.random.PRNGKey(0), (2, S, S, 3)) * 255.0
    K = jnp.broadcast_to(
        jnp.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]]), (2, 3, 3)
    )
    im_hw = jnp.array([[128, 128], [112, 96]], jnp.int32)
    ratio = jnp.array([2.0, 1.5])
    ob, oc, osc, ov = _oracle()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), image, K, im_hw, ratio,
        oracle_boxes=ob, oracle_classes=oc, oracle_scores=osc,
        oracle_valid=ov,
    )
    det = jax.jit(
        lambda p: model.apply(
            p, image, K, im_hw, ratio, oracle_boxes=ob, oracle_classes=oc,
            oracle_scores=osc, oracle_valid=ov,
        )
    )(params)
    assert det.corners3d.shape == (2, 4, 8, 3)
    for leaf in jax.tree.leaves(det):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_resnet_variants():
    for name, ch_p2 in (("resnet50", 256), ("resnet18", 64)):
        cfg = BackboneConfig(name=name, out_channels=32)
        model = build_backbone(cfg)
        img = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
        out = jax.jit(model.apply)(variables, img)
        assert out["p2"].shape == (1, 16, 16, 32)
        assert out["p6"].shape == (1, 1, 1, 32)
        for v in out.values():
            assert np.all(np.isfinite(np.asarray(v)))


def test_densenet_mnasnet_shufflenet_trunks():
    """Trunk channel/stride parity with the reference wrappers
    (densenet.py:19, mnasnet.py:20, shufflenet.py:22)."""
    from ovmono3d_tpu.models.cnns import DenseNet, MNASNet, ShuffleNetV2

    want = {
        DenseNet: {"p2": 256, "p3": 512, "p4": 1024, "p5": 1024, "p6": 1024},
        MNASNet: {"p2": 24, "p3": 40, "p4": 96, "p5": 320, "p6": 320},
        ShuffleNetV2: {"p2": 24, "p3": 116, "p4": 232, "p5": 464, "p6": 464},
    }
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    for cls, channels in want.items():
        trunk = cls()
        variables = jax.jit(trunk.init)(jax.random.PRNGKey(0), img)
        out = jax.jit(trunk.apply)(variables, img)
        assert set(out) == set(channels), cls.__name__
        for i, (name, ch) in enumerate(sorted(channels.items())):
            size = 64 // (4 * 2**i)
            assert out[name].shape == (1, size, size, ch), (
                cls.__name__, name, out[name].shape)
            assert np.all(np.isfinite(np.asarray(out[name])))


def test_dla_variant_presets():
    """Bottleneck/BottleneckX DLA variants (reference dla.py:312-414) build
    and keep the p2-p6 contract."""
    from ovmono3d_tpu.models.dla import DLA, DLA_PRESETS

    assert set(DLA_PRESETS) >= {
        "dla34", "dla46_c", "dla46x_c", "dla60", "dla60x", "dla102",
        "dla102x2", "dla169",
    }
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    for name, p5_ch in (("dla46_c", 256), ("dla60", 1024), ("dla102", 1024)):
        trunk = DLA(**DLA_PRESETS[name])
        variables = jax.jit(trunk.init)(jax.random.PRNGKey(0), img)
        out = jax.jit(trunk.apply)(variables, img)
        assert out["p2"].shape[1:3] == (16, 16), name
        assert out["p5"].shape == (1, 2, 2, p5_ch), name
        assert out["p6"].shape == (1, 1, 1, p5_ch), name
        assert np.all(np.isfinite(np.asarray(out["p5"])))


def test_cnn_fpn_backbone_new_families():
    for name in ("densenet", "mnasnet", "shufflenet"):
        cfg = BackboneConfig(name=name, out_channels=16)
        model = build_backbone(cfg)
        img = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
        out = jax.jit(model.apply)(variables, img)
        assert model.strides == [4, 8, 16, 32, 64]
        assert out["p2"].shape == (1, 16, 16, 16)
        assert out["p6"].shape == (1, 1, 1, 16)


def test_remat_matches_plain():
    """backbone.remat (jax.checkpoint on trunk blocks) must not change the
    forward values or the gradients — only the backward-pass schedule."""
    cfg = _tiny("dinov2", patch_size=14, scale_factors=(2.0, 1.0, 0.5))
    cfg_r = dataclasses.replace(cfg, remat=True)
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 56, 56, 3))

    model = build_backbone(cfg)
    model_r = build_backbone(cfg_r)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img)

    def loss(m):
        def f(p):
            out = m.apply(p, img)
            return jnp.sum(out["p3"].astype(jnp.float32) ** 2)
        return jax.jit(jax.value_and_grad(f))(params)

    # "dots_attn" degenerates to "dots" on CPU (the flash checkpoint_name
    # tags only exist on the TPU path) but must still construct and match.
    cfg_d = dataclasses.replace(cfg, remat=True, remat_policy="dots_attn")
    model_d = build_backbone(cfg_d)

    (v, g), (v_r, g_r), (v_d, g_d) = (
        loss(model), loss(model_r), loss(model_d))
    np.testing.assert_allclose(float(v), float(v_r), rtol=1e-6)
    np.testing.assert_allclose(float(v), float(v_d), rtol=1e-6)
    # The trunk computes in bf16; the recompute schedule changes fusion /
    # reassociation, so gradients agree only to bf16 noise (~1%), not
    # bitwise. Guard against real divergence (sign/scale), not rounding.
    for a, b, c in zip(jax.tree.leaves(g), jax.tree.leaves(g_r),
                       jax.tree.leaves(g_d)):
        a = np.asarray(a, np.float64)
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(
            a / scale, np.asarray(b, np.float64) / scale, atol=0.02)
        np.testing.assert_allclose(
            a / scale, np.asarray(c, np.float64) / scale, atol=0.02)


def test_rel_pos_attention_fast_matches_f32():
    """The bf16 decomposed-rel-pos attention (SAM trunk production path,
    with and without the clamped single-pass softmax) vs the exact f32
    formula — bf16 rounding only, no structural divergence."""
    from ovmono3d_tpu.models.vit import _rel_pos_attention_fast

    rng = np.random.RandomState(7)
    B, H, D = 2, 3, 8
    h, w = 3, 4
    N = h * w
    q = rng.randn(B, N, H, D).astype(np.float32)
    k = rng.randn(B, N, H, D).astype(np.float32)
    v = rng.randn(B, N, H, D).astype(np.float32)
    Rh = rng.randn(h, h, D).astype(np.float32) * 0.1
    Rw = rng.randn(w, w, D).astype(np.float32) * 0.1

    # exact f32 reference (the segment_anything add_decomposed_rel_pos
    # formula, mirroring Attention._rel_pos_attention's f32 branch)
    qg = q.transpose(0, 2, 1, 3).reshape(B, H, h, w, D)
    bias_h = np.einsum("bnhwc,hkc->bnhwk", qg, Rh)
    bias_w = np.einsum("bnhwc,wkc->bnhwk", qg, Rw)
    attn = np.einsum("bqhd,bkhd->bhqk", q * D ** -0.5, k)
    attn = attn.reshape(B, H, h, w, h, w)
    attn = attn + bias_h[..., :, None] + bias_w[..., None, :]
    attn = attn.reshape(B, H, N, N)
    attn = attn - attn.max(-1, keepdims=True)
    p = np.exp(attn)
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bkhd->bqhd", p, v)

    qb, kb, vb = (jnp.asarray(x, jnp.bfloat16) for x in (q, k, v))
    Rhb, Rwb = (jnp.asarray(x, jnp.bfloat16) for x in (Rh, Rw))
    for clamp in (None, 50.0):
        got = np.asarray(
            _rel_pos_attention_fast(qb, kb, vb, Rhb, Rwb, (h, w), clamp)
        ).astype(np.float32)
        np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_gelu_tanh_serving_mode():
    """The opt-in tanh approximate-gelu epilogue (Mlp.gelu="tanh",
    measured free on v5e where exact-erf costs ~1.2 ms per ViT-L fc1
    fusion — tools/probe_gelu_tail.py) must share the param tree with
    the erf default and stay within the tanh-approximation error bound
    (max |gelu_tanh - gelu_erf| ≈ 3e-4 abs for unit-scale inputs)."""
    from ovmono3d_tpu.models.vit import VisionTransformer

    kw = dict(patch_size=14, embed_dim=32, depth=2, num_heads=2,
              pretrain_grid=4, use_depth_fusion=False,
              dtype=jnp.float32)
    vit_erf = VisionTransformer(**kw)
    vit_tanh = VisionTransformer(gelu="tanh", **kw)
    img = jnp.asarray(
        np.random.RandomState(0).rand(1, 56, 56, 3), jnp.float32)
    params = jax.jit(vit_erf.init)(jax.random.PRNGKey(0), img)
    # identical tree: the tanh model consumes the erf model's params
    a = jax.jit(vit_erf.apply)(params, img)["last_feat"]
    b = jax.jit(vit_tanh.apply)(params, img)["last_feat"]
    diff = float(jnp.max(jnp.abs(a - b)))
    assert 0 < diff < 5e-2, diff  # differs (mode is live) but bounded
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-2, atol=5e-3)

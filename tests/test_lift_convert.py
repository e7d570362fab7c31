"""LIFT checkpoint converter: synthetic detectron2-layout dict merges
shape-clean into a tiny RCNN3D and changes its outputs."""
import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.utils.checkpoint_convert import merge_into_params
from ovmono3d_tpu.utils.lift_convert import convert_ovmono3d_lift

C, DEPTH, HEADS, PATCH, GRID = 32, 1, 2, 14, 8
OUT = 32   # sfp/fpn channels
FC = 32
NCLS = 5
A = 3      # anchors per cell


def _synthetic_state(rng):
    s = {}

    def lin(prefix, din, dout):
        s[prefix + ".weight"] = rng.randn(dout, din).astype(np.float32) * 0.02
        s[prefix + ".bias"] = rng.randn(dout).astype(np.float32) * 0.02

    def conv(prefix, cin, cout, k, bias=True):
        s[prefix + ".weight"] = rng.randn(cout, cin, k, k).astype(
            np.float32
        ) * 0.02
        if bias:
            s[prefix + ".bias"] = rng.randn(cout).astype(np.float32) * 0.02

    def norm(prefix, d):
        s[prefix + ".weight"] = np.ones(d, np.float32)
        s[prefix + ".bias"] = np.zeros(d, np.float32)

    # dinov2 trunk under backbone.net.vit.
    p = "backbone.net.vit."
    s[p + "cls_token"] = rng.randn(1, 1, C).astype(np.float32) * 0.02
    s[p + "pos_embed"] = rng.randn(1, 1 + GRID**2, C).astype(np.float32) * 0.02
    conv(p + "patch_embed.proj", 3, C, PATCH)
    bp = p + "blocks.0."
    norm(bp + "norm1", C)
    lin(bp + "attn.qkv", C, 3 * C)
    lin(bp + "attn.proj", C, C)
    s[bp + "ls1.gamma"] = rng.rand(C).astype(np.float32) * 0.1
    s[bp + "ls2.gamma"] = rng.rand(C).astype(np.float32) * 0.1
    norm(bp + "norm2", C)
    lin(bp + "mlp.fc1", C, 4 * C)
    lin(bp + "mlp.fc2", 4 * C, C)
    conv("backbone.net.depth_fusion", C + 1, C, 1)

    # SFP stages: strides 7/14/28 -> simfp_2 (deconv+2conv), simfp_3 (2conv),
    # simfp_4 (pool+2conv).
    s["backbone.simfp_2.0.weight"] = rng.randn(C, C // 2, 2, 2).astype(
        np.float32
    ) * 0.02  # ConvTranspose IOHW
    s["backbone.simfp_2.0.bias"] = np.zeros(C // 2, np.float32)
    conv("backbone.simfp_2.1", C // 2, OUT, 1, bias=False)
    norm("backbone.simfp_2.1.norm", OUT)
    conv("backbone.simfp_2.2", OUT, OUT, 3, bias=False)
    norm("backbone.simfp_2.2.norm", OUT)
    conv("backbone.simfp_3.0", C, OUT, 1, bias=False)
    norm("backbone.simfp_3.0.norm", OUT)
    conv("backbone.simfp_3.1", OUT, OUT, 3, bias=False)
    norm("backbone.simfp_3.1.norm", OUT)
    conv("backbone.simfp_4.1", C, OUT, 1, bias=False)
    norm("backbone.simfp_4.1.norm", OUT)
    conv("backbone.simfp_4.2", OUT, OUT, 3, bias=False)
    norm("backbone.simfp_4.2.norm", OUT)

    # RPN head.
    conv("proposal_generator.rpn_head.conv", OUT, OUT, 3)
    conv("proposal_generator.rpn_head.objectness_logits", OUT, A, 1)
    conv("proposal_generator.rpn_head.anchor_deltas", OUT, 4 * A, 1)

    # Box head + predictor.
    lin("roi_heads.box_head.fc1", OUT * 49, FC)
    lin("roi_heads.box_head.fc2", FC, FC)
    lin("roi_heads.box_predictor.cls_score", FC, NCLS + 1)
    lin("roi_heads.box_predictor.bbox_pred", FC, NCLS * 4)

    # Cube head (shared fc).
    lin("roi_heads.cube_head.feature_generator.fc1", OUT * 49, FC)
    lin("roi_heads.cube_head.feature_generator.fc2", FC, FC)
    lin("roi_heads.cube_head.bbox_3D_center_deltas", FC, 2)
    lin("roi_heads.cube_head.bbox_3D_dims", FC, 3)
    lin("roi_heads.cube_head.bbox_3D_pose", FC, 6)
    lin("roi_heads.cube_head.bbox_3D_center_depth", FC, 1)
    lin("roi_heads.cube_head.bbox_3D_uncertainty", FC, 1)
    return s


def test_lift_convert_merges_and_runs():
    import sys

    sys.path.insert(0, "tests")
    from test_model import tiny_config, _batch, _oracle

    cfg = tiny_config()
    from ovmono3d_tpu.models.rcnn3d import build_model

    model = build_model(cfg.model)
    image, K, im_hw, ratio = _batch()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1), image, K, im_hw, ratio
    )

    rng = np.random.RandomState(0)
    converted = convert_ovmono3d_lift(_synthetic_state(rng), depth=DEPTH)
    merged = merge_into_params(params, converted, ("params",))

    ob, oc, osc, ov = _oracle()
    run = lambda p: model.apply(
        p, image, K, im_hw, ratio, oracle_boxes=ob, oracle_classes=oc,
        oracle_scores=osc, oracle_valid=ov,
    )
    out = jax.jit(run)(merged)
    out0 = jax.jit(run)(params)
    assert np.all(np.isfinite(np.asarray(out.corners3d)))
    assert not np.allclose(
        np.asarray(out.corners3d), np.asarray(out0.corners3d)
    )


def test_extract_priors_roundtrip():
    """Priors baked into a released checkpoint as parameters
    (roi_heads.py:117-143) come back in the compute_priors dict layout."""
    from ovmono3d_tpu.utils.lift_convert import extract_priors

    rng = np.random.RandomState(1)
    C, B = 9, 4
    state = {
        "roi_heads.priors_dims_per_cat":
            rng.rand(1, C, 2, 3).astype(np.float32),
        "roi_heads.priors_z_scales": rng.rand(C, B).astype(np.float32),
        "roi_heads.priors_z_stats": rng.rand(C, B, 2).astype(np.float32),
    }
    priors = extract_priors(state)
    np.testing.assert_array_equal(
        priors["dims"], state["roi_heads.priors_dims_per_cat"][0])
    np.testing.assert_array_equal(
        priors["z_scales"], state["roi_heads.priors_z_scales"])
    np.testing.assert_array_equal(
        priors["z_stats"], state["roi_heads.priors_z_stats"])
    assert extract_priors({"other": np.zeros(1)}) is None

    # the extracted dict drives the priors-enabled decode end-to-end
    import dataclasses
    import sys

    sys.path.insert(0, "tests")
    from test_model import tiny_config, _batch, _oracle

    cfg = tiny_config()
    cube = dataclasses.replace(cfg.model.cube, dims_priors_enabled=True)
    mcfg = dataclasses.replace(cfg.model, cube=cube)
    from ovmono3d_tpu.models.rcnn3d import build_model

    model = build_model(mcfg, priors=priors)
    image, K, im_hw, ratio = _batch()
    params = jax.jit(model.init)(jax.random.PRNGKey(1), image, K, im_hw,
                                 ratio)
    ob, oc, osc, ov = _oracle()
    out = model.apply(params, image, K, im_hw, ratio, oracle_boxes=ob,
                      oracle_classes=oc, oracle_scores=osc, oracle_valid=ov)
    assert np.all(np.isfinite(np.asarray(out.dimensions)[np.asarray(ov)]))

#!/usr/bin/env python
"""One-command release-weight validation harness.

The two standing environment-blocked parity items (round-3 VERDICT) are
(a) accuracy against the four released checkpoints and (b) AP3D parity on
real Omni3D data — neither the weights nor the datasets exist in this
image (zero egress). This script turns both into a single executable step
for the moment they appear (reference setup.sh:1-12 downloads exactly
these files; run.sh:1-15 is the eval protocol):

    python tools/validate_release.py \
        --lift-ckpt  .../ovmono3d_lift.pth \
        --gdino-ckpt .../groundingdino_swinb_cogcoor.pth \
        --sam-ckpt   .../sam_vit_h_4b8939.pth \
        --depth-ckpt .../DepthPro-hf/pytorch_model.bin \
        --vocab      .../bert-base-uncased-vocab.txt \
        --data-root  .../omni3d_datasets \
        --output-dir output/release_validation

Stages per model family:
  1. convert    torch state dict -> Flax param tree (the repo's
                numerics-proven converters; --hf accepts HuggingFace-hub
                GroundingDINO/SAM dicts via utils/hf_shims)
  2. structure  converted tree must match jax.eval_shape of our model's
                init leaf-for-leaf at RELEASED scale (both directions)
  3. activate   one jitted forward per family on a deterministic input:
                finite outputs + summary stats to eyeball
  4. evaluate   (with --data-root) prints the exact CLI commands for the
                oracle-2D AP3D run, the open-vocab oracle generation, and
                the GEO pipeline, then runs them in-process

`--dry-run` executes stages 1-2 for all four families with zeroed
full-scale state dicts (HF meta-device models for GDINO/SAM/Depth-Pro, a
synthetic detectron2-layout dict for LIFT) — every converter and
structure check runs, no weights needed. CI covers this via
tests/test_validate_release.py.

Expected numbers once real weights + Objectron_test are supplied
(BASELINE.md, reference author run log nohup.out:1095-1143 — base
categories, oracle-2D target_aware):
    AP2D 56.65   AP3D@15 63.44   AP3D@25 60.72   AP3D@50 53.01
    per-category AP3D: books 77.7 / bottle 65.9 / camera 70.5 /
    chair 75.0 / cup 85.7 / shoes 91.2 / cereal box 0 / laptop 0
The north star (BASELINE.json): AP3D within +-0.5 of the reference on
novel categories under target_aware.
"""
from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(message)s")
logger = logging.getLogger("validate_release")

FAMILIES = ("lift", "gdino", "sam", "depth")

# Released geometries (setup.sh checkpoints).
GDINO_DEPTHS = (2, 2, 18, 2)   # Swin-B
SAM_DEPTH = 32                 # ViT-H
LIFT = dict(embed=768, depth=12, heads=12, grid=37, patch=14,
            out=256, fc=1024, ncls=50, anchors=3)


# --------------------------------------------------------------- helpers

def _materialize_meta(cls, *args, **kwargs):
    """Instantiate an HF model with released shapes but no init math."""
    import torch

    with torch.device("meta"):
        model = cls(*args, **kwargs)
    return model.to_empty(device="cpu")


def _state_np(model) -> dict:
    return {k: np.zeros(tuple(v.shape), np.float32)
            for k, v in model.state_dict().items()}


def _assert_matches_init_shapes(want, got) -> int:
    """Structure (both directions) + every leaf shape; raises with the
    offending key path otherwise. Returns the leaf count."""
    import jax

    def chk(w, g):
        assert tuple(w.shape) == tuple(np.shape(g)), (
            f"shape mismatch: model {tuple(w.shape)} vs converted "
            f"{tuple(np.shape(g))}")
        return 0

    jax.tree.map(chk, want, got)
    n = len(jax.tree.leaves(want))
    assert n > 0
    return n


def synthetic_lift_state(rng, g=LIFT) -> dict:
    """Zero-ish detectron2-layout ovmono3d_lift.pth dict at RELEASED scale
    (DINOv2 ViT-B/14 + SFP + RPN + box head + shared-fc cube head) — the
    dry-run stand-in; layout mirrors cubercnn's state_dict naming."""
    s = {}
    C, OUT, FC = g["embed"], g["out"], g["fc"]

    def lin(prefix, din, dout):
        s[prefix + ".weight"] = rng.randn(dout, din).astype(np.float32) * .02
        s[prefix + ".bias"] = np.zeros(dout, np.float32)

    def conv(prefix, cin, cout, k, bias=True):
        s[prefix + ".weight"] = rng.randn(cout, cin, k, k).astype(
            np.float32) * .02
        if bias:
            s[prefix + ".bias"] = np.zeros(cout, np.float32)

    def norm(prefix, d):
        s[prefix + ".weight"] = np.ones(d, np.float32)
        s[prefix + ".bias"] = np.zeros(d, np.float32)

    p = "backbone.net.vit."
    s[p + "cls_token"] = np.zeros((1, 1, C), np.float32)
    s[p + "pos_embed"] = np.zeros((1, 1 + g["grid"] ** 2, C), np.float32)
    conv(p + "patch_embed.proj", 3, C, g["patch"])
    for b in range(g["depth"]):
        bp = f"{p}blocks.{b}."
        norm(bp + "norm1", C)
        lin(bp + "attn.qkv", C, 3 * C)
        lin(bp + "attn.proj", C, C)
        s[bp + "ls1.gamma"] = np.full(C, 0.1, np.float32)
        s[bp + "ls2.gamma"] = np.full(C, 0.1, np.float32)
        norm(bp + "norm2", C)
        lin(bp + "mlp.fc1", C, 4 * C)
        lin(bp + "mlp.fc2", 4 * C, C)
    conv("backbone.net.depth_fusion", C + 1, C, 1)

    s["backbone.simfp_2.0.weight"] = rng.randn(C, C // 2, 2, 2).astype(
        np.float32) * .02  # ConvTranspose IOHW
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

    A = g["anchors"]
    conv("proposal_generator.rpn_head.conv", OUT, OUT, 3)
    conv("proposal_generator.rpn_head.objectness_logits", OUT, A, 1)
    conv("proposal_generator.rpn_head.anchor_deltas", OUT, 4 * A, 1)

    lin("roi_heads.box_head.fc1", OUT * 49, FC)
    lin("roi_heads.box_head.fc2", FC, FC)
    lin("roi_heads.box_predictor.cls_score", FC, g["ncls"] + 1)
    lin("roi_heads.box_predictor.bbox_pred", FC, g["ncls"] * 4)

    lin("roi_heads.cube_head.feature_generator.fc1", OUT * 49, FC)
    lin("roi_heads.cube_head.feature_generator.fc2", FC, FC)
    lin("roi_heads.cube_head.bbox_3D_center_deltas", FC, 2)
    lin("roi_heads.cube_head.bbox_3D_dims", FC, 3)
    lin("roi_heads.cube_head.bbox_3D_pose", FC, 6)
    lin("roi_heads.cube_head.bbox_3D_center_depth", FC, 1)
    lin("roi_heads.cube_head.bbox_3D_uncertainty", FC, 1)
    return s


def _load_torch(path: str) -> dict:
    from ovmono3d_tpu.utils.load import load_torch_state

    logger.info("loading %s ...", path)
    return load_torch_state(path)


# ------------------------------------------------------------- families

def validate_lift(args) -> dict:
    import jax
    import jax.numpy as jnp

    from ovmono3d_tpu.config import Config
    from ovmono3d_tpu.models.rcnn3d import build_model
    from ovmono3d_tpu.utils.lift_convert import (
        convert_ovmono3d_lift,
        extract_priors,
    )

    if args.dry_run:
        state = synthetic_lift_state(np.random.RandomState(0))
    else:
        state = _load_torch(args.lift_ckpt)
    converted = convert_ovmono3d_lift(state, depth=LIFT["depth"])
    priors = extract_priors(state)

    cfg = Config().model  # flagship defaults ARE the released geometry
    model = build_model(cfg, priors=priors)
    S = cfg.backbone.square_pad
    shapes = jax.eval_shape(
        lambda rng: model.init(
            rng, jnp.zeros((1, S, S, 3)), jnp.eye(3)[None],
            jnp.full((1, 2), S, jnp.int32), jnp.ones((1,))),
        jax.random.PRNGKey(0),
    )
    n = _assert_matches_init_shapes(shapes["params"], converted)
    res = {"leaves": n, "priors": priors is not None}
    if args.dry_run:
        return res

    # activation check: oracle-path forward on a deterministic image.
    params = {"params": jax.tree.map(jnp.asarray, converted)}
    rngi = np.random.RandomState(0)
    img = jnp.asarray(rngi.rand(1, S, S, 3).astype(np.float32) * 255.0)
    det = jax.jit(lambda p, im: model.apply(
        p, im, jnp.eye(3)[None] * 500.0, jnp.full((1, 2), S, jnp.int32),
        jnp.ones((1,)),
        oracle_boxes=jnp.asarray([[[100., 100., 300., 300.]]]),
        oracle_classes=jnp.zeros((1, 1), jnp.int32),
        oracle_scores=jnp.ones((1, 1)),
        oracle_valid=jnp.ones((1, 1), bool),
    ))(params, img)
    corners = np.asarray(det.corners3d)
    assert np.all(np.isfinite(corners)), "LIFT forward produced non-finite"
    res["corners_absmax"] = float(np.abs(corners).max())
    logger.info("  lift activation ok: |corners| max %.2f",
                res["corners_absmax"])
    return res


def validate_gdino(args) -> dict:
    import jax
    import jax.numpy as jnp

    from ovmono3d_tpu.models.gdino.model import GroundingDINO
    from ovmono3d_tpu.utils.gdino_convert import convert_groundingdino

    if args.dry_run:
        from transformers import (
            BertConfig,
            GroundingDinoConfig,
            GroundingDinoForObjectDetection,
            SwinConfig,
        )

        from ovmono3d_tpu.utils.hf_shims import hf_gdino_to_original_keys

        swin = SwinConfig(
            image_size=384, patch_size=4, embed_dim=128,
            depths=list(GDINO_DEPTHS), num_heads=[4, 8, 16, 32],
            window_size=12,
            out_features=["stage2", "stage3", "stage4"], hidden_act="gelu",
        )
        cfg = GroundingDinoConfig(
            backbone_config=swin, text_config=BertConfig(), d_model=256,
            encoder_layers=6, decoder_layers=6, num_queries=900,
            encoder_attention_heads=8, decoder_attention_heads=8,
            encoder_ffn_dim=2048, decoder_ffn_dim=2048,
            num_feature_levels=4, max_text_len=256,
            positional_embedding_temperature=20,
        )
        hf = _materialize_meta(GroundingDinoForObjectDetection, cfg)
        state = hf_gdino_to_original_keys(_state_np(hf), GDINO_DEPTHS, 6, 6)
    else:
        state = _load_torch(args.gdino_ckpt)
        if args.hf:
            from ovmono3d_tpu.utils.hf_shims import (
                hf_gdino_to_original_keys,
            )

            state = hf_gdino_to_original_keys(state, GDINO_DEPTHS, 6, 6)
    converted = convert_groundingdino(state)

    model = GroundingDINO(compute_dtype=jnp.float32)
    T = 16
    shapes = jax.eval_shape(
        lambda rng: model.init(
            rng, jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, T), jnp.int32),
            jnp.ones((1, T), bool), jnp.ones((1, T, T), bool),
            jnp.zeros((1, T), jnp.int32)),
        jax.random.PRNGKey(0),
    )
    n = _assert_matches_init_shapes(
        shapes["params"],
        converted["params"] if "params" in converted else converted)
    res = {"leaves": n}
    if args.dry_run:
        return res

    # activation check: open-vocab detection on a deterministic canvas.
    from ovmono3d_tpu.models.gdino.tokenizer import BertTokenizer
    from ovmono3d_tpu.models.ovmono3d import OVMono3DLift

    tok = BertTokenizer(args.vocab)
    pipe = OVMono3DLift.build_2d_only(tok, gdino_kwargs=dict(
        compute_dtype=jnp.float32), gdino_size=800)
    pipe.gdino_params = jax.tree.map(jnp.asarray, converted)
    rngi = np.random.RandomState(0)
    img = (rngi.rand(480, 640, 3) * 255).astype(np.uint8)
    det = pipe.detect_2d(img, ["chair", "table", "cup"])
    assert np.all(np.isfinite(det["boxes"])), "GDINO boxes non-finite"
    assert np.all((det["scores"] >= 0) & (det["scores"] <= 1))
    res["n_detections"] = int(det["valid"].sum())
    res["top_score"] = float(det["scores"].max())
    logger.info("  gdino activation ok: %d detections, top score %.3f",
                res["n_detections"], res["top_score"])
    return res


def validate_sam(args) -> dict:
    import jax
    import jax.numpy as jnp

    from ovmono3d_tpu.models.sam import SamSegmenter
    from ovmono3d_tpu.models.vit import VisionTransformer
    from ovmono3d_tpu.utils.sam_convert import (
        convert_sam_encoder,
        convert_sam_segmenter,
    )

    if args.dry_run:
        from transformers import SamConfig, SamModel

        from ovmono3d_tpu.utils.hf_shims import hf_sam_to_original_keys

        hf = _materialize_meta(SamModel, SamConfig(
            vision_config=dict(
                hidden_size=1280, output_channels=256,
                num_hidden_layers=SAM_DEPTH, num_attention_heads=16,
                image_size=1024, patch_size=16, window_size=14,
                global_attn_indexes=[7, 15, 23, 31], mlp_dim=5120,
            )))
        sd = _state_np(hf)
        state = hf_sam_to_original_keys(
            {k: v for k, v in sd.items()
             if not k.startswith(("vision_encoder",
                                  "shared_image_embedding"))})
        for k, v in sd.items():
            if k.startswith("vision_encoder."):
                state["image_encoder." + k[len("vision_encoder."):]
                      .replace("patch_embed.projection", "patch_embed.proj")
                      .replace("layers.", "blocks.")
                      .replace("layer_norm1", "norm1")
                      .replace("layer_norm2", "norm2")
                      .replace("neck.conv1", "neck.0")
                      .replace("neck.norm1", "neck.1")
                      .replace("neck.conv2", "neck.2")
                      .replace("neck.norm2", "neck.3")] = v
    else:
        state = _load_torch(args.sam_ckpt)
    enc = convert_sam_encoder(state, depth=SAM_DEPTH)
    seg = convert_sam_segmenter(state)

    encoder = VisionTransformer(
        patch_size=16, embed_dim=1280, depth=SAM_DEPTH, num_heads=16,
        mlp_ratio=4.0, pretrain_grid=64, layerscale=False,
        use_depth_fusion=False, use_cls_token=False, window_size=14,
        global_blocks=(7, 15, 23, 31), use_rel_pos=True, neck_channels=256,
        dtype=jnp.float32,
    )
    enc_shapes = jax.eval_shape(
        lambda rng: encoder.init(rng, jnp.zeros((1, 1024, 1024, 3))),
        jax.random.PRNGKey(0))
    n1 = _assert_matches_init_shapes(enc_shapes["params"], enc)
    segmenter = SamSegmenter()
    seg_shapes = jax.eval_shape(
        lambda rng: segmenter.init(
            rng, jnp.zeros((1, 64, 64, 256)), jnp.zeros((1, 4)), 1024.0),
        jax.random.PRNGKey(0))
    n2 = _assert_matches_init_shapes(seg_shapes["params"], seg)
    res = {"leaves": n1 + n2}
    if args.dry_run:
        return res

    # activation check: encoder embedding + box-prompted mask.
    rngi = np.random.RandomState(0)
    img = jnp.asarray(rngi.rand(1, 1024, 1024, 3).astype(np.float32))
    embed = jax.jit(encoder.apply)({"params": enc}, img)
    if isinstance(embed, (list, tuple)):
        embed = embed[-1]
    masks, ious = jax.jit(segmenter.apply, static_argnums=3)(
        {"params": seg}, embed, jnp.asarray([[200., 200., 800., 800.]]),
        1024.0)
    assert np.all(np.isfinite(np.asarray(masks)))
    res["iou_pred"] = float(np.max(np.asarray(ious)))
    logger.info("  sam activation ok: best IoU pred %.3f", res["iou_pred"])
    return res


def validate_depth(args) -> dict:
    import jax
    import jax.numpy as jnp

    from ovmono3d_tpu.models.depth import DepthPro
    from ovmono3d_tpu.utils.depth_convert import convert_depth_pro

    if args.dry_run:
        from transformers import DepthProConfig
        from transformers.models.depth_pro.modeling_depth_pro import (
            DepthProForDepthEstimation,
        )

        vit = dict(model_type="dinov2", hidden_size=1024,
                   num_hidden_layers=24, num_attention_heads=16,
                   image_size=384, patch_size=16)
        cfg = DepthProConfig(patch_model_config=vit, image_model_config=vit,
                             fov_model_config=vit)
        hf = _materialize_meta(DepthProForDepthEstimation, cfg,
                               use_fov_model=True)
        state = _state_np(hf)
    else:
        # apple/DepthPro-hf format (transformers port of depth_pro.pt) —
        # utils/depth_convert.py docstring.
        state = _load_torch(args.depth_ckpt)
    converted = convert_depth_pro(state)

    model = DepthPro(dtype=jnp.float32)
    shapes = jax.eval_shape(
        lambda rng: model.init(rng, jnp.zeros((1, 1536, 1536, 3))),
        jax.random.PRNGKey(0))
    n = _assert_matches_init_shapes(shapes["params"], converted)
    res = {"leaves": n}
    if args.dry_run:
        return res

    rngi = np.random.RandomState(0)
    img = jnp.asarray(rngi.rand(1, 1536, 1536, 3).astype(np.float32))
    out = jax.jit(model.apply)({"params": converted}, img)
    inv = np.asarray(out["canonical_inverse_depth"])
    fov = np.asarray(out["fov_deg"])
    assert np.all(np.isfinite(inv)), "Depth-Pro produced non-finite depth"
    assert np.all(np.isfinite(fov))
    res["inv_depth_range"] = [float(inv.min()), float(inv.max())]
    res["fov_deg"] = float(fov[0])
    logger.info("  depth activation ok: inv range %s, fov %.1f deg",
                res["inv_depth_range"], res["fov_deg"])
    return res


# ------------------------------------------------------------------ eval

def run_evals(args):
    """Stage 4: the reference's eval protocol (run.sh) against real data."""
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    # 1. open-vocab oracle 2D detections from the GDINO checkpoint
    oracle_dir = out / "oracle2d"
    gen_cmd = [
        "generate_oracle2d.py", "--gdino-ckpt", args.gdino_ckpt,
        "--vocab", args.vocab, "--output-dir", str(oracle_dir),
        f"datasets.data_root={args.data_root}",
    ]
    # 2. oracle-2D AP3D eval with the LIFT checkpoint
    eval_cmd = [
        "eval_net.py", "--rcnn-ckpt", args.lift_ckpt,
        "--batch-size", "8",
        f"datasets.data_root={args.data_root}",
        "test.oracle2d=true",
        f"output_dir={out / 'eval'}",
    ]
    # 3. GEO pipeline with SAM + Depth-Pro
    geo_cmd = [
        "ovmono3d_geo.py", "--sam-ckpt", args.sam_ckpt, "--sam-arch",
        "vit_h", "--depth-ckpt", args.depth_ckpt, "--eval",
        f"datasets.data_root={args.data_root}",
        f"output_dir={out / 'geo'}",
    ]
    for cmd, mod in ((gen_cmd, "generate_oracle2d"),
                     (eval_cmd, "eval_net"),
                     (geo_cmd, "ovmono3d_geo")):
        logger.info("$ python tools/%s", " ".join(cmd))
        module = __import__(f"tools.{mod}", fromlist=["main"])
        sys.argv = cmd + list(args.opts)
        module.main()


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--lift-ckpt")
    ap.add_argument("--gdino-ckpt")
    ap.add_argument("--sam-ckpt")
    ap.add_argument("--depth-ckpt")
    ap.add_argument("--vocab", help="BERT vocab.txt for the tokenizer")
    ap.add_argument("--hf", action="store_true",
                    help="gdino/sam checkpoints are HuggingFace-hub state "
                         "dicts (shimmed via utils/hf_shims)")
    ap.add_argument("--data-root", default=None,
                    help="Omni3D datasets root; enables the AP3D eval stage")
    ap.add_argument("--output-dir", default="output/release_validation")
    ap.add_argument("--dry-run", action="store_true",
                    help="exercise convert + structure-match with zeroed "
                         "full-scale state dicts (no weights needed)")
    ap.add_argument("--families", default=",".join(FAMILIES),
                    help=f"comma list of {FAMILIES}")
    ap.add_argument("opts", nargs="*", default=[],
                    help="extra dotted config overrides for the eval stage")
    args = ap.parse_args(argv)

    fams = [f.strip() for f in args.families.split(",") if f.strip()]
    bad = set(fams) - set(FAMILIES)
    if bad:
        ap.error(f"unknown families: {sorted(bad)}")
    if not args.dry_run:
        missing = [f for f in fams
                   if getattr(args, f"{f}_ckpt".replace("-", "_")) is None]
        if missing:
            ap.error(f"--{missing[0]}-ckpt required (or --dry-run)")

    report = {}
    stages = {"lift": validate_lift, "gdino": validate_gdino,
              "sam": validate_sam, "depth": validate_depth}
    for fam in fams:
        t0 = time.time()
        logger.info("[%s] convert + structure check%s", fam,
                    " (dry run)" if args.dry_run else "")
        report[fam] = stages[fam](args)
        report[fam]["seconds"] = round(time.time() - t0, 1)
        logger.info("[%s] ok: %s", fam, report[fam])

    if args.data_root and not args.dry_run:
        run_evals(args)
    elif not args.dry_run:
        logger.info("no --data-root: skipping the AP3D eval stage "
                    "(see module docstring for the expected numbers)")

    logger.info("ALL OK: %s", {f: r["leaves"] for f, r in report.items()})
    return report


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""OVMono3D-GEO CLI: zero-shot geometric 3D boxes from masks + metric depth.

Reference tools/ovmono3d_geo.py + eval_ovmono3d_geo.py equivalent
(SURVEY.md §3.4): per image, for each (oracle/GDINO) 2D box with score >=
0.30 — SAM mask -> Depth-Pro metric depth -> unproject -> PCA yaw -> robust
min-max fit -> cuboid; predictions are saved per dataset and evaluated with
the Omni3D evaluator.

`--synthetic` exercises the full pipeline without checkpoints: GT-rendered
masks + exact depth maps stand in for SAM/Depth-Pro, so fitted boxes must
recover the GT (a strong end-to-end self-check of the geometry).
"""
from __future__ import annotations

import argparse
import logging
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

SCORE_THRESHOLD = 0.30  # reference ovmono3d_geo.py:274


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--output-dir", default="output/geo")
    ap.add_argument("--max-instances", type=int, default=16)
    ap.add_argument("--sam-ckpt", default=None,
                    help="official sam_vit_*.pth — converted + loaded into "
                         "the SAM encoder and prompt/mask decoder")
    ap.add_argument("--sam-arch", default="vit_b",
                    choices=("vit_b", "vit_l", "vit_h"),
                    help="SAM encoder size (reference uses vit_h, "
                         "ovmono3d_geo.py:270)")
    ap.add_argument("--depth-ckpt", default=None,
                    help="released Depth-Pro weights: a torch state dict in "
                         "the apple/DepthPro-hf format (.pt/.pth/.bin, "
                         "converted via utils/depth_convert.py), or a .npz "
                         "of flat '/'-joined Flax params")
    ap.add_argument("--depth-bf16", action="store_true",
                    help="run the Depth-Pro encoders in bf16 (~2x faster; "
                         "the HF cross-validation covers the f32 default "
                         "only, so metric depth may drift at bf16 "
                         "precision)")
    ap.add_argument("--gelu", default="erf", choices=("erf", "tanh"),
                    help="opt-in tanh approximate-gelu serving epilogue in "
                         "the SAM/Depth-Pro ViT trunks (models/vit.py "
                         "Mlp.gelu: erf costs ~1.2 ms per ViT-L fc1 "
                         "fusion, tanh is free; the reference runs "
                         "Depth-Pro in fp16, a coarser approximation)")
    ap.add_argument("--eval", action="store_true",
                    help="evaluate the written predictions against GT "
                         "(reference tools/eval_ovmono3d_geo.py)")
    ap.add_argument("--eval-only", action="store_true",
                    help="skip the SAM/Depth-Pro pipeline and evaluate "
                         "previously written geo_predictions_*.pkl (the "
                         "reference's separate eval_ovmono3d_geo.py step)")
    ap.add_argument("opts", nargs="*", default=[])
    args = ap.parse_args()
    if args.eval_only and args.synthetic:
        ap.error("--eval-only evaluates previously written "
                 "geo_predictions_*.pkl; it cannot be combined with "
                 "--synthetic (which runs the self-check pipeline)")
    return args


def evaluate_geo_predictions(records, preds_all, class_names):
    """Omni3D evaluation of GEO predictions over novel categories
    (reference eval_ovmono3d_geo.py:62-134)."""
    import jax.numpy as jnp

    from ovmono3d_tpu.evaluation.helper import Omni3DEvaluationHelper
    from ovmono3d_tpu.utils.geometry import cuboid_corners
    from ovmono3d_tpu.vis.logperf import print_ap_summary
    from tools.eval_net import _record_gt

    helper = Omni3DEvaluationHelper(
        len(class_names), class_names, novel_categories=set(class_names)
    )
    for rec in records:
        preds = preds_all.get(rec["image_id"], [])
        n = len(preds)
        corners = np.zeros((n, 8, 3), np.float32)
        for i, p in enumerate(preds):
            corners[i] = np.asarray(
                cuboid_corners(
                    jnp.asarray(
                        np.concatenate([p["center_cam"], p["dimensions"]])
                        .astype(np.float32)
                    ),
                    jnp.asarray(p["pose"], jnp.float32),
                )
            )
        pred = {
            "classes": np.asarray(
                [p["category_id"] for p in preds], np.int64
            ),
            "scores": np.asarray([p["score"] for p in preds], float),
            "boxes2d": np.asarray(
                [p["bbox2d"] for p in preds], float
            ).reshape(n, 4),
            "corners3d": corners,
            "center": np.asarray(
                [p["center_cam"] for p in preds], np.float32
            ).reshape(n, 3),
            "dims": np.asarray(
                [p["dimensions"] for p in preds], np.float32
            ).reshape(n, 3),
            "pose": np.asarray(
                [p["pose"] for p in preds], np.float32
            ).reshape(n, 3, 3),
        }
        helper.add_image("geo", _record_gt(rec), pred)
    res = helper.summarize_all()
    print_ap_summary(res["overall"], title="OVMono3D-GEO")
    return res


def synthetic_scene(rng, num_boxes=3, H=192, W=256, f=300.0):
    """A scene of disjoint axis-aligned boxes with exact front-face depth
    maps + masks (what perfect SAM + Depth-Pro would produce)."""
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    depth = np.zeros((H, W), np.float32)
    masks, gts = [], []
    xs = np.linspace(-0.8, 0.8, num_boxes)
    for i in range(num_boxes):
        z = rng.uniform(2.5, 4.0)
        dims = rng.uniform(0.3, 0.6, 3)
        cx, cy = xs[i] * z * 0.4, rng.uniform(-0.2, 0.2)
        z_front = z - dims[0] / 2
        mask = np.zeros((H, W), np.float32)
        for v in range(H):
            for u in range(W):
                x3 = z_front * (u - K[0, 2]) / f
                y3 = z_front * (v - K[1, 2]) / f
                if (abs(x3 - cx) <= dims[2] / 2
                        and abs(y3 - cy) <= dims[1] / 2):
                    mask[v, u] = 1.0
                    depth[v, u] = z_front
        masks.append(mask)
        gts.append({
            "center": np.array([cx, cy, z]),
            "dims": dims,
            "front_z": z_front,
        })
    return K, depth, masks, gts


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("ovmono3d.geo")

    import jax.numpy as jnp

    from ovmono3d_tpu.geo.pipeline import fit_box_from_mask_depth

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.synthetic:
        rng = np.random.RandomState(0)
        K, depth, masks, gts = synthetic_scene(rng)
        preds = []
        errs_center, errs_dims = [], []
        for mask, gt in zip(masks, gts):
            out = fit_box_from_mask_depth(
                jnp.asarray(mask), jnp.asarray(depth), jnp.asarray(K)
            )
            center = np.asarray(out["center"])
            dims = np.asarray(out["dims"])
            preds.append({
                "center_cam": center.tolist(),
                "dimensions": dims.tolist(),
                "pose": np.asarray(out["pose"]).tolist(),
                "score": 1.0,
            })
            # front-face fit: center ~ (cx, cy, front_z), two in-plane dims
            # recovered.
            want_c = np.array([gt["center"][0], gt["center"][1],
                               gt["front_z"]])
            errs_center.append(np.abs(center - want_c).max())
            errs_dims.append(
                np.abs(np.sort(dims)[1:] - np.sort(gt["dims"][1:])).max()
            )
        path = out_dir / "geo_predictions_synthetic.pkl"
        with open(path, "wb") as fh:
            pickle.dump(preds, fh)
        logger.info(
            "synthetic GEO: %d boxes fitted; max center err %.3f m, "
            "max dims err %.3f m -> %s",
            len(preds), max(errs_center), max(errs_dims), path,
        )
        ok = max(errs_center) < 0.1 and max(errs_dims) < 0.15
        print(f"GEO synthetic self-check: {'PASS' if ok else 'FAIL'}")
        if not ok:
            raise SystemExit(1)
        return

    # Real pipeline: SAM + DepthPro over dataset oracle boxes.
    import cv2
    import jax
    import jax.numpy as jnp

    from ovmono3d_tpu.config import load_config
    from ovmono3d_tpu.data.build import default_image_loader
    from ovmono3d_tpu.data.datasets import (
        filter_settings_from_cfg,
        get_dataset,
        merge_oracle2d,
        simple_register,
    )
    from ovmono3d_tpu.geo.pipeline import fit_box_from_mask_depth
    from ovmono3d_tpu.models.backbones import VIT_PRESETS
    from ovmono3d_tpu.models.depth import DepthPro, metric_depth
    from ovmono3d_tpu.models.sam import SamSegmenter
    from ovmono3d_tpu.models.vit import VisionTransformer

    cfg = load_config(args.config_file, overrides=args.opts)
    fs = filter_settings_from_cfg(cfg)
    cat_map = {n: i for i, n in enumerate(cfg.datasets.category_names)}

    if args.eval_only:
        # Reference two-command workflow: evaluate saved predictions only
        # (eval_ovmono3d_geo.py:98-134). NOTE: pickle is imported at module
        # scope — a local re-import here would shadow it for the WHOLE
        # function and break the earlier synthetic-path pickle.dump.
        for name in cfg.datasets.test_novel or cfg.datasets.test:
            json_path = (Path(cfg.datasets.data_root) / "Omni3D"
                         / f"{name}.json")
            simple_register(name, json_path, fs, cat_map)
            records = get_dataset(name)
            path = Path(args.output_dir) / f"geo_predictions_{name}.pkl"
            with open(path, "rb") as fh:
                preds_all = pickle.load(fh)
            logger.info("evaluating %s (%d images)", path, len(preds_all))
            evaluate_geo_predictions(
                records, preds_all, list(cfg.datasets.category_names)
            )
        return

    # Raw SAM image encoder (windowed + rel-pos ViT, 256-ch neck) — the
    # segment_anything semantics, no SFP harness (that is only for SAM as a
    # detection backbone).
    # The Depth-Pro network is a fixed-1536 architecture (the fusion chain
    # upsamples base*2^6; depth_pro transforms resize every input to 1536).
    S_SAM, S_DEPTH = 1024, 1536
    # Per-arch trunk dims AND global-attention block indices (the official
    # segment_anything build_sam.py encoder_global_attn_indexes — every
    # 1/4-depth block; vit_b's (2, 5, 8, 11) from the preset would be wrong
    # for the larger trunks and their checkpoints could not load).
    arch = {
        "vit_b": dict(embed_dim=768, depth=12, num_heads=12,
                      global_blocks=(2, 5, 8, 11)),
        "vit_l": dict(embed_dim=1024, depth=24, num_heads=16,
                      global_blocks=(5, 11, 17, 23)),
        "vit_h": dict(embed_dim=1280, depth=32, num_heads=16,
                      global_blocks=(7, 15, 23, 31)),
    }[args.sam_arch]
    sam_encoder = VisionTransformer(
        use_depth_fusion=False, gelu=args.gelu,
        **{**VIT_PRESETS["sam"], **arch}
    )
    segmenter = SamSegmenter()
    # f32 is the numerics-validated path (tests/test_hf_crossval.py);
    # bf16 is an opt-in speed/precision trade.
    depth_model = DepthPro(
        dtype=jnp.bfloat16 if args.depth_bf16 else jnp.float32,
        gelu=args.gelu,
    )
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    sam_params = jax.jit(sam_encoder.init)(
        k0, jnp.zeros((1, S_SAM, S_SAM, 3))
    )
    seg_params = jax.jit(segmenter.init)(
        k1, jnp.zeros((1, 64, 64, 256)), jnp.zeros((1, 4)), float(S_SAM)
    )
    depth_params = jax.jit(depth_model.init)(
        k2, jnp.zeros((1, S_DEPTH, S_DEPTH, 3))
    )
    if args.sam_ckpt:
        from ovmono3d_tpu.utils.load import load_sam_params

        sam_params, seg_params = load_sam_params(
            sam_params, seg_params, args.sam_ckpt, depth=arch["depth"]
        )
    if args.depth_ckpt:
        if args.depth_ckpt.endswith(".npz"):
            from ovmono3d_tpu.utils.load import load_npz_params

            depth_params = load_npz_params(depth_params, args.depth_ckpt)
        else:
            from ovmono3d_tpu.utils.checkpoint_convert import (
                merge_into_params,
            )
            from ovmono3d_tpu.utils.depth_convert import convert_depth_pro
            from ovmono3d_tpu.utils.load import load_torch_state

            depth_params = merge_into_params(
                depth_params,
                convert_depth_pro(load_torch_state(args.depth_ckpt)),
                ("params",),
            )

    embed_fn = jax.jit(
        lambda p, img: sam_encoder.apply(p, img)["last_feat"]
    )
    seg_fn = jax.jit(
        lambda p, e, b: segmenter.apply(p, e, b, float(S_SAM))
    )
    depth_fn = jax.jit(depth_model.apply)
    logger.info("GEO models built; running %s",
                cfg.datasets.test_novel or cfg.datasets.test)

    image_loader = default_image_loader(cfg.datasets.data_root)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    for name in cfg.datasets.test_novel or cfg.datasets.test:
        json_path = Path(cfg.datasets.data_root) / "Omni3D" / f"{name}.json"
        simple_register(name, json_path, fs, cat_map)
        records = get_dataset(name)
        from ovmono3d_tpu.config import oracle2d_file

        # GEO runs on the novel split (reference ovmono3d_geo.py:261-264).
        oracle_path = oracle2d_file(cfg.datasets, name, "novel")
        if oracle_path:
            records = merge_oracle2d(records, oracle_path)
        preds_all = {}
        for rec in records:
            image = image_loader(rec)
            if image is None:
                continue
            H, W = image.shape[:2]
            K = np.asarray(rec["K"], np.float32)
            # Depth-Pro metric depth at the original resolution.
            dimg = cv2.resize(image.astype(np.float32) / 255.0,
                              (S_DEPTH, S_DEPTH))
            dout = depth_fn(depth_params,
                            jnp.asarray((dimg - mean) / std)[None])
            depth_full = np.asarray(
                metric_depth(
                    dout["canonical_inverse_depth"],
                    jnp.asarray([K[0, 0] * S_DEPTH / W]), S_DEPTH,
                )[0]
            )
            depth_map = cv2.resize(depth_full, (W, H))
            # SAM embedding once per image; masks per oracle box.
            scale = S_SAM / max(H, W)
            simg = cv2.resize(image.astype(np.float32) / 255.0,
                              (int(W * scale), int(H * scale)))
            canvas = np.zeros((S_SAM, S_SAM, 3), np.float32)
            canvas[: simg.shape[0], : simg.shape[1]] = (simg - mean) / std
            embed = embed_fn(sam_params, jnp.asarray(canvas)[None])
            preds = []
            # Threshold FIRST (reference ovmono3d_geo.py:274 filters over
            # all boxes), then keep the highest-score instances — slicing
            # raw file order could spend every slot on sub-threshold boxes.
            dets = sorted(
                (d for d in rec.get("oracle2d", [])
                 if d["score"] >= SCORE_THRESHOLD),
                key=lambda d: -d["score"],
            )
            for det in dets[: args.max_instances]:
                box = np.asarray(det["bbox2d"], np.float32) * scale
                masks, iou = seg_fn(seg_params, embed,
                                    jnp.asarray(box)[None])
                m = np.asarray(masks[0, 2])  # largest (index 2, L309)
                # The mask covers the PADDED square canvas — crop the
                # content region before resizing to (W, H), else masks on
                # non-square images compress/shift by H/W (the crop
                # segment_anything's postprocess_masks performs).
                mh, mw = m.shape
                ch = max(1, int(round(mh * (H * scale) / S_SAM)))
                cw = max(1, int(round(mw * (W * scale) / S_SAM)))
                mask_img = cv2.resize(m[:ch, :cw], (W, H)) > 0
                out = fit_box_from_mask_depth(
                    jnp.asarray(mask_img, jnp.float32),
                    jnp.asarray(depth_map), jnp.asarray(K),
                )
                if not bool(np.asarray(out["valid"])):
                    # Empty effective mask (SAM produced nothing usable /
                    # no positive depth inside it) — exporting the
                    # flagged-invalid zeros would pollute the eval JSON.
                    continue
                preds.append({
                    "category_id": det["category_id"],
                    "score": det["score"],
                    "bbox2d": det["bbox2d"],
                    "center_cam": np.asarray(out["center"]).tolist(),
                    "dimensions": np.asarray(out["dims"]).tolist(),
                    "pose": np.asarray(out["pose"]).tolist(),
                })
            preds_all[rec["image_id"]] = preds
        path = out_dir / f"geo_predictions_{name}.pkl"
        with open(path, "wb") as fh:
            pickle.dump(preds_all, fh)
        logger.info("%s: %d images -> %s", name, len(preds_all), path)
        if args.eval:
            evaluate_geo_predictions(
                records, preds_all, list(cfg.datasets.category_names)
            )


if __name__ == "__main__":
    main()

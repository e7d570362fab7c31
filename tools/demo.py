#!/usr/bin/env python
"""Open-vocabulary demo: images + text labels -> rendered 3D cuboids.

Reference demo/demo.py equivalent (SURVEY.md §3.3):

  python tools/demo.py --input-folder imgs/ --labels "chair,table,lamp" \
      [--labels-file labels.json]   # per-image prompts instead of --labels
      [--config-file configs/OVMono3D_dinov2_SFP.yaml] \
      [--focal-length F] [--principal-point X Y] \
      [--vocab path/to/bert_vocab.txt] [--output-dir out/]

Without intrinsics, uses the reference's f = 4*h/2 heuristic
(demo/demo.py:63-76). Without converted checkpoints this exercises the full
pipeline with random weights (boxes will be arbitrary) — checkpoint loading
hooks in via --rcnn-ckpt/--gdino-ckpt.
"""
from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-folder", required=True)
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--labels",
                   help="comma-separated category prompts (same prompts "
                        "for every image)")
    g.add_argument("--labels-file",
                   help="JSON mapping image basename (no extension) -> "
                        "list of category prompts; images mapped to [] "
                        "are skipped (reference demo.py --labels-file, "
                        "datasets/coco_examples/labels.json format)")
    ap.add_argument("--config-file",
                    default="configs/OVMono3D_dinov2_SFP.yaml")
    ap.add_argument("--focal-length", type=float, default=0.0)
    ap.add_argument("--principal-point", type=float, nargs=2, default=None)
    ap.add_argument("--vocab", default=None, help="BERT vocab.txt")
    ap.add_argument("--rcnn-ckpt", default=None,
                    help="released ovmono3d_lift.pth (torch, detectron2 "
                         "format) — converted + loaded into the cube model")
    ap.add_argument("--gdino-ckpt", default=None,
                    help="released GroundingDINO SwinB .pth — converted + "
                         "loaded into the open-vocab detector")
    ap.add_argument("--output-dir", default="output/demo")
    ap.add_argument("--threshold", type=float, default=0.2)
    ap.add_argument("opts", nargs="*", default=[])
    return ap.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("ovmono3d.demo")

    import dataclasses

    from ovmono3d_tpu.config import load_config
    from ovmono3d_tpu.models.gdino.tokenizer import BertTokenizer
    from ovmono3d_tpu.models.ovmono3d import OVMono3DLift, default_focal_K
    from ovmono3d_tpu.utils.util import imread_rgb, imwrite_rgb, list_images
    from ovmono3d_tpu.vis.draw import scene_panel

    cfg = load_config(args.config_file, overrides=args.opts)
    cats_per_img = None
    if args.labels_file:
        import json

        cats_per_img = json.load(open(args.labels_file))
        categories = sorted({c for v in cats_per_img.values() for c in v})
    else:
        categories = [c.strip() for c in args.labels.split(",") if c.strip()]

    if args.vocab:
        tok = BertTokenizer(args.vocab)
    else:
        # Fallback word-level vocab over the prompt words (random-weight
        # demo runs; real runs ship the bert vocab with the checkpoint).
        words = sorted({w for c in categories for w in c.lower().split()})
        vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, ".": 4}
        vocab.update({w: 5 + i for i, w in enumerate(words)})
        tok = BertTokenizer(vocab)
        logger.warning("no --vocab given; using a prompt-local vocab")

    priors = None
    if args.rcnn_ckpt:
        # Released checkpoints carry the priors as parameters
        # (roi_heads.py:117-143) — recover them before building.
        from ovmono3d_tpu.utils.lift_convert import extract_priors
        from ovmono3d_tpu.utils.load import load_torch_state

        priors = extract_priors(load_torch_state(args.rcnn_ckpt))
        if priors is not None:
            logger.info("extracted priors from %s", args.rcnn_ckpt)
    pipe = OVMono3DLift.build(cfg, tok, priors=priors)
    logger.info("pipeline built (%d categories)", len(categories))

    # Released-weight loading (reference demo.py:144-150 + the GDINO ckpt
    # load at roi_heads_gdino.py:87-91).
    if args.rcnn_ckpt:
        from ovmono3d_tpu.utils.load import load_rcnn_params

        pipe = dataclasses.replace(
            pipe,
            rcnn_params=load_rcnn_params(pipe.rcnn_params, args.rcnn_ckpt,
                                         cfg.model),
        )
    if args.gdino_ckpt:
        from ovmono3d_tpu.utils.load import load_gdino_params

        pipe = dataclasses.replace(
            pipe,
            gdino_params=load_gdino_params(pipe.gdino_params,
                                           args.gdino_ckpt),
        )

    out_dir = Path(args.output_dir)
    for path in list_images(args.input_folder):
        img_cats = categories
        if cats_per_img is not None:
            img_cats = cats_per_img.get(path.stem, [])
            if not img_cats:  # unmapped / empty -> skip (demo.py:53-55)
                continue
        image = imread_rgb(path)
        h, w = image.shape[:2]
        if args.focal_length > 0:
            pp = args.principal_point or (w / 2, h / 2)
            K = np.array(
                [[args.focal_length, 0, pp[0]],
                 [0, args.focal_length, pp[1]], [0, 0, 1]], np.float32
            )
        else:
            K = default_focal_K(h, w)
        det = pipe.predict(image, K, img_cats)
        keep = np.asarray(det.scores) >= args.threshold
        import jax

        det = jax.tree.map(
            lambda x: np.asarray(x) if x is not None else None, det,
            is_leaf=lambda x: x is None,
        )
        det = det.replace(valid=np.asarray(det.valid) & keep)
        panel = scene_panel(image, det, K, class_names=img_cats)
        out_path = out_dir / f"{path.stem}_3d.png"
        imwrite_rgb(out_path, panel)
        n = int(det.valid.sum())
        logger.info("%s: %d detections -> %s", path.name, n, out_path)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Offline evaluation of saved prediction files (reference eval.py's
`evaluate_predictions_from_file`, eval.py:1839; SURVEY.md §2.1 #20).

  python tools/eval_predictions.py --predictions preds.json \
      --dataset-json datasets/Omni3D/Objectron_test.json \
      --categories "bicycle,books,..."

Prediction JSON: list of per-image dicts
  {"image_id": ..., "instances": [{"category_id", "score", "bbox" (XYWH),
    "center_cam", "dimensions", "pose"}, ...]}
(the same schema the reference dumps from its evaluator).
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--predictions", required=True)
    ap.add_argument("--dataset-json", required=True)
    ap.add_argument("--categories", required=True,
                    help="comma-separated category names (model order)")
    # Test-protocol GT filters (eval_net applies cfg.test values; the
    # LOADER defaults 0.01/0.99 would keep occluded/truncated GTs the
    # online protocol ignores, scoring the same predictions differently).
    ap.add_argument("--visibility-thres", type=float, default=0.5)
    ap.add_argument("--truncation-thres", type=float, default=0.5)
    ap.add_argument("--eval-prox", choices=["auto", "on", "off"],
                    default="auto",
                    help="proximity evaluation for non-exhaustive datasets"
                    " (auto: on for Objectron/SUNRGBD, like eval_net and"
                    " reference omni3d_evaluation.py:263)")
    return ap.parse_args()


def instances_to_pred(instances: list[dict]):
    from tools.eval_net import _np_cuboid_corners

    classes, scores, boxes2d = [], [], []
    centers, dims, poses = [], [], []
    for inst in instances:
        classes.append(inst["category_id"])
        scores.append(inst.get("score", 1.0))
        b = inst.get("bbox", [0, 0, 0, 0])
        boxes2d.append([b[0], b[1], b[0] + b[2], b[1] + b[3]])
        centers.append(np.asarray(inst.get("center_cam", [0, 0, 1]),
                                  np.float32))
        dims.append(np.asarray(inst.get("dimensions", [1, 1, 1]),
                               np.float32))
        poses.append(np.asarray(inst.get("pose", np.eye(3).tolist()),
                                np.float32))
    n = len(classes)
    centers_a = np.asarray(centers, np.float32).reshape(n, 3)
    dims_a = np.asarray(dims, np.float32).reshape(n, 3)
    poses_a = np.asarray(poses, np.float32).reshape(n, 3, 3)
    # Batched numpy corners: one eager jnp dispatch PER INSTANCE would pay
    # multi-ms tunnel latency each over a 10k-instance file (CLAUDE.md).
    corners = (
        _np_cuboid_corners(centers_a, dims_a, poses_a)
        if n else np.zeros((0, 8, 3), np.float32)
    )
    return {
        "classes": np.asarray(classes, np.int64),
        "scores": np.asarray(scores, float),
        "boxes2d": np.asarray(boxes2d, float).reshape(n, 4),
        "corners3d": np.asarray(corners, np.float32).reshape(n, 8, 3),
        "center": centers_a,
        "dims": dims_a,
        "pose": poses_a,
    }


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)

    from ovmono3d_tpu.data.datasets import FilterSettings, load_omni3d_json
    from ovmono3d_tpu.evaluation.helper import Omni3DEvaluationHelper
    from tools.eval_net import _record_gt
    from ovmono3d_tpu.vis.logperf import (
        print_ap_per_category,
        print_ap_summary,
    )

    categories = [c.strip() for c in args.categories.split(",")]
    cat_map = {n: i for i, n in enumerate(categories)}
    fs = FilterSettings(
        category_names=tuple(categories),
        visibility_thres=args.visibility_thres,
        truncation_thres=args.truncation_thres,
    )
    records = load_omni3d_json(args.dataset_json, fs, cat_map)

    with open(args.predictions) as f:
        preds = json.load(f)
    by_img: dict = {}
    for entry in preds:
        if entry["image_id"] in by_img:
            logging.warning("duplicate predictions for image %s — keeping "
                            "the first entry", entry["image_id"])
            continue
        by_img[entry["image_id"]] = entry["instances"]

    ds_name = Path(args.dataset_json).stem
    eval_prox = (
        args.eval_prox == "on"
        or (args.eval_prox == "auto"
            and ("Objectron" in ds_name or "SUNRGBD" in ds_name))
    )

    helper = Omni3DEvaluationHelper(len(categories), categories)
    n_eval = n_missing = 0
    # Iterate the DATASET, not the predictions file: images absent from
    # the file must still contribute their GT (missed detections), and
    # extra/duplicate prediction entries must not add GT twice (reference
    # evaluate_predictions_from_file semantics, eval.py:1839).
    for rec in records:
        instances = by_img.get(rec["image_id"])
        if instances is None:
            instances = []
            n_missing += 1
        helper.add_image(
            "offline", _record_gt(rec), instances_to_pred(instances),
            eval_prox=eval_prox,
        )
        n_eval += 1
    logging.info("evaluated %d images (%d without predictions), "
                 "eval_prox=%s", n_eval, n_missing, eval_prox)
    res = helper.summarize_all()
    print_ap_summary(res["overall"], title="offline predictions")
    print_ap_per_category(res["per_category_AP3D"])


if __name__ == "__main__":
    main()

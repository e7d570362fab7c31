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
    return ap.parse_args()


def instances_to_pred(instances: list[dict]):
    import jax.numpy as jnp

    from ovmono3d_tpu.utils.geometry import cuboid_corners

    classes, scores, boxes2d, corners = [], [], [], []
    centers, dims, poses = [], [], []
    for inst in instances:
        classes.append(inst["category_id"])
        scores.append(inst.get("score", 1.0))
        b = inst.get("bbox", [0, 0, 0, 0])
        boxes2d.append([b[0], b[1], b[0] + b[2], b[1] + b[3]])
        center = np.asarray(inst.get("center_cam", [0, 0, 1]), np.float32)
        dd = np.asarray(inst.get("dimensions", [1, 1, 1]), np.float32)
        pose = np.asarray(inst.get("pose", np.eye(3).tolist()), np.float32)
        centers.append(center)
        dims.append(dd)
        poses.append(pose)
        corners.append(
            np.asarray(
                cuboid_corners(
                    jnp.asarray(np.concatenate([center, dd])),
                    jnp.asarray(pose),
                )
            )
        )
    n = len(classes)
    return {
        "classes": np.asarray(classes, np.int64),
        "scores": np.asarray(scores, float),
        "boxes2d": np.asarray(boxes2d, float).reshape(n, 4),
        "corners3d": np.asarray(corners, np.float32).reshape(n, 8, 3),
        "center": np.asarray(centers, np.float32).reshape(n, 3),
        "dims": np.asarray(dims, np.float32).reshape(n, 3),
        "pose": np.asarray(poses, np.float32).reshape(n, 3, 3),
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
    fs = FilterSettings(category_names=tuple(categories))
    records = load_omni3d_json(args.dataset_json, fs, cat_map)
    by_id = {r["image_id"]: r for r in records}

    with open(args.predictions) as f:
        preds = json.load(f)

    helper = Omni3DEvaluationHelper(len(categories), categories)
    n_eval = 0
    for entry in preds:
        rec = by_id.get(entry["image_id"])
        if rec is None:
            continue
        helper.add_image(
            "offline", _record_gt(rec), instances_to_pred(entry["instances"])
        )
        n_eval += 1
    logging.info("evaluated %d images", n_eval)
    res = helper.summarize_all()
    print_ap_summary(res["overall"], title="offline predictions")
    print_ap_per_category(res["per_category_AP3D"])


if __name__ == "__main__":
    main()

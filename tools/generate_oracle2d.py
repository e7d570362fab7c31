#!/usr/bin/env python
"""Generate oracle-2D detection JSONs with the open-vocab GDINO detector.

The reference's evaluation protocol consumes precomputed GroundingDINO
detection files (`ORACLE2D_FILES[eval_mode][cat_mode][dataset]`, reference
config.py:41-76, merged into the test dicts by
build.py:45-54 merge_oracle2d_to_detection_dicts). Those JSONs are shipped
artifacts of the reference author's cluster; this tool regenerates them
with OUR GroundingDINO so the full open-vocab eval loop is reproducible:

  python tools/generate_oracle2d.py --config-file configs/... \
      --gdino-ckpt groundingdino_swinb.pth --vocab vocab.txt \
      --output-dir out/oracle2d [test.cat_mode=novel ...]
  python tools/eval_net.py --config-file configs/... \
      "datasets.oracle2d_files.target_aware.novel.<ds>=out/oracle2d/<ds>_novel.json"

Prompting follows the eval mode (datasets.oracle2d_eval_mode):
  target_aware     GDINO is prompted with the target dataset's category set
                   (the per-dataset novel split for cat_mode=novel, else the
                   categories annotated in that dataset).
  previous_metric  prompted with the full configured category list.

Output schema per dataset: a JSON list of
  {"image_id", "bbox2d" [x1,y1,x2,y2 px], "category_id" (contiguous model
   id), "score"}
— exactly what `data.datasets.merge_oracle2d` consumes.
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
    ap.add_argument("--config-file", default=None)
    ap.add_argument("--synthetic", action="store_true",
                    help="run over generated records with random images "
                         "(schema/flow self-check)")
    ap.add_argument("--gdino-ckpt", default=None,
                    help="released GroundingDINO SwinB .pth — converted + "
                         "loaded")
    ap.add_argument("--vocab", default=None, help="BERT vocab.txt")
    ap.add_argument("--output-dir", default="output/oracle2d")
    ap.add_argument("--score-threshold", type=float, default=0.0,
                    help="drop detections below this score (the detector "
                         "already applies the reference box_threshold)")
    ap.add_argument("--topk", type=int, default=100,
                    help="max detections kept per image")
    ap.add_argument("opts", nargs="*", default=[])
    return ap.parse_args()


def dataset_prompts(cfg, name, records, class_names):
    """Category prompt list for one test dataset, per the eval mode."""
    if cfg.datasets.oracle2d_eval_mode == "previous_metric":
        return list(class_names)
    # target_aware
    if cfg.test.cat_mode == "novel":
        from ovmono3d_tpu.data.builtin import get_omni3d_categories

        try:
            return sorted(get_omni3d_categories(name))
        except ValueError:
            pass
    present = sorted({
        a["category_id"] for r in records for a in r.get("annotations", [])
        if a["category_id"] >= 0
    })
    return [class_names[c] for c in present if c < len(class_names)]


def generate_for_dataset(pipe, records, image_loader, prompts, cat_map,
                         score_threshold, dataset_name):
    logger = logging.getLogger("ovmono3d.oracle2d")
    dets_out = []
    import time

    def load(rec):
        if image_loader is not None:
            return image_loader(rec)
        # synthetic self-check: deterministic random image
        rng = np.random.RandomState(rec["image_id"] % (2**31))
        return (rng.rand(rec["height"], rec["width"], 3) * 255).astype(
            np.uint8)

    t0 = t_mark = time.perf_counter()
    # detect_2d_stream: chunked-scan submit-ahead driver — one dispatch +
    # one sync per chunk of images instead of per image (the whole-dataset
    # GDINO sweep this tool runs is the streaming driver's home turf).
    stream = pipe.detect_2d_stream((load(r) for r in records), prompts)
    for i, (rec, det) in enumerate(zip(records, stream)):
        for j in np.flatnonzero(det["valid"]):
            score = float(det["scores"][j])
            if score < score_threshold:
                continue
            name = prompts[int(det["classes"][j])]
            if name not in cat_map:
                continue
            dets_out.append({
                "image_id": rec["image_id"],
                "bbox2d": [float(v) for v in det["boxes"][j]],
                "category_id": cat_map[name],
                "score": score,
            })
        if time.perf_counter() - t_mark > 10.0:
            per = (time.perf_counter() - t0) / (i + 1)
            logger.info("%s: %d/%d images, %.3f s/img (eta %.0f s)",
                        dataset_name, i + 1, len(records), per,
                        per * (len(records) - i - 1))
            t_mark = time.perf_counter()
    return dets_out


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("ovmono3d.oracle2d")

    import dataclasses

    from ovmono3d_tpu.config import load_config
    from ovmono3d_tpu.models.gdino.tokenizer import BertTokenizer
    from ovmono3d_tpu.models.ovmono3d import OVMono3DLift

    cfg = load_config(args.config_file, overrides=args.opts)
    class_names = list(cfg.datasets.category_names) or [
        str(i) for i in range(cfg.model.num_classes)
    ]
    cat_map = {n: i for i, n in enumerate(class_names)}

    if args.synthetic:
        from tools.train_net import synthetic_records

        datasets = {
            "synthetic_a": synthetic_records(4, cfg.model.num_classes,
                                             seed=7),
            "synthetic_b": synthetic_records(4, cfg.model.num_classes,
                                             seed=11),
        }
        image_loader = None
    else:
        from ovmono3d_tpu.data.build import default_image_loader
        from ovmono3d_tpu.data.datasets import (
            filter_settings_from_cfg,
            get_dataset,
            simple_register,
        )

        fs = filter_settings_from_cfg(cfg)
        mode = cfg.test.cat_mode
        names = (cfg.datasets.test_novel if mode == "novel"
                 else cfg.datasets.test_base)
        datasets = {}
        for name in names:
            json_path = (Path(cfg.datasets.data_root) / "Omni3D"
                         / f"{name}.json")
            simple_register(name, json_path, fs, cat_map)
            datasets[name] = get_dataset(name)
        image_loader = default_image_loader(cfg.datasets.data_root)

    if args.vocab:
        tok = BertTokenizer(args.vocab)
    else:
        words = sorted({w for c in class_names for w in c.lower().split()})
        vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, ".": 4}
        vocab.update({w: 5 + i for i, w in enumerate(words)})
        tok = BertTokenizer(vocab)
        logger.warning("no --vocab given; using a category-local vocab")

    pipe = OVMono3DLift.build_2d_only(tok)
    # detect_2d's output slots are sized by detect_topk (max_detections
    # only governs the 3D lift stage, unused by this 2D-only tool)
    pipe = dataclasses.replace(pipe, detect_topk=args.topk)
    if args.gdino_ckpt:
        from ovmono3d_tpu.utils.load import load_gdino_params

        pipe = dataclasses.replace(
            pipe,
            gdino_params=load_gdino_params(pipe.gdino_params,
                                           args.gdino_ckpt),
        )

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    eval_mode = cfg.datasets.oracle2d_eval_mode
    cat_mode = cfg.test.cat_mode
    for name, records in datasets.items():
        prompts = dataset_prompts(cfg, name, records, class_names)
        logger.info("%s: %d images, %d category prompts", name,
                    len(records), len(prompts))
        dets = generate_for_dataset(pipe, records, image_loader, prompts,
                                    cat_map, args.score_threshold, name)
        out_path = out_dir / f"{name}_{cat_mode}.json"
        with open(out_path, "w") as fh:
            json.dump(dets, fh)
        logger.info("%s: wrote %d detections -> %s", name, len(dets),
                    out_path)
        print(f"datasets.oracle2d_files.{eval_mode}.{cat_mode}.{name}="
              f"{out_path}")


if __name__ == "__main__":
    main()

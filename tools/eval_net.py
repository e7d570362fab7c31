#!/usr/bin/env python
"""Evaluation CLI: oracle-2D protocol AP2D/AP3D/NHD (reference --eval-only
flow, SURVEY.md §3.2).

Usage:
  python tools/eval_net.py --config-file configs/OVMono3D_dinov2_SFP.yaml \
      [--checkpoint output/model_recent] [--synthetic] [key=value ...]

Per test dataset: merge the oracle 2D JSON
(datasets.oracle2d_files[eval_mode][cat_mode][name], reference
config.py:41-76),
run the oracle inference path, and feed the Omni3D evaluator (2D + 3D modes
with the fixed exact-3D-IoU dispatch). `--synthetic` self-checks the loop by
evaluating the model on generated data.
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
    ap.add_argument("--config-file", default=None)
    ap.add_argument("--checkpoint", default=None,
                    help="orbax checkpoint dir/name from tools/train_net.py")
    ap.add_argument("--rcnn-ckpt", default=None,
                    help="released ovmono3d_lift.pth (torch, detectron2 "
                         "format) — converted + loaded")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard eval batches over all devices (the "
                         "reference's multi-GPU InferenceSampler eval, "
                         "omni3d_evaluation.py:633-723; TPU-native: "
                         "batch-dim NamedSharding over a data mesh)")
    ap.add_argument("--dump-predictions", default=None,
                    help="write per-image predictions JSON (the reference's "
                         "instances_predictions.pth equivalent)")
    ap.add_argument("--vis-dir", default=None,
                    help="write pred-vs-GT 3x2 panel JPEGs here")
    ap.add_argument("--vis-period", type=int, default=50,
                    help="panel every Nth eval image (reference vis.py:105)")
    ap.add_argument("--priors", default=None,
                    help="priors.npz written by train_net (dims/z_scales/"
                         "z_stats); required by dims_priors_enabled / "
                         "cluster_bins configs. Defaults to priors.npz "
                         "next to --checkpoint when present.")
    ap.add_argument("--category-meta", default=None,
                    help="category-meta JSON (configs/category_meta*.json) "
                         "providing the model's class names/ID map, as the "
                         "reference eval registers from category_objectron"
                         ".json (train_net.py:404-416)")
    ap.add_argument("opts", nargs="*", default=[])
    return ap.parse_args()


def make_run_fn(model):
    """Jitted inference step, built ONCE and shared across test datasets —
    a fresh @jax.jit per dataset would re-trace (and, on a compile-cache
    miss, re-upload through the size-capped axon relay) the identical
    graph for every dataset.

    With oracle_* in the batch (test.oracle2d merge done upstream) the RPN
    + box head are bypassed (reference GT-oracle protocol); without them
    the model's OWN RPN -> box-head detections feed the cube branch
    (reference --eval-only without oracle files,
    /root/reference/cubercnn/modeling/roi_heads/roi_heads.py:798-843)."""
    import jax

    @jax.jit
    def run(params, batch, depth=None):
        # `depth`: prompt-depth [B, h, w, 1] for use_depth_fusion trunks —
        # dropping it would silently evaluate the model without an input
        # it was trained with. The oracle-key branch is a trace-time
        # decision (different batch pytree -> separate specialization).
        oracle = {}
        if "oracle_boxes" in batch:
            oracle = dict(
                oracle_boxes=batch["oracle_boxes"],
                oracle_classes=batch["oracle_classes"],
                oracle_scores=batch["oracle_scores"],
                oracle_valid=batch["oracle_valid"],
            )
        return model.apply(
            params, batch["image"], batch["K"], batch["im_hw"],
            batch["im_scale_ratio"], depth, **oracle,
        )

    return run


def evaluate_dataset(cfg, model, params, records, image_loader, batch_size,
                     helper, dataset_name, dump_path=None, vis_dir=None,
                     vis_period=50, mesh=None, run=None):
    """Oracle-path inference over a record list, accumulated into the SHARED
    multi-dataset `helper` (reference do_test accumulates every test dataset
    into one Omni3DEvaluationHelper, omni3d_evaluation.py:427-620).

    With `mesh`, each batch's leading axis is sharded over the mesh's data
    axis (params replicated by the caller) — per-image inference is
    embarrassingly parallel, so XLA SPMDs the step over chips with no
    collectives (the reference's rank-sharded eval, SURVEY.md §2.2)."""
    import jax
    import jax.numpy as jnp

    from ovmono3d_tpu.data.build import build_test_iterator

    # Proximity evaluation for non-exhaustively annotated datasets
    # (reference omni3d_evaluation.py:263).
    eval_prox = "Objectron" in dataset_name or "SUNRGBD" in dataset_name

    # Multi-host: disjoint record shard per host (InferenceSampler), with
    # the per-image results allgathered before accumulation so every host's
    # helper sees the full dataset (reference comm.gather to rank 0,
    # omni3d_evaluation.py:717-723).
    from ovmono3d_tpu.parallel.mesh import gather_objects, process_shard

    records = process_shard(records)

    if run is None:
        run = make_run_fn(model)

    # Separate data / pure-compute timers + periodic ETA, the reference's
    # inference_on_dataset instrumentation (omni3d_evaluation.py:637-715).
    import time

    logger = logging.getLogger("ovmono3d.eval")
    t_data = t_compute = 0.0
    t_start = t_mark = time.perf_counter()
    n_total = len(records)

    n_done = 0
    dumped = []
    collected = []
    # Oracle slots must hold the full 100-det protocol (the default
    # max_oracle=64 would truncate oracle JSONs in FILE order, silently
    # dropping detections 65-100 from AP).
    it = iter(build_test_iterator(
        cfg, records, batch_size, image_loader,
        max_oracle=max(64, cfg.test.detections_per_image),
    ))
    while True:
        t0 = time.perf_counter()
        nxt = next(it, None)
        t_data += time.perf_counter() - t0
        if nxt is None:
            break
        chunk, batch = nxt
        t0 = time.perf_counter()
        if mesh is not None:
            from ovmono3d_tpu.parallel.mesh import batch_sharding

            sharding = batch_sharding(mesh)
            # device_put on the HOST arrays: shards split host-side and
            # upload once each — jnp.asarray first would commit the whole
            # feed to device 0 and then reshard (two tunnel transfers).
            batch = {
                k: jax.device_put(np.asarray(v), sharding)
                for k, v in batch.items()
            }
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        depth = batch.pop("depth", None)
        det = run(params, batch, depth)
        det = jax.device_get(det)
        t_compute += time.perf_counter() - t0
        if time.perf_counter() - t_mark > 10.0 and n_done:
            per = (time.perf_counter() - t_start) / n_done
            logger.info(
                "%s: %d/%d images, %.3f s/img (eta %.0f s)",
                dataset_name, n_done, n_total, per,
                per * (n_total - n_done),
            )
            t_mark = time.perf_counter()
        for bi, rec in enumerate(chunk):
            valid = det.valid[bi]
            pred = {
                "classes": det.classes[bi][valid],
                "scores": det.scores[bi][valid],
                "boxes2d": det.boxes[bi][valid],
                "corners3d": det.corners3d[bi][valid],
                "center": det.center_cam[bi][valid],
                "dims": det.dimensions[bi][valid],
                "pose": det.pose[bi][valid],
                "center_2d": det.center_2d[bi][valid],
            }
            gt = _record_gt(rec)
            collected.append((gt, pred))
            if (vis_dir is not None and vis_period > 0
                    and (n_done + bi) % vis_period == 0):
                # Pred-vs-GT 3x2 panel every Nth eval image (reference
                # visualize_from_instances, vis.py:76-296).
                from ovmono3d_tpu.utils.util import imwrite_rgb
                from ovmono3d_tpu.vis.draw import pred_vs_gt_panels

                img = image_loader(rec) if image_loader else None
                if img is None:
                    img = np.full(
                        (rec["height"], rec["width"], 3), 255, np.uint8
                    )
                panel = pred_vs_gt_panels(
                    img, np.asarray(rec["K"], np.float64), gt, pred,
                    class_names=helper.class_names,
                )
                imwrite_rgb(
                    Path(vis_dir)
                    / (f"{dataset_name}_p{jax.process_index()}"
                       f"_{n_done + bi:06d}.jpg"),
                    panel,
                )
            if dump_path is not None:
                b = det.boxes[bi][valid]
                dumped.append({
                    "image_id": rec["image_id"],
                    "instances": [
                        {
                            "category_id": int(det.classes[bi][valid][j]),
                            "score": float(det.scores[bi][valid][j]),
                            "bbox": [float(b[j][0]), float(b[j][1]),
                                     float(b[j][2] - b[j][0]),
                                     float(b[j][3] - b[j][1])],
                            "center_cam": np.asarray(
                                det.center_cam[bi][valid][j]
                            ).tolist(),
                            "dimensions": np.asarray(
                                det.dimensions[bi][valid][j]
                            ).tolist(),
                            "pose": np.asarray(
                                det.pose[bi][valid][j]
                            ).tolist(),
                        }
                        for j in range(int(valid.sum()))
                    ],
                })
        n_done += len(chunk)
    # Accumulate the (all-hosts) results into the shared helper — in the
    # single-process case gather_objects is the identity.
    for gt, pred in gather_objects(collected):
        helper.add_image(dataset_name, gt, pred, eval_prox=eval_prox)
    dumped = gather_objects(dumped) if dump_path is not None else dumped
    if n_done:
        logger.info(
            "%s: total inference %.1f s (%.3f s/img); pure compute %.1f s "
            "(%.3f s/img); data %.1f s",
            dataset_name, time.perf_counter() - t_start,
            (time.perf_counter() - t_start) / n_done,
            t_compute, t_compute / n_done, t_data,
        )
    if dump_path is not None and jax.process_index() == 0:
        import json

        Path(dump_path).parent.mkdir(parents=True, exist_ok=True)
        with open(dump_path, "w") as fh:
            json.dump(dumped, fh)
    return n_done


def _np_cuboid_corners(centers, dims, poses):
    """Batched numpy mirror of utils.geometry.cuboid_corners (reference
    get_cuboid_verts_faces, math_util.py:116-219) — host-side GT prep must
    not dispatch a device call per annotation (multi-ms each on the
    tunneled TPU)."""
    import numpy as np

    from ovmono3d_tpu.utils.geometry import CORNER_SIGNS

    signs = np.asarray(CORNER_SIGNS, np.float64)          # [8, 3]
    whl = np.asarray(dims, np.float64)                    # (W, H, L)
    scale = np.stack([whl[:, 2], whl[:, 1], whl[:, 0]], -1)
    local = signs[None] * scale[:, None, :]               # [N, 8, 3]
    local = np.einsum("nij,nkj->nki", np.asarray(poses, np.float64), local)
    return (local + np.asarray(centers, np.float64)[:, None, :]).astype(
        np.float32
    )


def _record_gt(rec):
    import numpy as np

    classes, boxes2d, depths = [], [], []
    centers, dims, poses, ignores, has3d = [], [], [], [], []
    for anno in rec.get("annotations", []):
        cid = anno["category_id"]
        ig = bool(anno.get("ignore", cid < 0))
        if ig:
            # In-vocab ignores keep their true category so they absorb only
            # same-class detections (reference ignore2D/ignore3D semantics,
            # omni3d_evaluation.py:1531-1534); unknown categories stay -1
            # (class-agnostic ignore region, our documented extension).
            cid = anno.get("category_id_eval", cid)
        classes.append(cid)
        ignores.append(ig)
        boxes2d.append(anno["bbox2d"])
        if anno.get("center_cam") is not None:
            has3d.append(True)
            depths.append(anno["center_cam"][2])
            centers.append(np.asarray(anno["center_cam"], np.float32))
            dims.append(np.asarray(anno["dimensions"], np.float32))
            poses.append(np.asarray(anno["pose"], np.float32))
        else:
            has3d.append(False)
            depths.append(0.0)
            centers.append(np.zeros(3, np.float32))
            dims.append(np.ones(3, np.float32))
            poses.append(np.eye(3, dtype=np.float32))
    n = len(classes)
    center = np.asarray(centers, np.float32).reshape(n, 3)
    corners = (
        _np_cuboid_corners(center, np.asarray(dims, np.float32).reshape(n, 3),
                           np.asarray(poses, np.float32).reshape(n, 3, 3))
        if n else np.zeros((0, 8, 3), np.float32)
    )
    corners[~np.asarray(has3d, bool)] = 0.0
    # Projected GT centers (for the xy-pixel error stat, vis.py:289-294).
    K = np.asarray(rec.get("K", np.eye(3)), np.float32)
    z = np.maximum(center[:, 2:3], 1e-6)
    center_2d = (center / z) @ K.T
    return {
        "classes": np.asarray(classes, np.int64),
        "ignore": np.asarray(ignores, bool),
        "boxes2d": np.asarray(boxes2d, np.float64).reshape(-1, 4),
        "corners3d": np.asarray(corners).reshape(-1, 8, 3),
        "depths": np.asarray(depths),
        "center": center,
        "dims": np.asarray(dims, np.float32).reshape(n, 3),
        "pose": np.asarray(poses, np.float32).reshape(n, 3, 3),
        "center_2d": center_2d[:, :2],
    }


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("ovmono3d.eval")

    import jax
    import jax.numpy as jnp

    from ovmono3d_tpu.config import load_config
    from ovmono3d_tpu.data.build import default_image_loader
    from ovmono3d_tpu.data.datasets import (
        attach_depth_files,
        filter_settings_from_cfg,
        get_dataset,
        merge_oracle2d,
        simple_register,
    )
    from ovmono3d_tpu.models.rcnn3d import build_model
    from ovmono3d_tpu.vis.logperf import (
        print_ap_analysis,
        print_ap_per_category,
        print_ap_summary,
    )

    cfg = load_config(args.config_file, overrides=args.opts)
    if args.category_meta:
        from ovmono3d_tpu.data.datasets import load_category_meta

        class_names = load_category_meta(args.category_meta)["thing_classes"]
    else:
        class_names = list(cfg.datasets.category_names) or [
            str(i) for i in range(cfg.model.num_classes)
        ]

    # Priors for dims_priors_enabled / cluster_bins decodes: they are baked
    # into the model (reference injects them as parameters,
    # roi_heads.py:117-143); train_net persists them as priors.npz next to
    # the checkpoint.
    priors = None
    priors_path = args.priors
    if priors_path is None and args.checkpoint:
        cand = Path(args.checkpoint).parent / "priors.npz"
        priors_path = str(cand) if cand.exists() else None
    if priors_path:
        loaded_npz = np.load(priors_path)
        priors = {k: loaded_npz[k] for k in loaded_npz.files}
        logger.info("loaded priors from %s", priors_path)
    elif args.synthetic and (cfg.model.cube.dims_priors_enabled
                             or cfg.model.cube.cluster_bins > 0):
        from ovmono3d_tpu.utils.priors import compute_priors
        from tools.train_net import synthetic_records

        priors = compute_priors(
            synthetic_records(256, cfg.model.num_classes),
            cfg.model.num_classes, cfg.model.cube.cluster_bins,
            virtual_depth=cfg.model.cube.virtual_depth,
            virtual_focal=cfg.model.cube.virtual_focal,
            test_min=cfg.input.min_size_test,
            test_max=cfg.input.max_size_test,
            anchor_min=cfg.model.anchors.sizes[0][0],
            anchor_max=cfg.model.anchors.sizes[-1][-1],
        )
        logger.info("computed priors from synthetic records")
    elif args.rcnn_ckpt:
        # Released checkpoints bake the priors in as parameters
        # (roi_heads.py:117-143) — recover them from the state dict.
        from ovmono3d_tpu.utils.lift_convert import extract_priors
        from ovmono3d_tpu.utils.load import load_torch_state

        priors = extract_priors(load_torch_state(args.rcnn_ckpt))
        if priors is not None:
            logger.info("extracted priors from %s", args.rcnn_ckpt)

    model = build_model(cfg.model, priors=priors)
    S = cfg.model.backbone.square_pad
    params = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.seed),
        jnp.zeros((1, S, S, 3)),
        jnp.eye(3)[None],
        jnp.full((1, 2), S, jnp.int32),
        jnp.ones((1,)),
    )
    if args.checkpoint:
        from ovmono3d_tpu.train.checkpoint import SingleCheckpointer

        ckpt = SingleCheckpointer(Path(args.checkpoint).parent)
        # Training checkpoints hold the full TrainState; pull the params
        # subtree only (resume_or_load model-weights semantics,
        # reference train_net.py:151-168).
        loaded = ckpt.load_subtree("params", params,
                                   name=Path(args.checkpoint).name)
        if loaded is not None:
            params = loaded
            logger.info("loaded checkpoint %s", args.checkpoint)
        else:
            raise SystemExit(
                f"--checkpoint {args.checkpoint}: no loadable 'params' "
                "entry found")
    if args.rcnn_ckpt:
        from ovmono3d_tpu.utils.load import load_rcnn_params

        params = load_rcnn_params(params, args.rcnn_ckpt, cfg.model)

    mesh = None
    if args.data_parallel:
        from ovmono3d_tpu.parallel.mesh import make_mesh, replicated

        # HOST-LOCAL mesh: each host runs an independent data-parallel
        # program over its own chips on its own record shard (the results
        # are gathered after the loop) — a global mesh would require
        # cross-host-consistent batches and trip counts.
        mesh = make_mesh(n_model=1, devices=jax.local_devices())
        n_data = mesh.shape["data"]
        if args.batch_size % n_data:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be divisible by the "
                f"{n_data}-device data mesh")
        params = jax.device_put(params, replicated(mesh))
        logger.info("data-parallel eval over %d devices", n_data)

    novel_categories: set[str] = set()
    if args.synthetic:
        from tools.train_net import synthetic_records

        # TWO synthetic datasets so the cross-dataset merge machinery
        # (summarize_all re-accumulation, Omni3D rollups) is exercised.
        datasets = {}
        for name, seed in (("synthetic_a", 7), ("synthetic_b", 11)):
            records = synthetic_records(16, cfg.model.num_classes, seed=seed)
            # oracle = GT boxes with score 1 (the reference's GT-oracle mode).
            for rec in records:
                rec["oracle2d"] = [
                    {
                        "bbox2d": a["bbox2d"],
                        "category_id": a["category_id"],
                        "score": 1.0,
                    }
                    for a in rec["annotations"]
                    if a["category_id"] >= 0
                ]
            datasets[name] = records
        image_loader = None
        # Exercise the novel easy/hard split: treat half the synthetic
        # classes as novel (class names are stringified ints here unless the
        # config provides real names).
        novel_categories = set(class_names[: cfg.model.num_classes // 2])
    else:
        import dataclasses as _dc

        # Evaluation uses the TEST visibility/truncation thresholds for the
        # GT ignore decision (reference TEST.VISIBILITY_THRES /
        # TRUNCATION_THRES, config.py:222-223).
        fs = _dc.replace(
            filter_settings_from_cfg(cfg),
            visibility_thres=cfg.test.visibility_thres,
            truncation_thres=cfg.test.truncation_thres,
        )
        cat_map = {n: i for i, n in enumerate(cfg.datasets.category_names)}
        mode = cfg.test.cat_mode
        names = (
            cfg.datasets.test_novel if mode == "novel" else cfg.datasets.test_base
        )
        datasets = {}
        for name in names:
            json_path = Path(cfg.datasets.data_root) / "Omni3D" / f"{name}.json"
            simple_register(name, json_path, fs, cat_map)
            recs = get_dataset(name)
            from ovmono3d_tpu.config import oracle2d_file

            oracle_path = oracle2d_file(cfg.datasets, name, mode)
            if cfg.test.oracle2d:
                if not oracle_path:
                    # Fail HERE with the dataset named — otherwise the run
                    # dies much later with a bare KeyError('oracle_boxes')
                    # inside the jit trace.
                    raise ValueError(
                        f"test.oracle2d is set but datasets.oracle2d_files"
                        f"[{cfg.datasets.oracle2d_eval_mode!r}][{mode!r}] "
                        f"has no entry for dataset {name!r}"
                    )
                recs = merge_oracle2d(recs, oracle_path)
            if (cfg.datasets.depth_dir
                    and cfg.model.backbone.use_depth_fusion):
                attach_depth_files(recs, cfg.datasets.depth_dir)
            datasets[name] = recs
        image_loader = default_image_loader(cfg.datasets.data_root)
        if mode == "novel":
            # Union of the fixed per-dataset novel category sets
            # (reference builtin.py:12-53 / omni3d_evaluation.py:602-613).
            from ovmono3d_tpu.data.builtin import get_omni3d_categories

            for name in names:
                try:
                    novel_categories |= set(get_omni3d_categories(name))
                except ValueError:
                    pass

    # ONE helper across ALL test datasets: summarize_all re-accumulates the
    # concatenated per-(cat, band) evals (reference Omni3DEvaluationHelper,
    # omni3d_evaluation.py:427-620).
    from ovmono3d_tpu.evaluation.helper import Omni3DEvaluationHelper

    helper = Omni3DEvaluationHelper(
        cfg.model.num_classes, class_names,
        novel_categories=novel_categories,
    )

    run_fn = make_run_fn(model)
    for name, records in datasets.items():
        logger.info("evaluating %s (%d images)", name, len(records))
        if args.vis_dir:
            Path(args.vis_dir).mkdir(parents=True, exist_ok=True)
        evaluate_dataset(
            cfg, model, params, records, image_loader, args.batch_size,
            helper, name,
            dump_path=(f"{args.dump_predictions}_{name}.json"
                       if args.dump_predictions else None),
            vis_dir=args.vis_dir, vis_period=args.vis_period, mesh=mesh,
            run=run_fn,
        )

    summary = helper.summarize_all()
    for name, res in summary["datasets"].items():
        print_ap_summary(res, title=name)
        print_ap_per_category(helper.ev3d[name].per_category_ap(),
                              title=f"{name} per-category AP3D")
    overall = dict(summary["overall"])
    overall.update({
        k: v for k, v in summary.items()
        if k.startswith(("NHD_disentangled", "mean_err", "novel_",
                         "AP3D_omni", "general_"))
    })
    print_ap_summary(overall, title="overall (all test datasets merged)")
    print_ap_per_category(summary["per_category_AP3D"],
                          title="merged per-category AP3D")
    print_ap_analysis(summary["datasets"])


if __name__ == "__main__":
    main()

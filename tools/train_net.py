#!/usr/bin/env python
"""Training CLI (reference tools/train_net.py equivalent).

Usage:
  python tools/train_net.py --config-file configs/OVMono3D_dinov2_SFP.yaml \
      [--eval-only] [--synthetic] [key=value ...]

- Registers the configured Omni3D datasets from `datasets.data_root`,
  computes category priors, and runs the sharded data-parallel training loop
  with stabilization restarts (SURVEY.md §3.1).
- `--synthetic` runs the full loop on generated data (no dataset on disk):
  the end-to-end smoke path used by tests and dry runs.
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
    ap.add_argument("--eval-only", action="store_true",
                    help="skip training, run the oracle-protocol evaluation "
                         "(delegates to tools/eval_net.py — reference "
                         "train_net.py:403-452)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from output_dir/model_recent if present "
                         "(reference resume_or_load, train_net.py:151-168)")
    ap.add_argument("--checkpoint", default=None,
                    help="with --eval-only: orbax checkpoint to evaluate")
    ap.add_argument("--synthetic", action="store_true",
                    help="train on generated data (smoke test)")
    ap.add_argument("--max-iter", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    # Default ON like the reference's default_writers (train_net.py:153
    # always includes a TensorBoard sink); pure-Python writer, no TF dep.
    ap.add_argument("--tensorboard", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--trunk-ckpt", default=None,
                    help="torch trunk checkpoint: CNN (DLA model-zoo / "
                         "torchvision layouts) or foundation ViT (hub "
                         "dinov2, open_clip 'openai', HF ViTMAE, MiDaS "
                         "DPT_Large, segment-anything) — converted + "
                         "grafted, replacing the reference's at-build "
                         "downloads (dino.py:29, clip.py:23, mae.py:21, "
                         "midas_final.py:23, sam.py:27, dla.py:300-310)")
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler trace of steps 10-15")
    ap.add_argument("opts", nargs="*", default=[])
    return ap.parse_args()


def synthetic_records(num: int, num_classes: int, seed: int = 0):
    """Generated Omni3D-style records with plausible cuboids."""
    rng = np.random.RandomState(seed)
    recs = []
    for i in range(num):
        h, w = 480, 640
        f = 500.0
        annos = []
        for _ in range(rng.randint(1, 5)):
            z = rng.uniform(1.5, 8.0)
            dims = rng.uniform(0.2, 1.5, 3).tolist()
            x = rng.uniform(-0.8, 0.8) * z * 0.5
            y = rng.uniform(-0.5, 0.5) * z * 0.5
            u = f * x / z + w / 2
            v = f * y / z + h / 2
            bw = f * dims[2] / z
            bh = f * dims[1] / z
            annos.append({
                "category_id": int(rng.randint(num_classes)),
                "category": str(int(rng.randint(num_classes))),
                "bbox2d": [u - bw / 2, v - bh / 2, u + bw / 2, v + bh / 2],
                "center_cam": [x, y, z],
                "dimensions": dims,
                "pose": np.eye(3).tolist(),
                "ignore": False,
            })
        recs.append({
            "file_name": f"synthetic_{i}.jpg",
            "image_id": i,
            "width": w,
            "height": h,
            "K": [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]],
            "dataset_id": 0,
            "annotations": annos,
        })
    return recs


def main():
    args = parse_args()
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
    )

    if args.eval_only:
        # Delegate to the evaluation CLI (reference train_net.py:403-452
        # dispatches --eval-only to do_test with the same config/opts).
        if args.trunk_ckpt:
            raise SystemExit(
                "--trunk-ckpt is a training-time ImageNet init and is not "
                "forwarded by --eval-only; evaluate a trained checkpoint "
                "via --checkpoint or released weights via eval_net "
                "--rcnn-ckpt instead")
        from tools import eval_net

        argv = ["eval_net.py"]
        if args.config_file:
            argv += ["--config-file", args.config_file]
        if args.synthetic:
            argv += ["--synthetic"]
        if args.checkpoint:
            argv += ["--checkpoint", args.checkpoint]
        if args.batch_size:
            argv += ["--batch-size", str(args.batch_size)]
        argv += list(args.opts)
        sys.argv = argv
        return eval_net.main()

    import jax

    from ovmono3d_tpu.config import load_config
    from ovmono3d_tpu.data.build import (
        build_train_iterator,
        default_image_loader,
    )
    from ovmono3d_tpu.data.datasets import (
        attach_depth_files,
        filter_settings_from_cfg,
        get_dataset,
        simple_register,
    )
    from ovmono3d_tpu.models.rcnn3d import build_model
    from ovmono3d_tpu.parallel.mesh import make_mesh, shard_batch
    from ovmono3d_tpu.parallel.train_step import (
        create_train_state,
        make_train_step,
        shard_train_step,
    )
    from ovmono3d_tpu.train.checkpoint import SingleCheckpointer
    from ovmono3d_tpu.train.loop import train
    from ovmono3d_tpu.train.optim import (
        apply_freeze,
        build_optimizer,
        freeze_backbone_mask,
    )
    from ovmono3d_tpu.utils.priors import compute_priors

    cfg = load_config(args.config_file, overrides=args.opts)
    logger = logging.getLogger("ovmono3d")

    # --- data ---
    if args.synthetic:
        records = synthetic_records(256, cfg.model.num_classes)
        image_loader = None
    else:
        fs = filter_settings_from_cfg(cfg)
        cat_map = {n: i for i, n in enumerate(cfg.datasets.category_names)}
        records = []
        for name in cfg.datasets.train:
            json_path = Path(cfg.datasets.data_root) / "Omni3D" / f"{name}.json"
            simple_register(name, json_path, fs, cat_map)
            records.extend(get_dataset(name))
        if cfg.datasets.depth_dir and cfg.model.backbone.use_depth_fusion:
            attach_depth_files(records, cfg.datasets.depth_dir)
        image_loader = default_image_loader(cfg.datasets.data_root)
    logger.info("train records: %d", len(records))

    priors = compute_priors(
        records, cfg.model.num_classes, cfg.model.cube.cluster_bins,
        virtual_depth=cfg.model.cube.virtual_depth,
        virtual_focal=cfg.model.cube.virtual_focal,
        test_min=cfg.input.min_size_test, test_max=cfg.input.max_size_test,
        anchor_min=cfg.model.anchors.sizes[0][0],
        anchor_max=cfg.model.anchors.sizes[-1][-1],
    )
    logger.info("priors computed: mean dims %s", priors["dims"][:, 0].mean(0))
    # Persist next to the checkpoints: priors are baked into the model (not
    # orbax state), so evaluation of dims_priors/cluster_bins configs needs
    # them back (tools/eval_net.py --priors).
    out_dir = Path(cfg.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    np.savez(out_dir / "priors.npz", **priors)

    # --- model / optimizer / mesh ---
    # Priors are injected into the model (reference roi_heads.py:117-143):
    # dims_priors_enabled / cluster_bins decodes consume them.
    if cfg.model.backbone.quant != "none":
        raise SystemExit(
            "model.backbone.quant is a SERVING-only knob: the int8 "
            "round() has zero gradient, so training through it would "
            "silently stop updating the trunk. Train with quant=none and "
            "enable int8 at inference (ops/quant.py)."
        )
    model = build_model(cfg.model, priors=priors)
    mesh = make_mesh()
    n_dev = mesh.shape["data"]
    batch_size = args.batch_size or max(
        cfg.solver.ims_per_batch // max(jax.process_count(), 1), n_dev
    )
    rounded = (batch_size // n_dev) * n_dev or n_dev
    if args.batch_size and rounded != args.batch_size:
        logger.warning(
            "--batch-size %d adjusted to %d (must be a multiple of the %d "
            "mesh data devices)", args.batch_size, rounded, n_dev,
        )
    batch_size = rounded
    S = cfg.model.backbone.square_pad

    import jax.numpy as jnp

    params = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.seed),
        jnp.zeros((1, S, S, 3)),
        jnp.eye(3)[None],
        jnp.full((1, 2), S, jnp.int32),
        jnp.ones((1,)),
    )
    if args.trunk_ckpt:
        from ovmono3d_tpu.utils.cnn_convert import load_cnn_trunk

        params = load_cnn_trunk(params, args.trunk_ckpt,
                                cfg.model.backbone.name)
        logger.info("loaded CNN trunk weights from %s", args.trunk_ckpt)
    tx = build_optimizer(cfg.solver, params)
    trainable_mask = None
    if cfg.model.backbone.freeze:
        trainable_mask = freeze_backbone_mask(params)
        tx = apply_freeze(tx, trainable_mask)
    if cfg.solver.grad_accum_steps > 1:
        from ovmono3d_tpu.train.optim import with_grad_accum

        tx = with_grad_accum(tx, cfg.solver.grad_accum_steps)
    state = create_train_state(params, tx, jax.random.PRNGKey(cfg.seed + 1))
    step_fn = shard_train_step(
        make_train_step(model, tx, cfg.model.stabilize,
                        trainable_mask=trainable_mask), mesh
    )

    ckpt = SingleCheckpointer(cfg.output_dir)
    if args.resume and ckpt.has():
        # resume_or_load semantics (reference train_net.py:151-168): pick up
        # params + optimizer + step from the rolling checkpoint.
        state = ckpt.load(state)
        logger.info("resumed from %s/model_recent at step %d",
                    cfg.output_dir, int(state.step))

    max_iter = args.max_iter or cfg.solver.max_iter
    import dataclasses

    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, max_iter=max_iter)
    )

    def make_data_iter(attempt: int = 0):
        # Fresh producers + shuffle stream per restart attempt (the
        # reference rebuilds loader/worker processes, train_net.py:296-325).
        data = build_train_iterator(
            cfg, records, batch_size, image_loader=image_loader,
            seed=cfg.seed + 1000 * attempt,
        )
        return (shard_batch(mesh, b) for b in data)

    sharded = make_data_iter()

    from ovmono3d_tpu.train.metrics import (
        MetricsWriter,
        ProfilerHook,
        TrainVisHook,
    )

    hooks = [MetricsWriter(cfg.output_dir, use_tensorboard=args.tensorboard)]
    if cfg.vis_period > 0:
        # Panels go to disk AND (with --tensorboard) to TB image summaries
        # (the reference's visualize_training sink, rcnn3d.py:119-250).
        hooks.append(TrainVisHook(cfg.output_dir, period=cfg.vis_period,
                                  tb=hooks[0].tb))
    if args.profile:
        hooks.append(ProfilerHook(cfg.output_dir))

    # Periodic in-train evaluation (reference do_test every TEST.EVAL_PERIOD,
    # train_net.py:329-339): oracle-GT protocol over a held-out set.
    eval_fn = None
    if cfg.test.eval_period > 0:
        if args.synthetic:
            eval_records = synthetic_records(16, cfg.model.num_classes,
                                             seed=99)
        else:
            # Prefer a real held-out set (reference do_test runs the TEST
            # datasets, train_net.py:329-339); fall back to a COPY of the
            # first training records (smoke metric only — copied so the
            # oracle2d injection below can't mutate the training stream).
            import copy

            eval_records = []
            for name in (cfg.datasets.test or [])[:1]:
                json_path = (Path(cfg.datasets.data_root) / "Omni3D"
                             / f"{name}.json")
                if json_path.exists():
                    simple_register(name, json_path, fs, cat_map)
                    eval_records = get_dataset(name)[:64]
            if not eval_records:
                logger.warning(
                    "test.eval_period is set but no test dataset is "
                    "available; in-train eval uses 64 TRAINING records "
                    "(optimistic smoke metric)")
                eval_records = copy.deepcopy(records[: min(len(records), 64)])
        for rec in eval_records:
            rec["oracle2d"] = [
                {"bbox2d": a["bbox2d"], "category_id": a["category_id"],
                 "score": 1.0}
                for a in rec["annotations"] if a["category_id"] >= 0
            ]

        from tools.eval_net import make_run_fn

        # ONE jitted eval step shared across every periodic eval — a fresh
        # closure per eval would re-trace the full graph each period.
        eval_run_fn = make_run_fn(model)

        def eval_fn(state):
            from ovmono3d_tpu.evaluation.helper import Omni3DEvaluationHelper
            from tools.eval_net import evaluate_dataset

            class_names = list(cfg.datasets.category_names) or [
                str(i) for i in range(cfg.model.num_classes)
            ]
            helper = Omni3DEvaluationHelper(cfg.model.num_classes,
                                            class_names)
            # Pass the ON-DEVICE params: device_get would pull the whole
            # tree host-side and re-upload it through the size-capped
            # tunnel on every eval batch (params aren't donated until the
            # next train step, so sharing them is safe).
            evaluate_dataset(
                cfg, model, state.params, eval_records,
                image_loader, batch_size, helper, "in_train_eval",
                run=eval_run_fn,
            )
            return helper.summarize_dataset("in_train_eval")

    logger.info(
        "starting training: %d iters, batch %d over %d devices",
        max_iter, batch_size, n_dev,
    )
    state = train(cfg, state, step_fn, sharded, checkpointer=ckpt,
                  hooks=hooks, eval_fn=eval_fn,
                  data_iter_factory=make_data_iter)
    logger.info("done at step %d (skipped %d)", int(state.step),
                int(state.skipped))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Capture a device trace of the sharded training step; print top ops.

Same protocol/aggregation as tools/profile_oracle.py, driving the full
RCNN3D train step (frozen trunk, all losses, optax update, in-graph
stabilization) at the flagship training shape (896^2, b8) the way
tools/bench_train.py does.

Usage: python tools/profile_train.py [logdir] [--unfreeze]
[--remat-policy full|dots] — --unfreeze traces the unfrozen-trunk path
(backbone.freeze=False + remat), the bench_train --unfreeze configuration.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")


def main():
    argv = [a for a in sys.argv[1:]]
    unfreeze = "--unfreeze" in argv
    if unfreeze:
        argv.remove("--unfreeze")
    remat_policy = "full"
    if "--remat-policy" in argv:
        i = argv.index("--remat-policy")
        remat_policy = argv[i + 1]
        del argv[i:i + 2]
    logdir = argv[0] if argv else "/tmp/train_trace"
    from __graft_entry__ import _flagship_config
    from ovmono3d_tpu.data.build import build_train_iterator
    from ovmono3d_tpu.models.rcnn3d import build_model
    from ovmono3d_tpu.parallel.mesh import make_mesh, shard_batch
    from ovmono3d_tpu.parallel.train_step import (
        create_train_state,
        make_train_step,
        shard_train_step,
    )
    from ovmono3d_tpu.train.optim import (
        apply_freeze,
        build_optimizer,
        freeze_backbone_mask,
    )
    from tools.profile_oracle import report
    from tools.train_net import synthetic_records

    cfg = _flagship_config(square_pad=896)
    if unfreeze:
        import dataclasses

        bb = dataclasses.replace(
            cfg.model.backbone, freeze=False, remat=True,
            remat_policy=remat_policy)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, backbone=bb))
    B = 8
    model = build_model(cfg.model)
    records = synthetic_records(B * 2, cfg.model.num_classes)
    batch = next(iter(build_train_iterator(cfg, records, B, seed=0)))
    mesh = make_mesh()
    batch = shard_batch(mesh, batch)

    S = cfg.model.backbone.square_pad
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, S, S, 3)),
        jnp.eye(3)[None],
        jnp.full((1, 2), S, jnp.int32),
        jnp.ones((1,)),
    )
    tx = build_optimizer(cfg.solver, params)
    trainable_mask = None
    if cfg.model.backbone.freeze:
        trainable_mask = freeze_backbone_mask(params)
        tx = apply_freeze(tx, trainable_mask)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step_fn = shard_train_step(
        make_train_step(model, tx, 0.01, trainable_mask=trainable_mask),
        mesh)

    state, metrics = step_fn(state, batch)
    float(np.asarray(metrics["total_loss"]))  # warm

    ITERS = 3
    # Host/python tracer off: the 235 ms step floods the 1M-event perfetto
    # cap with python frames and the device tracks get truncated away.
    opts = jax.profiler.ProfileOptions()
    opts.host_tracer_level = 0
    opts.python_tracer_level = 0
    with jax.profiler.trace(logdir, create_perfetto_trace=True,
                            profiler_options=opts):
        m = None
        for _ in range(ITERS):
            state, m = step_fn(state, batch)
        float(np.asarray(m["total_loss"]))
    report(logdir, ITERS)


if __name__ == "__main__":
    main()

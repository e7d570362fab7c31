#!/usr/bin/env python
"""Batched oracle-path throughput of the flagship model on one TPU chip.

bench.py's protocol (in-graph chained fori_loop) at batch > 1: amortizes
per-dispatch and per-layer fixed costs — the serving-throughput number to
quote next to the b1 latency-oriented headline.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args()

    from __graft_entry__ import _flagship_config
    from ovmono3d_tpu.models.rcnn3d import build_model
    from tools.bench_util import bench_loop

    cfg = _flagship_config(square_pad=896)
    model = build_model(cfg.model)

    B, S, N = args.batch_size, 896, 64
    key = jax.random.PRNGKey(0)
    image = jax.random.uniform(key, (B, S, S, 3), jnp.float32) * 255.0
    K = jnp.broadcast_to(
        jnp.array([[1000.0, 0, S / 2], [0, 1000.0, S / 2], [0, 0, 1]]),
        (B, 3, 3),
    )
    im_hw = jnp.full((B, 2), S, jnp.int32)
    ratio = jnp.ones((B,), jnp.float32)
    boxes = jnp.tile(jnp.array([[50.0, 50.0, 400.0, 400.0]]), (B, N, 1))
    classes = jnp.zeros((B, N), jnp.int32)
    scores = jnp.full((B, N), 0.9, jnp.float32)
    valid = jnp.ones((B, N), bool)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(1), image, K, im_hw, ratio,
        oracle_boxes=boxes, oracle_classes=classes,
        oracle_scores=scores, oracle_valid=valid,
    )

    dt = bench_loop(
        lambda img, p: model.apply(
            p, img, K, im_hw, ratio,
            oracle_boxes=boxes, oracle_classes=classes,
            oracle_scores=scores, oracle_valid=valid,
        ),
        image,
        lambda out: out.scores[0, 0],
        iters=10, label=f"oracle @896^2 b{B}", args=(params,),
    )
    print(f"oracle @896^2 b{B}: {dt*1e3:.1f} ms/step = "
          f"{B/dt:.2f} img/s/chip")


if __name__ == "__main__":
    main()

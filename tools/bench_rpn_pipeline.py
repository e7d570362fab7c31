#!/usr/bin/env python
"""Full RPN inference pipeline throughput on one TPU chip.

The NON-oracle detection path (reference RCNN3D.inference without the
oracle bypass, /root/reference/cubercnn/modeling/meta_arch/rcnn3d.py:
79-117): trunk+SFP -> RPN per-level NMS -> Fast R-CNN box head ->
per-class NMS -> cube head lifting. bench.py measures the oracle-2D
eval protocol; this is the learned 2D path the reference runs when no
oracle/GDINO boxes are supplied. Same chained fori_loop protocol.

Historical capture (round 2, post per-level-NMS rework): 46.1 img/s b1
@896^2 (21.7 ms) — this tool makes that number a named command.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=1)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_config
    from ovmono3d_tpu.models.rcnn3d import build_model

    cfg = _flagship_config(square_pad=896)
    model = build_model(cfg.model)

    B, S = args.batch_size, 896
    key = jax.random.PRNGKey(0)
    image = jax.random.uniform(key, (B, S, S, 3), jnp.float32) * 255.0
    K = jnp.broadcast_to(
        jnp.array([[1000.0, 0, S / 2], [0, 1000.0, S / 2], [0, 0, 1]]),
        (B, 3, 3),
    )
    im_hw = jnp.full((B, 2), S, jnp.int32)
    ratio = jnp.ones((B,), jnp.float32)

    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(1), image, K, im_hw,
                                 ratio)
    print(f"init: {time.time() - t0:.1f}s", flush=True)

    def apply(params, img):
        return model.apply(params, img, K, im_hw, ratio)

    iters = args.iters

    @jax.jit
    def run_loop(params, image):
        def body(_, carry):
            img, acc = carry
            out = apply(params, img)
            return image + out.scores[0, 0] * 1e-9, acc + out.scores[0, 0]

        _, acc = jax.lax.fori_loop(0, iters, body, (image, 0.0))
        return acc

    print("[compiling] rpn pipeline loop", flush=True)
    t0 = time.time()
    float(np.asarray(run_loop(params, image)))
    print(f"compile+warm: {time.time() - t0:.1f}s", flush=True)

    best = None
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        float(np.asarray(run_loop(params, image)))
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    per_img = best / B
    print(json.dumps({
        "metric": "rpn_pipeline_896_img_per_s",
        "value": round(1.0 / per_img, 2),
        "unit": "img/s/chip",
        "ms_per_img": round(per_img * 1e3, 2),
        "batch_size": B,
    }))


if __name__ == "__main__":
    main()

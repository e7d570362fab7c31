#!/usr/bin/env python
"""GroundingDINO SwinB @800^2 single-image throughput on one TPU chip.

The reference's open-vocab 2D stage (GroundingDINO SwinB + BERT + deformable
transformer) dominates OVMono3D-LIFT open-vocab inference; the reference's
whole pipeline runs ~4.6 img/s/GPU (BASELINE.md). Timing protocol per
CLAUDE.md: chained dependency + forced host read, best-of-N.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=1,
                    help="batch > 1 gives the serving-throughput number "
                    "(the reference evals GDINO at b1)")
    ap.add_argument("--hoist-bias", action="store_true",
                    help="precompute the Swin rel-pos biases outside the "
                    "forward (expand_rel_pos_biases; bit-identical)")
    ap.add_argument("--size", type=int, default=800,
                    help="square input side (896 = the e2e lift canvas)")
    ap.add_argument("--mm-max-size", type=int, default=None,
                    help="override deformable._MATMUL_MAX_SIZE_BF16 (A/B "
                    "the one-hot-matmul/gather level dispatch, e.g. the "
                    "56^2 level that appears at 896^2)")
    args = ap.parse_args()

    from ovmono3d_tpu.models.gdino.model import GroundingDINO

    if args.mm_max_size is not None:
        from ovmono3d_tpu.models.gdino import deformable
        deformable._MATMUL_MAX_SIZE_BF16 = args.mm_max_size

    S = args.size
    B = args.batch_size
    model = GroundingDINO()
    img = jnp.asarray(
        np.random.RandomState(0).rand(B, S, S, 3), jnp.float32
    )
    T = 64
    ids = jnp.ones((B, T), jnp.int32)
    mask = jnp.ones((B, T), bool)

    from tools.bench_util import bench_loop

    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, ids, mask)
    print(f"init: {time.time()-t0:.1f}s")

    if args.hoist_bias:
        from ovmono3d_tpu.models.gdino.swin import expand_rel_pos_biases

        biases = jax.tree.map(
            jnp.asarray, expand_rel_pos_biases(params["params"]["backbone"])
        )
        fn = lambda im, p, b: model.apply(p, im, ids, mask,
                                          swin_rel_biases=b)
        extra = (params, biases)
    else:
        fn = lambda im, p: model.apply(p, im, ids, mask)
        extra = (params,)
    dt = bench_loop(
        fn,
        img,
        lambda out: out["pred_logits"][0, 0, 0],
        iters=10,
        label=f"GDINO SwinB @{S}^2 b{B}"
              + (" +hoist-bias" if args.hoist_bias else ""),
        args=extra,
    )
    print(f"GDINO SwinB @{S}^2 b{B}: {dt*1e3:.1f} ms/step = "
          f"{B/dt:.2f} img/s/chip")


if __name__ == "__main__":
    main()

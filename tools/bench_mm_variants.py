#!/usr/bin/env python
"""Full-model GDINO benches of merged-matmul-sampler variants @800^2.

Monkeypatches deformable._bilinear_matmul_multi with chunk-size / rows-dtype
tweaks and re-benches the whole model (variants are compile-cache misses, a
few minutes each). Also re-times the Swin trunk alone (cast change).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")

S = 800
T = 24


def main():
    import functools

    from ovmono3d_tpu.models.gdino import deformable
    from ovmono3d_tpu.models.gdino.model import GroundingDINO
    from ovmono3d_tpu.models.gdino.swin import SwinTransformer
    from tools.bench_util import bench_loop

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, S, S, 3), jnp.float32)
    ids = jnp.ones((1, T), jnp.int32)
    mask = jnp.ones((1, T), bool)

    orig = deformable._bilinear_matmul_multi

    def run(label):
        model = GroundingDINO()
        t0 = time.time()
        params = jax.jit(model.init)(jax.random.PRNGKey(0), img, ids, mask)
        print(f"[{label}] init {time.time()-t0:.0f}s", flush=True)
        return bench_loop(
            lambda im, p: model.apply(p, im, ids, mask),
            img,
            lambda out: out["pred_logits"][0, 0, 0],
            iters=10, label=label, args=(params,),
        )

    run("baseline chunk2048")
    for chunk in (4096, 8192):
        deformable._bilinear_matmul_multi = functools.partial(
            orig, chunk=chunk
        )
        run(f"chunk{chunk}")
    deformable._bilinear_matmul_multi = orig

    swin = SwinTransformer()
    sp = jax.jit(swin.init)(jax.random.PRNGKey(0), img)
    bench_loop(
        lambda im, p: swin.apply(p, im), img,
        lambda out: out["s3"][0, 0, 0, 0], iters=10,
        label="swin only (bf16 partition)", args=(sp,),
    )


if __name__ == "__main__":
    main()

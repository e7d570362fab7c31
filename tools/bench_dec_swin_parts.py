#!/usr/bin/env python
"""In-situ decoder sub-block costs + Swin attn/MLP split + chunk=1024 probe.

Same delta methodology as tools/bench_enc_parts.py.
"""
from __future__ import annotations

import functools
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
    from ovmono3d_tpu.models.gdino import deformable
    from ovmono3d_tpu.models.gdino.model import GroundingDINO
    from ovmono3d_tpu.models.gdino.swin import SwinTransformer
    from tools.bench_util import bench_loop

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, S, S, 3), jnp.float32)
    ids = jnp.ones((1, T), jnp.int32)
    mask = jnp.ones((1, T), bool)

    results = {}

    def run(label, **kw):
        model = GroundingDINO(**kw)
        t0 = time.time()
        params = jax.jit(model.init)(jax.random.PRNGKey(0), img, ids, mask)
        print(f"[{label}] init {time.time()-t0:.0f}s", flush=True)
        dt = bench_loop(
            lambda im, p: model.apply(p, im, ids, mask),
            img,
            lambda out: out["pred_logits"][0, 0, 0],
            iters=10, label=label, args=(params,),
        )
        results[label] = dt
        return dt

    run("full")

    orig = deformable._bilinear_matmul_multi
    deformable._bilinear_matmul_multi = functools.partial(orig, chunk=1024)
    run("chunk1024")
    deformable._bilinear_matmul_multi = orig

    run("dec no self-attn", debug_skip=("dec:self",))
    run("dec no text-cross", debug_skip=("dec:text_cross",))
    run("dec no deform", debug_skip=("dec:deform",))

    # Swin alone: attn vs MLP split.
    def run_swin(label, **kw):
        swin = SwinTransformer(**kw)
        sp = jax.jit(swin.init)(jax.random.PRNGKey(0), img)
        dt = bench_loop(
            lambda im, p: swin.apply(p, im), img,
            lambda out: out["s3"][0, 0, 0, 0], iters=10, label=label,
            args=(sp,),
        )
        results[label] = dt

    run_swin("swin full")
    run_swin("swin no attn", debug_skip=("attn",))
    run_swin("swin no mlp", debug_skip=("mlp",))

    full = results["full"]
    sw = results["swin full"]
    print("\n--- decoder part costs (in situ deltas, ms) ---")
    print(f"total                  {full*1e3:8.2f}")
    for k in ("chunk1024", "dec no self-attn", "dec no text-cross",
              "dec no deform"):
        print(f"{k:<22} {(full - results[k])*1e3:8.2f}")
    print(f"swin full              {sw*1e3:8.2f}")
    for k in ("swin no attn", "swin no mlp"):
        print(f"{k:<22} {(sw - results[k])*1e3:8.2f}")


if __name__ == "__main__":
    main()

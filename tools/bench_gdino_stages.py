#!/usr/bin/env python
"""Stage decomposition of the GDINO SwinB @800^2 forward on one TPU chip.

Times model VARIANTS (full, no-encoder, no-decoder, swin-only, bert-only)
with the in-graph chained protocol; differences give each stage's in-situ
cost including whatever overlap XLA finds — micro-benches of the deformable
core alone over-state its cost because in the full graph its DMA waves
overlap with MXU work from the FFN/fusion ops.
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
    from ovmono3d_tpu.models.gdino.bert import BertEncoder
    from ovmono3d_tpu.models.gdino.model import GroundingDINO
    from ovmono3d_tpu.models.gdino.swin import SwinTransformer
    from tools.bench_util import bench_loop

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, S, S, 3), jnp.float32)
    ids = jnp.ones((1, T), jnp.int32)
    mask = jnp.ones((1, T), bool)

    results = {}

    def run(label, model):
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

    run("full (6 enc, 6 dec)", GroundingDINO())
    run("no encoder (0 enc, 6 dec)", GroundingDINO(enc_layers=0))
    run("no decoder (6 enc, 0 dec)", GroundingDINO(dec_layers=0))
    run("heads only (0 enc, 0 dec)", GroundingDINO(enc_layers=0,
                                                   dec_layers=0))

    # Swin trunk alone.
    swin = SwinTransformer()
    sp = jax.jit(swin.init)(jax.random.PRNGKey(0), img)
    results["swin only"] = bench_loop(
        lambda im, p: swin.apply(p, im), img,
        lambda out: out["s3"][0, 0, 0, 0], iters=10, label="swin only",
        args=(sp,),
    )

    # BERT alone (tiny; feed through the float carry via ids trick is
    # awkward — chain through the image-shaped feed instead).
    bert = BertEncoder(layers=12)
    bp = jax.jit(bert.init)(jax.random.PRNGKey(0), ids, mask)
    feed = jnp.zeros((8,), jnp.float32)
    results["bert only"] = bench_loop(
        lambda f, p: bert.apply(p, ids + f[0].astype(jnp.int32), mask),
        feed, lambda out: out[0, 0, 0], iters=10, label="bert only",
        args=(bp,),
    )

    full = results["full (6 enc, 6 dec)"]
    print("\n--- stage costs (in situ, ms) ---")
    print(f"total            {full*1e3:8.2f}")
    print(f"encoder stack    {(full - results['no encoder (0 enc, 6 dec)'])*1e3:8.2f}")
    print(f"decoder stack    {(full - results['no decoder (6 enc, 0 dec)'])*1e3:8.2f}")
    print(f"swin trunk       {results['swin only']*1e3:8.2f}")
    print(f"bert             {results['bert only']*1e3:8.2f}")
    base = results["heads only (0 enc, 0 dec)"]
    print(f"base (swin+bert+proj+select) {base*1e3:8.2f}")


if __name__ == "__main__":
    main()

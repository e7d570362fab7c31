#!/usr/bin/env python
"""In-situ cost decomposition of the GDINO encoder sub-blocks @800^2.

Times full-model variants with encoder sub-blocks skipped (debug_skip) or
deformable sampling restricted to level subsets (sample_levels); the delta
vs the full model gives each part's in-situ cost including XLA overlap.
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
    from ovmono3d_tpu.models.gdino.model import GroundingDINO
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
    run("no fusion", debug_skip=("fusion",))
    run("no text-enh", debug_skip=("text",))
    run("no image layer", debug_skip=("image",))
    run("levels 1,2,3 (no 100^2)", sample_levels=(1, 2, 3))
    run("levels 0 (only 100^2)", sample_levels=(0,))
    run("levels none", sample_levels=())

    full = results["full"]
    print("\n--- encoder part costs (in situ deltas, ms) ---")
    print(f"total                    {full*1e3:8.2f}")
    for k in list(results)[1:]:
        print(f"{k:<24} {(full - results[k])*1e3:8.2f}")


if __name__ == "__main__":
    main()

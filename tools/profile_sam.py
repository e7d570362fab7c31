#!/usr/bin/env python
"""Device trace of the SAM ViT-H image encoder @1024^2; print top ops.

The GEO stack's second-largest slice (137 ms after the bf16 rel-pos fast
path, bench_geo_models.py). Analytic floor: dense matmuls ~5.2 TF -> ~28 ms
at the 184 TF/s achieved rate, windowed+global attention ~0.5 TF -> ~5 ms,
plus the 4 global layers' [16, 4096, 4096] logit traffic. This shows where
the remaining ~100 ms actually goes (reference:
/root/reference/tools/ovmono3d_geo.py:248-264 builds the same trunk).

Usage: python tools/profile_sam.py [logdir] [vit_b|vit_l|vit_h]
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

from tools.profile_oracle import report  # noqa: E402


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sam_trace"
    sam_arch = sys.argv[2] if len(sys.argv) > 2 else "vit_h"

    from ovmono3d_tpu.models.backbones import VIT_PRESETS
    from ovmono3d_tpu.models.vit import VisionTransformer

    arch = {
        "vit_b": dict(embed_dim=768, depth=12, num_heads=12,
                      global_blocks=(2, 5, 8, 11)),
        "vit_l": dict(embed_dim=1024, depth=24, num_heads=16,
                      global_blocks=(5, 11, 17, 23)),
        "vit_h": dict(embed_dim=1280, depth=32, num_heads=16,
                      global_blocks=(7, 15, 23, 31)),
    }[sam_arch]
    enc = VisionTransformer(use_depth_fusion=False,
                            **{**VIT_PRESETS["sam"], **arch})
    S = 1024
    img = jnp.asarray(
        np.random.RandomState(0).rand(1, S, S, 3), jnp.float32)
    t0 = time.time()
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), img)
    print(f"init: {time.time()-t0:.0f}s", flush=True)

    fn = jax.jit(lambda p, im: enc.apply(p, im)["last_feat"])
    out = fn(params, img)
    float(np.asarray(out[0, 0, 0, 0]))  # warm

    ITERS = 5
    opts = jax.profiler.ProfileOptions()
    opts.host_tracer_level = 0
    opts.python_tracer_level = 0
    with jax.profiler.trace(logdir, create_perfetto_trace=True,
                            profiler_options=opts):
        for _ in range(ITERS):
            out = fn(params, img)
        float(np.asarray(out[0, 0, 0, 0]))
    report(logdir, ITERS)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Device trace of the Depth-Pro 35-crop patch-encoder pass; print top ops.

probe_depth_stages.py attributes 173.5 of 227.5 ms @1536^2 bf16 to
encode_patches (the batched ViT-L/16@384 over 35 pyramid crops) at only
41% of the v5e bf16 peak, while the analytic blend (8.6% attention FLOPs
at the D=64 MXU cap, the rest dense matmuls) allows ~2x that. This reuses
profile_oracle.report to show where the other half goes.

Usage: python tools/profile_depth.py [logdir] [stage]
  stage: patches (default) | full
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
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/depth_trace"
    stage = sys.argv[2] if len(sys.argv) > 2 else "patches"

    from ovmono3d_tpu.models.depth import DepthPro

    model = DepthPro(dtype=jnp.bfloat16)
    H = 1536
    img = jnp.asarray(
        np.random.RandomState(0).rand(1, H, H, 3).astype(np.float32))
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    print(f"init: {time.time()-t0:.0f}s", flush=True)

    if stage == "patches":
        patches = jax.jit(lambda p, im: model.apply(
            p, im, method=DepthPro.pyramid_patches)[0])(params, img)
        fn = jax.jit(lambda p, x: model.apply(
            p, x, method=DepthPro.encode_patches))
        feed = patches
        probe = lambda o: o["last_feat"][0, 0, 0, 0]  # noqa: E731
    else:
        fn = jax.jit(lambda p, x: model.apply(p, x))
        feed = img
        probe = lambda o: o["canonical_inverse_depth"][0, 0, 0]  # noqa: E731

    out = fn(params, feed)
    float(np.asarray(probe(out)))  # warm

    ITERS = 5
    opts = jax.profiler.ProfileOptions()
    opts.host_tracer_level = 0
    opts.python_tracer_level = 0
    with jax.profiler.trace(logdir, create_perfetto_trace=True,
                            profiler_options=opts):
        for _ in range(ITERS):
            out = fn(params, feed)
        float(np.asarray(probe(out)))
    report(logdir, ITERS)


if __name__ == "__main__":
    main()

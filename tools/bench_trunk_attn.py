#!/usr/bin/env python
"""Trunk @896^2 with flash vs xla attention vs no-attention ablation."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")

import ovmono3d_tpu.ops.attention as A
from ovmono3d_tpu.models.vit import VisionTransformer


def bench(fn, feed, probe, iters=15, rounds=4, label=""):
    out = fn(feed); float(np.asarray(probe(out)))
    def rt():
        t0 = time.perf_counter(); x = feed
        for _ in range(iters):
            out = fn(x); x = feed + probe(out) * 1e-9
        float(np.asarray(probe(out)))
        return (time.perf_counter() - t0) / iters
    best = min(rt() for _ in range(rounds))
    print(f"{label}: {best*1e3:.2f} ms", flush=True)
    return best


rng = np.random.RandomState(0)
image = jnp.asarray(rng.rand(1, 896, 896, 3) * 255, jnp.float32)
vit = VisionTransformer(pretrain_grid=37)
vp = jax.jit(vit.init)(jax.random.PRNGKey(0), image)
japply = jax.jit(vit.apply)
probe = lambda o: o["last_feat"][0, 0, 0, 0]

orig = A._attention_autoselect
bench(lambda x: japply(vp, x), image, probe, label="trunk flash(auto)")

# no attention at all (v passthrough)
A._attention_autoselect = lambda q, k, v: v
japply3 = jax.jit(lambda p, x: (vit.apply(p, x), 0)[0])
bench(lambda x: japply3(vp, x), image, probe, label="trunk NO attn   ")
A._attention_autoselect = orig

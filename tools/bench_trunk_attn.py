#!/usr/bin/env python
"""Trunk @896^2 with flash vs xla attention vs no-attention ablation."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")

import ovmono3d_tpu.ops.attention as A
from ovmono3d_tpu.models.vit import VisionTransformer


def bench(fn, feed, probe, iters=15, rounds=4, label="", args=()):
    """In-graph chained protocol (tools/bench_util.py): the old eager
    host-chained variant paid per-iteration dispatch + readback noise."""
    from tools.bench_util import bench_loop

    return bench_loop(fn, feed, probe, iters=iters, rounds=rounds,
                      label=label, args=args)


rng = np.random.RandomState(0)
image = jnp.asarray(rng.rand(1, 896, 896, 3) * 255, jnp.float32)
vit = VisionTransformer(pretrain_grid=37)
vp = jax.jit(vit.init)(jax.random.PRNGKey(0), image)
japply = jax.jit(vit.apply)
probe = lambda o: o["last_feat"][0, 0, 0, 0]

orig = A._attention_autoselect
bench(lambda x, p: japply(p, x), image, probe,
      label="trunk flash(auto)", args=(vp,))

# no attention at all (v passthrough)
A._attention_autoselect = lambda q, k, v: v
japply3 = jax.jit(lambda p, x: (vit.apply(p, x), 0)[0])
bench(lambda x, p: japply3(p, x), image, probe,
      label="trunk NO attn   ", args=(vp,))
A._attention_autoselect = orig

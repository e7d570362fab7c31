#!/usr/bin/env python
"""Trunk-level timing of attention variants @896^2 (N=4097, H=12, D=64)."""
import functools
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
probe = lambda o: o["last_feat"][0, 0, 0, 0]
orig = A._attention_autoselect

variants = []
for bq, bk in ((256, 512), (512, 512), (512, 1024), (1024, 1152),
               (256, 4608), (512, 4608)):
    variants.append((f"ours bq={bq} bk={bk}",
                     functools.partial(A.flash_attention,
                                       block_q=bq, block_k=bk)))


def stock(q, k, v):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as fa,
    )
    # expects [B, H, N, D]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    o = fa(qt, kt, vt, sm_scale=1.0 / (q.shape[-1] ** 0.5))
    return o.transpose(0, 2, 1, 3)


variants.append(("stock pallas", stock))

for name, impl in variants:
    A._attention_autoselect = impl
    try:
        jf = jax.jit(lambda p, x: vit.apply(p, x))
        bench(lambda x, p, f=jf: f(p, x), image, probe,
              label=f"trunk {name}", args=(vp,))
    except Exception as e:
        print(f"trunk {name}: FAILED {str(e).splitlines()[0][:120]}",
              flush=True)
A._attention_autoselect = orig

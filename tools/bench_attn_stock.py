#!/usr/bin/env python
"""Stock pallas flash attention with pad+segment-ids, measured in-trunk."""
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


def stock(q, k, v):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention as fa,
    )
    b, n, h, d = q.shape
    npad = -(-n // 128) * 128
    pad = ((0, 0), (0, npad - n), (0, 0), (0, 0))
    qt = jnp.pad(q, pad).transpose(0, 2, 1, 3)
    kt = jnp.pad(k, pad).transpose(0, 2, 1, 3)
    vt = jnp.pad(v, pad).transpose(0, 2, 1, 3)
    seg = jnp.where(jnp.arange(npad) < n, 1, 2).astype(jnp.int32)[None]
    seg = jnp.broadcast_to(seg, (b, npad))
    o = fa(qt, kt, vt, segment_ids=SegmentIds(q=seg, kv=seg),
           sm_scale=1.0 / (d ** 0.5))
    return o.transpose(0, 2, 1, 3)[:, :n]


rng = np.random.RandomState(0)
# correctness first (CPU-free: tiny case on TPU vs xla reference)
q = jnp.asarray(rng.rand(1, 4097, 12, 64), jnp.bfloat16)
a_ref = A.attention_xla(q[:, :300], q[:, :300], q[:, :300])
a_new = stock(q[:, :300], q[:, :300], q[:, :300])
print("stock correctness err:",
      float(jnp.abs(a_ref.astype(jnp.float32)
                    - a_new.astype(jnp.float32)).max()))

image = jnp.asarray(rng.rand(1, 896, 896, 3) * 255, jnp.float32)
vit = VisionTransformer(pretrain_grid=37)
vp = jax.jit(vit.init)(jax.random.PRNGKey(0), image)
probe = lambda o: o["last_feat"][0, 0, 0, 0]
A._attention_autoselect = stock
jf = jax.jit(lambda p, x: vit.apply(p, x))
bench(lambda x, p: jf(p, x), image, probe, label="trunk stock+segids",
      args=(vp,))

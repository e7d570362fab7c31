#!/usr/bin/env python
"""Is XLA's int8 x int8 -> int32 dot actually 2x bf16 on the v5e MXU?

Times the trunk's hot matmul shapes ([N, K] x [K, M] at 896^2 ViT-B
geometry) three ways: bf16 (the production dtype), raw int8 (upper
bound), and the full W8A8 dynamic-quant dense (ops/quant.int8_matmul,
which adds the absmax/round/rescale VPU tail). Chained scalar-carry
protocol (tools/bench_util.py) — the only timing the tunnel respects.

v5e peaks: ~197 bf16 TF/s, ~394 int8 TOPS. If raw int8 doesn't beat
bf16 here, the quant serving path can't win and the finding gets
recorded instead.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")


def main():
    from tools.bench_util import bench_loop

    # fc1 / fc2 / qkv / proj at b1 896^2 ViT-B (N=4097 padded 4224) and
    # the b8 trunk-training shape.
    shapes = [
        ("fc1 b1", (4224, 768, 3072)),
        ("qkv b1", (4224, 768, 2304)),
        ("proj b1", (4224, 768, 768)),
        ("fc1 b8", (8 * 4224, 768, 3072)),
    ]
    for name, (n, k, m) in shapes:
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        xb = (jax.random.normal(kx, (n, k), jnp.float32) * 0.5).astype(
            jnp.bfloat16)
        wf = jax.random.normal(kw, (k, m), jnp.float32) * 0.02
        xi = jnp.clip(jax.random.normal(kx, (n, k)) * 40, -127,
                      127).astype(jnp.int8)
        wi = jnp.clip(jax.random.normal(kw, (k, m)) * 40, -127,
                      127).astype(jnp.int8)
        flops = 2.0 * n * k * m

        def mm_bf16(x, w):
            return (x @ w.astype(jnp.bfloat16)).astype(jnp.float32).sum()

        def mm_int8(x, w):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).sum()

        def mm_quant(x, w):
            from ovmono3d_tpu.ops.quant import int8_matmul
            return int8_matmul(x, w, None, jnp.float32).sum()

        for tag, fn, feed, args in [
            ("bf16 ", mm_bf16, xb, (wf,)),
            ("int8 ", mm_int8, xi, (wi,)),
            ("quant", mm_quant, xb, (wf,)),
        ]:
            dt = bench_loop(fn, feed, lambda o: o, iters=30, rounds=5,
                            args=args)
            print(f"{name:8s} {tag}: {dt*1e3:8.3f} ms  "
                  f"{flops/dt/1e12:7.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Microbenchmark: Pallas flash-attention backward vs the XLA fallback.

Trunk training shapes (b8 x N4097 x H12 x D64 bf16). The XLA fallback
differentiates attention_xla (materializes [B, H, N, N] probability and
gradient tensors); the Pallas pair is flash_attention_fwd_lse +
flash_attention_bwd (ops/attention.py). Chained best-of-N with a scalar
probe (CLAUDE.md timing rules).
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")


def bench(fn, args, iters=10, rounds=4, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        probe = 0.0
        for _ in range(iters):
            out = fn(*args)
        # scalar probe: force one host read of a reduction
        probe = float(jax.tree.leaves(out)[0].sum())
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
        del probe
    print(f"{label}: {best * 1e3:.2f} ms", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=4097)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()

    from ovmono3d_tpu.ops.attention import (
        attention_xla,
        flash_attention_bwd,
        flash_attention_fwd_lse,
    )

    B, N, H, D = args.batch, args.seq, args.heads, args.dim
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 4)
    q, k, v, do = (
        jax.random.normal(kk, (B, N, H, D), jnp.float32).astype(jnp.bfloat16)
        for kk in ks
    )
    print(f"shapes: B{B} N{N} H{H} D{D} bf16", flush=True)

    fwd_lse = jax.jit(lambda q, k, v: flash_attention_fwd_lse(q, k, v))
    o, lse = fwd_lse(q, k, v)
    bench(fwd_lse, (q, k, v), label="pallas fwd(+lse)")

    pallas_pair = jax.jit(
        lambda q, k, v, o, lse, do: flash_attention_bwd(
            q, k, v, o, lse, do, fused=False)
    )
    bench(pallas_pair, (q, k, v, o, lse, do),
          label="pallas bwd split pair (dq,dk,dv)")
    for bk in (128, 256, 512):
        try:
            f = jax.jit(lambda q, k, v, o, lse, do, bk=bk:
                        flash_attention_bwd(q, k, v, o, lse, do,
                                            block_k=bk, fused=True))
            bench(f, (q, k, v, o, lse, do),
                  label=f"pallas bwd fused bk={bk}")
        except Exception as e:
            print(f"fused bk={bk} failed: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
    pallas_bwd = jax.jit(
        lambda q, k, v, o, lse, do: flash_attention_bwd(q, k, v, o, lse, do)
    )

    def xla_bwd(q, k, v, do):
        _, vjp = jax.vjp(attention_xla, q, k, v)
        return vjp(do)

    bench(jax.jit(xla_bwd), (q, k, v, do), label="xla fwd+bwd (fallback)")

    # sanity: grads agree
    want = jax.jit(xla_bwd)(q, k, v, do)
    got = pallas_bwd(q, k, v, o, lse, do)
    for name, g, w in zip(("dq", "dk", "dv"), got, want):
        err = float(jnp.max(jnp.abs(
            g.astype(jnp.float32) - w.astype(jnp.float32))))
        print(f"max|{name} - xla| = {err:.3e}", flush=True)


if __name__ == "__main__":
    main()

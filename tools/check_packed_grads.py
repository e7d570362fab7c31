#!/usr/bin/env python
"""On-TPU equivalence + speed of the channel-packed flash pair vs the
head-major kernels at trunk training shapes (b8, N=4097, H=12, D=64).

The interpret-mode tests (test_attention.py) prove the math on CPU; this
checks the REAL Mosaic lowering (odd-head 64-offset lane slices are the
risk) and measures the transpose savings the packed path exists for.

Prints o/lse/dq/dk/dv max-abs-diffs (expect <~1e-2 bf16) and chained
timings for fwd_lse and bwd under both layouts.
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
    from ovmono3d_tpu.ops.attention import (
        flash_attention_bwd,
        flash_attention_fwd_lse,
        flash_attention_packed_bwd,
        flash_attention_packed_lse,
    )
    from tools.bench_util import bench_loop

    B, N, H, D = 8, 4097, 12, 64
    if len(sys.argv) > 1 and sys.argv[1] == "--small":
        B, N, H, D = 2, 577, 16, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v, do = (
        (jax.random.normal(kk, (B, N, H, D), jnp.float32) * 0.5
         ).astype(jnp.bfloat16)
        for kk in ks
    )

    o_h, lse_h = flash_attention_fwd_lse(q, k, v)
    o_p, lse_p = flash_attention_packed_lse(q, k, v, num_heads=H)
    do_diff = float(jnp.max(jnp.abs(
        o_h.astype(jnp.float32) - o_p.astype(jnp.float32))))
    # head-major lse is [b*h, 1, n_q]; packed is [b, h//g, g, n_q]
    g = lse_p.shape[2]
    lse_p_bh = lse_p.reshape(B, H, -1).reshape(B * H, 1, -1)
    nq = min(lse_h.shape[2], lse_p_bh.shape[2])
    dlse = float(jnp.max(jnp.abs(
        lse_h[:, :, :min(N, nq)] - lse_p_bh[:, :, :min(N, nq)])))
    print(f"o diff {do_diff:.3e}  lse diff {dlse:.3e}", flush=True)

    g_h = flash_attention_bwd(q, k, v, o_h, lse_h, do)
    g_p = flash_attention_packed_bwd(q, k, v, o_p, lse_p, do, num_heads=H)
    for name, a, b in zip(("dq", "dk", "dv"), g_h, g_p):
        diff = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"{name} diff {diff:.3e}", flush=True)

    t = bench_loop(lambda x, kk, vv: flash_attention_fwd_lse(x, kk, vv)[0],
                   q, lambda o: o[0, 0, 0, 0], iters=10, rounds=3,
                   label="fwd_lse head-major", args=(k, v))
    tp = bench_loop(
        lambda x, kk, vv: flash_attention_packed_lse(
            x, kk, vv, num_heads=H)[0],
        q, lambda o: o[0, 0, 0, 0], iters=10, rounds=3,
        label="fwd_lse packed", args=(k, v))
    tb = bench_loop(
        lambda x, *a: flash_attention_bwd(*a, x)[0], do,
        lambda o: o[0, 0, 0, 0], iters=10, rounds=3,
        label="bwd head-major", args=(q, k, v, o_h, lse_h))
    tbp = bench_loop(
        lambda x, *a: flash_attention_packed_bwd(*a, x, num_heads=H)[0],
        do, lambda o: o[0, 0, 0, 0], iters=10, rounds=3,
        label="bwd packed", args=(q, k, v, o_p, lse_p))
    # Unchunked bk=256 (single q chunk; compiles thanks to the raised
    # per-kernel vmem limit) — isolates the q-chunking cost at shapes
    # where _packed_bwd_geometry would chunk.
    import ovmono3d_tpu.ops.attention as attn_mod

    orig_geom = attn_mod._packed_bwd_geometry
    attn_mod._packed_bwd_geometry = lambda n_q, block_k=256: (256, n_q)
    try:
        tbu = bench_loop(
            lambda x, *a: flash_attention_packed_bwd(
                *a, x, num_heads=H, block_k=256)[0],
            do, lambda o: o[0, 0, 0, 0], iters=10, rounds=3,
            label="bwd packed unchunked bk=256", args=(q, k, v, o_p, lse_p))
    finally:
        attn_mod._packed_bwd_geometry = orig_geom
    print(f"fwd_lse: head-major {t*1e3:.2f} ms  packed {tp*1e3:.2f} ms",
          flush=True)
    print(f"bwd:     head-major {tb*1e3:.2f} ms  packed {tbp*1e3:.2f} ms  "
          f"packed-unchunked {tbu*1e3:.2f} ms",
          flush=True)
    print("NOTE: head-major numbers EXCLUDE the XLA-side transposes the "
          "packed path eliminates — in-model savings are larger "
          "(tools/profile_train.py shows them as 'copy' ops).", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Cost of ONE SAM ViT-H global-block rel-pos attention (N=4096, H=16,
D=80, grid 64x64) via the production XLA path — sizing the Pallas
rel-pos-flash opportunity (the [B,H,N,N] logits/probs + [H,64,64,64(,64)]
bias grids all materialize in HBM)."""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")


def main():
    from ovmono3d_tpu.models.vit import _rel_pos_attention_fast
    from tools.bench_util import bench_loop

    B, N, H, D = 1, 4096, 16, 80
    h = w = 64
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q, k, v = (
        (jax.random.normal(kk, (B, N, H, D), jnp.float32) * 0.3
         ).astype(jnp.bfloat16) for kk in ks[:3])
    Rh = (jax.random.normal(ks[3], (h, h, D), jnp.float32) * 0.02
          ).astype(jnp.bfloat16)
    Rw = (jax.random.normal(ks[4], (w, w, D), jnp.float32) * 0.02
          ).astype(jnp.bfloat16)

    s = bench_loop(
        lambda x, *a: _rel_pos_attention_fast(x, *a, (h, w), 50.0),
        q, lambda o: o[0, 0, 0, 0], iters=10, rounds=3,
        label="global rel-pos attention (XLA fast path)",
        args=(k, v, Rh, Rw))
    print(f"global rel-pos attn: {s * 1e3:.3f} ms "
          f"(x4 blocks = {4 * s * 1e3:.1f} ms of the SAM encoder)")
    flops = 4 * B * H * N * N * D
    print(f"qk+pv flops {flops/1e9:.1f} GF -> {flops / s / 1e12:.1f} TF/s")

    # Pallas rel-pos flash (in-kernel bias expansion; ops/attention.py)
    from ovmono3d_tpu.ops.attention import rel_pos_flash_attention

    def flash_path(x, kk, vv, RhT, RwT):
        q_tok = x.reshape(B, h, w, H, D)
        qrh = jnp.einsum("brcnd,rkd->brcnk", q_tok, RhT,
                         preferred_element_type=jnp.float32
                         ).reshape(B, N, H, h)
        qrw = jnp.einsum("brcnd,ckd->brcnk", q_tok, RwT,
                         preferred_element_type=jnp.float32
                         ).reshape(B, N, H, w)
        return rel_pos_flash_attention(x, kk, vv, qrh, qrw, (h, w), H,
                                       clamp_c=50.0)

    # numerics first (vs the XLA fast path, both clamped bf16)
    a = _rel_pos_attention_fast(q, k, v, Rh, Rw, (h, w), 50.0)
    b = flash_path(q, k, v, Rh, Rw)
    import numpy as np
    diff = float(jnp.max(jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"flash vs XLA fast path max|diff| = {diff:.3e} (bf16 data)")

    s2 = bench_loop(
        flash_path, q, lambda o: o[0, 0, 0, 0], iters=10, rounds=3,
        label="global rel-pos attention (Pallas flash)",
        args=(k, v, Rh, Rw))
    print(f"pallas rel-pos flash: {s2 * 1e3:.3f} ms "
          f"({flops / s2 / 1e12:.1f} TF/s qk+pv; x4 blocks = "
          f"{4 * s2 * 1e3:.1f} ms)")

    # ---- WINDOWED shape (25 windows of 14x14; 28 such blocks in vit_h):
    # the kernel runs all 16 heads in one full-width group (14-wide bias
    # slices can't tile 128 lanes) and pads kv 196 -> 256 with -inf.
    Bw, wh, ww = 25, 14, 14
    Nw = wh * ww
    qw, kw, vw = (
        (jax.random.normal(kk, (Bw, Nw, H, D), jnp.float32) * 0.3
         ).astype(jnp.bfloat16) for kk in ks[:3])
    Rhw = (jax.random.normal(ks[3], (wh, wh, D), jnp.float32) * 0.02
           ).astype(jnp.bfloat16)
    Rww = (jax.random.normal(ks[4], (ww, ww, D), jnp.float32) * 0.02
           ).astype(jnp.bfloat16)

    sw = bench_loop(
        lambda x, *a: _rel_pos_attention_fast(x, *a, (wh, ww), 50.0),
        qw, lambda o: o[0, 0, 0, 0], iters=10, rounds=3,
        label="windowed rel-pos attention (XLA fast path)",
        args=(kw, vw, Rhw, Rww))
    print(f"windowed XLA fast path: {sw * 1e3:.3f} ms "
          f"(x28 blocks = {28 * sw * 1e3:.1f} ms)")

    def flash_win(x, kk, vv, RhT, RwT):
        q_tok = x.reshape(Bw, wh, ww, H, D)
        qrh = jnp.einsum("brcnd,rkd->brcnk", q_tok, RhT,
                         preferred_element_type=jnp.float32
                         ).reshape(Bw, Nw, H, wh)
        qrw = jnp.einsum("brcnd,ckd->brcnk", q_tok, RwT,
                         preferred_element_type=jnp.float32
                         ).reshape(Bw, Nw, H, ww)
        return rel_pos_flash_attention(x, kk, vv, qrh, qrw, (wh, ww), H,
                                       clamp_c=50.0)

    a = _rel_pos_attention_fast(qw, kw, vw, Rhw, Rww, (wh, ww), 50.0)
    bb = flash_win(qw, kw, vw, Rhw, Rww)
    diff = float(jnp.max(jnp.abs(
        a.astype(jnp.float32) - bb.astype(jnp.float32))))
    print(f"windowed flash vs XLA max|diff| = {diff:.3e}")
    sw2 = bench_loop(
        flash_win, qw, lambda o: o[0, 0, 0, 0], iters=10, rounds=3,
        label="windowed rel-pos attention (Pallas flash)",
        args=(kw, vw, Rhw, Rww))
    print(f"windowed pallas flash: {sw2 * 1e3:.3f} ms "
          f"(x28 blocks = {28 * sw2 * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()

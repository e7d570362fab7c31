#!/usr/bin/env python
"""Swin-B trunk cost attribution on the real TPU — the VERDICT-5 floor
artifact.

Measures the standalone Swin trunk @800² b1 (the GDINO canvas,
configs/GroundingDINO_SwinB_cfg.py backbone swin_B_384_22k) under:

  full        HEAD production path (clamped single-pass softmax, bf16-p)
  p_f32_l     pre-reorder window attention: row-sum l from f32 probs and a
              separate bf16 cast for PV (the pre-session-4 formulation)
  noclamp     two-pass exact softmax (OVMONO3D_WINDOW_CLAMP=0)
  hoist       full + precomputed rel-pos biases (production GDINO inference)
  attn_core   softmax-attention math replaced by a values passthrough;
              qkv/proj/pad/roll/partition kept  -> full − attn_core =
              pure attention-math cost in situ
  no_attn     whole attention branch (incl. layout) removed
  no_mlp      MLP branch removed

plus an analytic floor table (matmul GFLOP at the measured dense rate,
logits bytes at HBM bandwidth) so the residual can be judged against
hardware limits. Run on TPU; ~2 min warm.
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")

S = int(os.environ.get("PROBE_S", "800"))

from ovmono3d_tpu.ops.attention import (  # noqa: E402
    window_attention_xla as _ORIG_WINDOW_XLA,
)


def analytic_table(s: int):
    """Per-stage matmul GFLOP and f32-logits MB for Swin-B at side s."""
    dims = (128, 256, 512, 1024)
    heads = (4, 8, 16, 32)
    depths = (2, 2, 18, 2)
    win = 12
    rows = []
    hw = s // 4
    tot_gf = tot_mb = 0.0
    for si in range(4):
        c, h, d = dims[si], heads[si], depths[si]
        pad = -(-hw // win) * win if hw > win else hw
        nw = (pad // win) ** 2 if hw > win else 1
        n = min(win, hw) ** 2
        toks = hw * hw                      # MLP/qkv run unpadded
        gf = d * (24 * toks * c * c + 4 * nw * n * n * c) / 1e9
        mb = d * nw * h * n * n * 4 / 1e6   # f32 logits, one materialization
        rows.append((si, c, h, d, hw, pad, nw, gf, mb))
        tot_gf += gf
        tot_mb += mb
        hw = -(-hw // 2)
    print("\n--- analytic (matmul GF / f32-logit MB per forward) ---")
    for si, c, h, d, hwv, pad, nw, gf, mb in rows:
        print(f"  stage{si}: C={c:5d} H={h:2d} depth={d:2d} "
              f"hw={hwv:3d}->pad{pad:3d} nw={nw:3d}  {gf:7.1f} GF  "
              f"{mb:8.1f} MB")
    print(f"  total: {tot_gf:.1f} GF  {tot_mb:.1f} MB logits")
    print("  floors: matmul @180 TF/s = "
          f"{tot_gf / 180:.2f} ms; logits 3 f32 passes @800 GB/s = "
          f"{3 * tot_mb / 800e3 * 1e3:.2f} ms "
          f"(bf16-p: {2 * tot_mb / 800e3 * 1e3:.2f} ms)")


def window_attention_xla_f32l(q, k, v, bias, ids=None, clamp_c=None):
    """The pre-reorder clamp path: l summed from f32 p, separate bf16 cast
    into PV (two materializations of the [BW, H, N, N] probs)."""
    from ovmono3d_tpu.ops import attention as A

    BW, N, H, D = q.shape
    scale = 1.0 / (D**0.5)
    if clamp_c is None:
        # _ORIG, not the (patched) module attribute — avoids recursion.
        return _ORIG_WINDOW_XLA(q, k, v, bias, ids, None)
    scale = scale * A._LOG2E
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = attn + bias[None] * A._LOG2E
    if ids is not None:
        nw = ids.shape[0]
        m = jnp.where(ids[:, :, None] == ids[:, None, :], 0.0,
                      -1e9).astype(jnp.float32)
        attn = attn.reshape(BW // nw, nw, H, N, N) + m[None, :, None]
        attn = attn.reshape(BW, H, N, N)
    p = jnp.exp2(jnp.minimum(attn - clamp_c * A._LOG2E, 0.0))
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhnm,bmhd->bnhd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out / jnp.maximum(jnp.moveaxis(l, 1, 2), 1e-30)
    return out.astype(q.dtype)


def main():
    from ovmono3d_tpu.models.gdino import swin as swin_mod
    from ovmono3d_tpu.models.gdino.swin import (
        SwinTransformer, expand_rel_pos_biases,
    )
    from ovmono3d_tpu.ops import attention as A
    from tools.bench_util import bench_loop

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, S, S, 3), jnp.float32)
    results: dict[str, float] = {}

    def run(label, rel_biases=None, patch=None, env=None, **kw):
        old_env = {}
        for kname, val in (env or {}).items():
            old_env[kname] = os.environ.get(kname)
            os.environ[kname] = val
        old_fn = A.window_attention_xla
        if patch is not None:
            A.window_attention_xla = patch
        try:
            swin = SwinTransformer(**kw)
            sp = jax.jit(swin.init)(jax.random.PRNGKey(0), img)
            if rel_biases == "hoist":
                rb = {kk: jnp.asarray(vv) for kk, vv in
                      expand_rel_pos_biases(sp["params"]).items()}
                fn = lambda im, p: swin.apply(p, im, rel_biases=rb)
            else:
                fn = lambda im, p: swin.apply(p, im)
            dt = bench_loop(fn, img, lambda out: out["s3"][0, 0, 0, 0],
                            iters=10, label=label, args=(sp,))
            results[label] = dt
            print(f"  {label}: {dt * 1e3:.2f} ms", flush=True)
        finally:
            A.window_attention_xla = old_fn
            for kname, val in old_env.items():
                if val is None:
                    os.environ.pop(kname, None)
                else:
                    os.environ[kname] = val

    run("full")
    run("hoist", rel_biases="hoist")
    run("p_f32_l", patch=window_attention_xla_f32l)
    run("noclamp", env={"OVMONO3D_WINDOW_CLAMP": "0"})
    run("attn_core", debug_skip=("attn_core",))
    run("no_attn", debug_skip=("attn",))
    run("no_mlp", debug_skip=("mlp",))

    full = results["full"]
    print(f"\n--- attribution @ {S}x{S} b1 (ms) ---")
    print(f"  trunk full            {full * 1e3:8.2f}")
    print(f"  attention math        {(full - results['attn_core']) * 1e3:8.2f}"
          "   (full - attn_core)")
    print("  attn layout+qkv+proj  "
          f"{(results['attn_core'] - results['no_attn']) * 1e3:8.2f}"
          "   (attn_core - no_attn)")
    print(f"  mlp branch            {(full - results['no_mlp']) * 1e3:8.2f}"
          "   (full - no_mlp)")
    print("  bf16-p reorder        "
          f"{(results['p_f32_l'] - full) * 1e3:8.2f}   (p_f32_l - full)")
    print(f"  clamp softmax         {(results['noclamp'] - full) * 1e3:8.2f}"
          "   (noclamp - full)")
    print(f"  bias hoist            {(full - results['hoist']) * 1e3:8.2f}"
          "   (full - hoist)")
    analytic_table(S)


if __name__ == "__main__":
    main()

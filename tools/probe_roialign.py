#!/usr/bin/env python
"""A/B probe: separable-matmul ROIAlign contraction orders/layouts.

The train-step trace (tools/profile_train.py) shows the pooler's level-0
intermediate t = Ry@feat ([N,R,W,C] = [512,7,128,256] bf16 per image)
being LAYOUT-COPIED between the two einsums (2x ~5.7 ms/step at b8).
This probes contraction orders and output dim orders at the exact
box-pooler shapes to find a copy-free formulation:

  v0: current  t="nih,hwc->niwc"; out="njw,niwc->nijc"
  v1: flat GEMM first stage: [N*R,H]@[H,W*C], reshape, same second stage
  v2: t dims reordered "nih,hwc->nwic"; out="njw,nwic->nijc"
  v3: X first: t="njw,hwc->njhc"; out="nih,njhc->nijc"
  v4: arg-order swap in stage 2: "niwc,njw->nijc"

All variants are algebraically identical (checked vs v0).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")

B, N, R, H, W, C = 8, 512, 7, 128, 128, 256
DT = jnp.bfloat16


def v0(ry, rx, feat):
    t = jnp.einsum("nih,hwc->niwc", ry, feat,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("njw,niwc->nijc", rx, t.astype(DT),
                      preferred_element_type=jnp.float32)


def v1(ry, rx, feat):
    t = (ry.reshape(N * R, H) @ feat.reshape(H, W * C)).astype(DT)
    t = t.reshape(N, R, W, C)
    return jnp.einsum("njw,niwc->nijc", rx, t,
                      preferred_element_type=jnp.float32)


def v2(ry, rx, feat):
    t = jnp.einsum("nih,hwc->nwic", ry, feat,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("njw,nwic->nijc", rx, t.astype(DT),
                      preferred_element_type=jnp.float32)


def v3(ry, rx, feat):
    t = jnp.einsum("njw,hwc->njhc", rx, feat,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("nih,njhc->nijc", ry, t.astype(DT),
                      preferred_element_type=jnp.float32)


def v4(ry, rx, feat):
    t = jnp.einsum("nih,hwc->niwc", ry, feat,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("niwc,njw->nijc", t.astype(DT), rx,
                      preferred_element_type=jnp.float32)


def main():
    from tools.bench_util import bench_loop

    rng = np.random.RandomState(0)
    ry = jnp.asarray(rng.rand(N, R, H), DT)
    rx = jnp.asarray(rng.rand(N, R, W), DT)
    feat = jnp.asarray(rng.rand(H, W, C), DT)

    # batch over images the way the model does (vmap over the feature map,
    # shared boxes per image is close enough for layout behavior)
    feats = jnp.asarray(rng.rand(B, H, W, C), DT)

    variants = [("v0 current", v0), ("v1 flatgemm", v1),
                ("v2 t=nwic", v2), ("v3 x-first", v3), ("v4 argswap", v4)]
    ref = None
    for name, fn in variants:
        batched = jax.vmap(lambda f, _ry=ry, _rx=rx, _fn=fn:
                           _fn(_ry, _rx, f))
        out = np.asarray(jax.jit(batched)(feats), np.float32)
        if ref is None:
            ref = out
        else:
            err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
            assert err < 2e-2, (name, err)
        dt = bench_loop(
            lambda f, _b=batched: _b(f),
            feats, lambda o: o[0, 0, 0, 0, 0].astype(jnp.float32),
            iters=10, label=name,
        )
        print(f"{name:<14} {dt*1e3:8.3f} ms/step (b{B})")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B probe: ROIAlign separable-einsum formulations at the TRAIN shape.

The unfrozen-step trace (tools/profile_train.py --unfreeze) shows ~20 ms of
layout traffic around the [B=8, N=512, R=7, W=128, C=256] row-pool
intermediate: XLA lays out t = einsum('nih,hwc->niwc') with one minor pair
and the column contraction wants another, inserting 5.7 ms transposing
copies (~82 GB/s — far below HBM rate). Variants probed (value_and_grad of
a sum, the training access pattern, vmapped over B like roi_align_multilevel):

  v0: current        t('nih,hwc->niwc')      then 'njw,niwc->nijc'
  v1: swapped output t('nih,hwc->nicw')      then 'njw,nicw->nijc'
  v2: x-first        t('njw,hwc->njhc')      then 'nih,njhc->nijc'
  v3: one einsum     'nih,njw,hwc->nijc' (XLA picks the path)

All contract the same pairs; numerics differences are bf16 reassociation
only (reported).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")

B, N, R, H, W, C = 8, 512, 7, 128, 128, 256


def variants():
    def v0(ry, rx, feat):
        t = jnp.einsum("nih,hwc->niwc", ry, feat,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("njw,niwc->nijc", rx, t.astype(feat.dtype),
                          preferred_element_type=jnp.float32)

    def v1(ry, rx, feat):
        t = jnp.einsum("nih,hwc->nicw", ry, feat,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("njw,nicw->nijc", rx, t.astype(feat.dtype),
                          preferred_element_type=jnp.float32)

    def v2(ry, rx, feat):
        t = jnp.einsum("njw,hwc->njhc", rx, feat,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("nih,njhc->nijc", ry, t.astype(feat.dtype),
                          preferred_element_type=jnp.float32)

    def v3(ry, rx, feat):
        return jnp.einsum("nih,njw,hwc->nijc", ry, rx, feat,
                          preferred_element_type=jnp.float32)

    return {"v0_current": v0, "v1_nicw": v1, "v2_xfirst": v2,
            "v3_single": v3}


def main():
    rng = np.random.RandomState(0)
    ry = jnp.asarray(rng.rand(B, N, R, H), jnp.bfloat16)
    rx = jnp.asarray(rng.rand(B, N, R, W), jnp.bfloat16)
    feat = jnp.asarray(rng.rand(B, H, W, C), jnp.bfloat16)

    ref = None
    for name, fn in variants().items():
        pooled_fn = jax.vmap(fn)

        def loss(ry, rx, feat, f=pooled_fn):
            return jnp.sum(f(ry, rx, feat).astype(jnp.float32) ** 2)

        g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
        out = g(ry, rx, feat)
        jax.block_until_ready(out)
        best = None
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(10):
                out = g(ry, rx, feat)
            _ = float(out[0])
            dt = (time.perf_counter() - t0) / 10
            best = dt if best is None else min(best, dt)
        v = float(out[0])
        if ref is None:
            ref = v
        print(f"{name}: {best*1e3:.2f} ms/iter  loss rel-diff "
              f"{abs(v-ref)/abs(ref):.2e}", flush=True)


if __name__ == "__main__":
    main()

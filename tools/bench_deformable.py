#!/usr/bin/env python
"""Micro-benchmark: deformable-attention core at GDINO SwinB @800^2 shapes.

Encoder: Q = S = 13294 tokens (levels 100/50/25/13), H=8, D=32, L=4, P=4,
6 layers. Decoder: Q=900, 6 layers. Timing protocol per CLAUDE.md: chained
data dependency + forced host read, best of N.
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

SHAPES = [(100, 100), (50, 50), (25, 25), (13, 13)]
S = sum(h * w for h, w in SHAPES)
B, H, D, L, P = 1, 8, 32, 4, 4


def bench(fn, value, loc, wgt, n_rounds=6, iters=20, label=""):
    """In-graph chained iterations (tools/bench_util.py protocol)."""
    from tools.bench_util import bench_loop

    return bench_loop(fn, value,
                      lambda o: o[0, 0, 0], iters=iters, rounds=n_rounds,
                      label=label, args=(loc, wgt))


def main():
    from ovmono3d_tpu.models.gdino.deformable import (
        deformable_attention_core,
    )

    rng = np.random.RandomState(0)
    print("devices:", jax.devices())
    for Q, name in ((S, "encoder"), (900, "decoder")):
        value = jnp.asarray(rng.rand(B, S, H, D), jnp.float32)
        loc = jnp.asarray(rng.rand(B, Q, H, L, P, 2), jnp.float32)
        wgt = jnp.asarray(rng.rand(B, Q, H, L, P), jnp.float32)
        wgt = wgt / wgt.sum((-1, -2), keepdims=True)

        fn = jax.jit(
            lambda v, l, w: deformable_attention_core(v, SHAPES, l, w)
        )
        bench(fn, value, loc, wgt, label=f"{name} Q={Q} core")


if __name__ == "__main__":
    main()

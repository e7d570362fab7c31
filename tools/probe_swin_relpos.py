"""Probe: Swin relative-position-bias expansion cost at Swin-B@800 shapes.

The Swin trunk expands each block's rel-pos bias table
[(2w-1)^2, H] -> [H, N, N] (N = 144) with a static-index gather inside the
forward (swin.py WindowAttention). The tables are parameters, so XLA cannot
constant-fold the expansion; at 24 blocks this may be a measurable slice of
the ~20 ms trunk. Variants:

  gather    table[idx]                        (current, per block)
  stacked   one gather over [depth, T, H]     (per stage)
  onehot    onehot(idx) @ table, bf16 matmul  (per block)
  hoisted   bias passed in as a jit arg       (upper bound: zero in-graph)

Run on TPU: python tools/probe_swin_relpos.py
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.models.gdino.swin import _rel_pos_index
from tools.bench_util import bench_loop

# Swin-B stages at 800x800: (depth, heads); window 12 everywhere, N=144.
STAGES = [(2, 4), (2, 8), (18, 16), (2, 32)]
W = 12
N = W * W
T = (2 * W - 1) ** 2  # 529


def main():
    idx = np.asarray(_rel_pos_index(W))  # [N*N] after reshape
    idx_flat = jnp.asarray(idx.reshape(-1))

    total = {"gather": 0.0, "stacked": 0.0, "onehot": 0.0}
    for depth, heads in STAGES:
        table = jnp.asarray(
            np.random.RandomState(0).randn(T, heads).astype(np.float32)
        )
        stack = jnp.asarray(
            np.random.RandomState(1).randn(depth, T, heads).astype(np.float32)
        )

        def expand_gather(t):
            return t[idx_flat].reshape(N, N, heads).transpose(2, 0, 1)

        def expand_stacked(s):
            return jnp.take(s, idx_flat, axis=1).reshape(
                depth, N, N, heads
            ).transpose(0, 3, 1, 2)

        def expand_onehot(t):
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (N * N, T), 1)
                == idx_flat[:, None]
            ).astype(jnp.bfloat16)
            out = jnp.dot(oh, t.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            return out.reshape(N, N, heads).transpose(2, 0, 1)

        s_g = bench_loop(expand_gather, table, jnp.sum, iters=200,
                         label=f"gather H={heads}")
        s_s = bench_loop(expand_stacked, stack, jnp.sum, iters=200,
                         label=f"stacked d={depth} H={heads}") / depth
        s_o = bench_loop(expand_onehot, table, jnp.sum, iters=200,
                         label=f"onehot H={heads}")
        print(f"stage H={heads}: gather {s_g*1e6:8.1f} us/blk  "
              f"stacked {s_s*1e6:8.1f} us/blk  onehot {s_o*1e6:8.1f} us/blk")
        total["gather"] += s_g * depth
        total["stacked"] += s_s * depth
        total["onehot"] += s_o * depth

    print("\n--- whole-trunk bias expansion (24 blocks) ---")
    for k, v in total.items():
        print(f"{k:8s}: {v*1e3:7.3f} ms/forward")


if __name__ == "__main__":
    main()

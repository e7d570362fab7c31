#!/usr/bin/env python
"""Attribute the Depth-Pro fc1 "gelu VPU tail" (round-4 VERDICT item 6).

profile_depth.py put fc1+gelu at ~100 TF/s vs the ~184 TF/s pure-matmul
rate — the exact-erf gelu epilogue roughly doubles the stage. This probe
times the fc1 matmul at Depth-Pro patches shape ([35*592, 1024] x
[1024, 4096], bf16) under five epilogues to split matmul vs VPU cost:

  none       — matmul+bias only (the MXU floor)
  erf        — nn.gelu(approximate=False), the serving default
  tanh       — nn.gelu(approximate=True) (NOT bf16-exact: 405/65280
               bf16 inputs round differently, 1 ulp in the activation
               range, large in the denormal tail — /tmp experiments
               round 5; any switch must be opt-in)
  quick      — x*sigmoid(1.702x) (CLIP QuickGELU, different function)
  relu       — cheap VPU comparison point

If erf-vs-none is small, the stage is at its floor and we document; if
erf is expensive but tanh/quick are near-free, an opt-in epilogue knob
(like quant="int8") is justified. Chained scalar-carry protocol.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")


def main():
    from tools.bench_util import bench_loop

    n, k, m = 35 * 592, 1024, 4096   # Depth-Pro ViT-L patches fc1
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = (jax.random.normal(kx, (n, k), jnp.float32) * 0.5).astype(
        jnp.bfloat16)
    w = (jax.random.normal(kw, (k, m), jnp.float32) * 0.02).astype(
        jnp.bfloat16)
    b = jnp.zeros((m,), jnp.bfloat16)
    flops = 2.0 * n * k * m

    epilogues = {
        "none": lambda y: y,
        "erf": lambda y: jax.nn.gelu(y, approximate=False),
        "tanh": lambda y: jax.nn.gelu(y, approximate=True),
        "quick": lambda y: y * jax.nn.sigmoid(1.702 * y),
        "relu": jax.nn.relu,
    }
    results = {}
    for name, ep in epilogues.items():
        def fn(xx, ww, bb, ep=ep):
            return ep(xx @ ww + bb).astype(jnp.float32).sum()

        s = bench_loop(fn, x, lambda o: o, iters=20, rounds=3,
                       label=f"fc1+{name}", args=(w, b))
        results[name] = s
        print(f"fc1+{name:5s}: {s * 1e3:.3f} ms = "
              f"{flops / s / 1e12:.1f} TF/s", flush=True)
    base = results["none"]
    for name, s in results.items():
        if name != "none":
            print(f"  {name} epilogue cost: {(s - base) * 1e3:+.3f} ms")


if __name__ == "__main__":
    main()

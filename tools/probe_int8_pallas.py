#!/usr/bin/env python
"""Can Pallas/Mosaic emit NATIVE int8 MXU dots on this toolchain?

Round-4 finding (tools/probe_int8_matmul.py, recorded in ops/quant.py):
XLA lowers int8 x int8 -> int32 dot_general at the SAME rate as bf16
(97.9 vs 97.2 TF/s at fc1 shape), i.e. the 2x int8 MXU rate is not
engaged. This probe answers the follow-up (round-4 VERDICT item 5):
does a hand-written Pallas kernel with int8 operands and
preferred_element_type=int32 hit the native rate, or is the limitation
in Mosaic/libtpu itself?

Shapes: the ViT-B fc1 at b8/896^2 ([33792, 768] x [768, 3072]) — the
largest single serving matmul (tools/profile_oracle.py). Three timings:
  - XLA bf16 dot (the serving baseline, ~184 TF/s achievable here)
  - XLA int8 dot (the round-4 finding, bf16 rate)
  - Pallas int8 kernel (this probe)
If the Pallas kernel exceeds ~1.5x the bf16 rate, wire it into QDense
(ops/quant.py); otherwise record the toolchain floor next to the XLA
finding. Chained-dependency scalar-carry timing per CLAUDE.md.
"""
from __future__ import annotations

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")


def _int8_mm_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


@functools.partial(jax.jit, static_argnames=("bn", "bm"))
def pallas_int8_matmul(a: jax.Array, b: jax.Array, bn: int = 512,
                       bm: int = 512) -> jax.Array:
    n, k = a.shape
    k2, m = b.shape
    assert k == k2 and n % bn == 0 and m % bm == 0
    return pl.pallas_call(
        _int8_mm_kernel,
        grid=(n // bn, m // bm),
        in_specs=[
            pl.BlockSpec((bn, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, bm), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k * m,
            bytes_accessed=n * k + k * m + 4 * n * m,
            transcendentals=0,
        ),
    )(a, b)


def main():
    from tools.bench_util import bench_loop

    n, k, m = 33792, 768, 3072
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    xi = jnp.clip(jax.random.normal(kx, (n, k)) * 40, -127, 127).astype(
        jnp.int8)
    wi = jnp.clip(jax.random.normal(kw, (k, m)) * 40, -127, 127).astype(
        jnp.int8)
    xb = (jax.random.normal(kx, (n, k), jnp.float32) * 0.5).astype(
        jnp.bfloat16)
    wb = (jax.random.normal(kw, (k, m), jnp.float32) * 0.02).astype(
        jnp.bfloat16)
    flops = 2.0 * n * k * m

    # correctness first (tiny slice vs XLA int32 reference)
    got = pallas_int8_matmul(xi[:512], wi)
    want = jax.lax.dot_general(
        xi[:512], wi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    print("pallas int8 kernel exact vs XLA int32 reference", flush=True)

    def mm_bf16(x, w):
        return (x @ w).astype(jnp.float32).sum()

    def mm_int8_xla(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).sum()

    def mm_int8_pallas(x, w):
        return pallas_int8_matmul(x, w).sum()

    for name, fn, x, w in [
        ("bf16 XLA", mm_bf16, xb, wb),
        ("int8 XLA", mm_int8_xla, xi, wi),
        ("int8 Pallas", mm_int8_pallas, xi, wi),
    ]:
        # weights via args= (NOT closed over): jit inlines closures as
        # HLO literals and the axon relay 413s large remote-compile
        # uploads on a cache miss (tools/bench_util.py docstring).
        s = bench_loop(lambda xx, ww, fn=fn: fn(xx, ww), x,
                       lambda o: o, iters=10, rounds=3, label=name,
                       args=(w,))
        print(f"{name}: {s * 1e3:.3f} ms = {flops / s / 1e12:.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()

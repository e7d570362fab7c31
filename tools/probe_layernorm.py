#!/usr/bin/env python
"""A/B probe: LayerNorm formulations at ViT trunk shapes.

The train-step trace shows the trunk's 24 LayerNorms at ~2.3 ms each @b8
([8,4097,768] bf16 -> bf16), ~9x above the HBM-traffic floor; at b1 they
are ~0.11 ms each (1.6 ms of the 15.4 ms oracle step). Variants:

  v0: current LayerNormBf16Out math (XLA: f32 stats, bf16 out)
  v1: matmul-stats — mean/second-moment via a ones-vector MXU contraction
      (cancellation-prone var = m2 - mu^2; timing reference only)
  v2: Pallas row-block kernel — one HBM round-trip, two VMEM passes,
      f32 stats, bf16 out (exact same math as v0)

Numerics are checked against v0.
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

B, N, C = 8, 4097, 768
EPS = 1e-6


def v0(x, scale, bias):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mean).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + EPS)
    return (y * scale + bias).astype(x.dtype)


def v1(x, scale, bias):
    ones = jnp.ones((C, 1), x.dtype)
    mu = (x @ ones / C).astype(jnp.float32)           # [B, N, 1]
    m2 = ((x * x) @ ones / C).astype(jnp.float32)
    var = jnp.maximum(m2 - mu * mu, 0.0)
    y = (x.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + EPS)
    return (y * scale + bias).astype(x.dtype)


def _ln_kernel(x_ref, s_ref, b_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + EPS)
    o_ref[...] = (y * s_ref[...] + b_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def v2(x, scale, bias, block_rows: int = 512):
    m = B * N
    xm = x.reshape(m, C)
    pad = (-m) % block_rows
    if pad:
        xm = jnp.pad(xm, ((0, pad), (0, 0)))
    grid = (xm.shape[0] // block_rows,)
    out = pl.pallas_call(
        _ln_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(xm.shape, x.dtype),
    )(xm, scale.reshape(1, C), bias.reshape(1, C))
    return out[:m].reshape(B, N, C)


def _ln_kernel_dot(x_ref, s_ref, b_ref, o_ref):
    """Stats via MXU dots with a ones vector (no lane-dim VPU reduce)."""
    x = x_ref[...].astype(jnp.float32)
    ones = jnp.ones((C, 1), jnp.float32)
    s1 = jax.lax.dot_general(
        x, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [rows, 1]
    mu = s1 * (1.0 / C)
    xc = x - mu
    s2 = jax.lax.dot_general(
        xc * xc, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = xc * jax.lax.rsqrt(s2 * (1.0 / C) + EPS)
    o_ref[...] = (y * s_ref[...] + b_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def v3(x, scale, bias, block_rows: int = 512):
    m = B * N
    xm = x.reshape(m, C)
    pad = (-m) % block_rows
    if pad:
        xm = jnp.pad(xm, ((0, pad), (0, 0)))
    grid = (xm.shape[0] // block_rows,)
    out = pl.pallas_call(
        _ln_kernel_dot,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(xm.shape, x.dtype),
    )(xm, scale.reshape(1, C), bias.reshape(1, C))
    return out[:m].reshape(B, N, C)


def _ln_kernel_bf16(x_ref, s_ref, b_ref, o_ref):
    """All-bf16 elementwise path, f32 only for the stats dots."""
    x = x_ref[...]
    ones = jnp.ones((C, 1), jnp.bfloat16)
    s1 = jax.lax.dot_general(
        x, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mu = (s1 * (1.0 / C)).astype(jnp.float32)
    xc = x.astype(jnp.float32) - mu
    s2 = jax.lax.dot_general(
        (xc * xc).astype(jnp.bfloat16), ones.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = xc * jax.lax.rsqrt(s2 * (1.0 / C) + EPS)
    o_ref[...] = (y * s_ref[...] + b_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def v4(x, scale, bias, block_rows: int = 1024):
    m = B * N
    xm = x.reshape(m, C)
    pad = (-m) % block_rows
    if pad:
        xm = jnp.pad(xm, ((0, pad), (0, 0)))
    grid = (xm.shape[0] // block_rows,)
    out = pl.pallas_call(
        _ln_kernel_bf16,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(xm.shape, x.dtype),
    )(xm, scale.reshape(1, C), bias.reshape(1, C))
    return out[:m].reshape(B, N, C)


def main():
    from tools.bench_util import bench_loop

    rng = np.random.RandomState(0)
    # Residual-stream-like input: nonzero mean, moderate spread.
    x = jnp.asarray(rng.randn(B, N, C) * 1.7 + 0.8, jnp.bfloat16)
    scale = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)

    ref = np.asarray(jax.jit(v0)(x, scale, bias), np.float32)
    for name, fn in (("v0 xla", jax.jit(v0)), ("v1 matmul-stats",
                                               jax.jit(v1)),
                     ("v2 pallas", v2), ("v3 pallas-dot", v3),
                     ("v4 pallas-bf16dot", v4)):
        out = np.asarray(fn(x, scale, bias), np.float32)
        err = np.abs(out - ref).max()
        dt = bench_loop(
            lambda xx, s=scale, b=bias, f=fn: f(xx, s, b),
            x, lambda o: jnp.sum(o.astype(jnp.float32)),
            iters=100, label=name,
        )
        print(f"{name:<16} {dt*1e3:8.4f} ms/call (b{B})  "
              f"max|err| vs v0: {err:.2e}")


if __name__ == "__main__":
    main()

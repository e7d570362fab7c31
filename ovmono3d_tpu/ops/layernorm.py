"""Fused LayerNorm (f32 statistics, compute-dtype output) as a Pallas kernel.

MEASURED FINDING (round 3, v5e): NOT wired into the models. The train-step
profile showed 2.31 ms "convert_reduce_fusion" entries at [8, 4097, 768]
that looked like slow LNs, but the STANDALONE op — XLA or this kernel —
runs at HBM bandwidth (0.016-0.018 ms at that shape, all block sizes), and
wiring this kernel into LayerNormBf16Out made the b8 train step SLOWER
(222.9 vs 217.1 ms) by breaking XLA's surrounding fusions. The profile
entries are pipeline-stall/fusion attribution, not LN cost. The kernel is
kept (tested, differentiable) for shapes where XLA's fusion heuristics
misfire.

One pass per row block: load bf16, f32 mean/var on the VPU, normalize,
scale+shift, write bf16. Numerics match models/vit.py:LayerNormBf16Out
(flax nn.LayerNorm f32 stats + cast). Backward differentiates the
reference math via custom_vjp.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)                       # [R, C]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    o_ref[:] = (
        y * scale_ref[0][None, :] + bias_ref[0][None, :]
    ).astype(o_ref.dtype)


def _ln_reference(x, scale, bias, eps, out_dtype):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mean).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "out_dtype", "block_rows", "interpret")
)
def _ln_pallas(x, scale, bias, eps: float, out_dtype,
               block_rows: int = 256, interpret: bool = False):
    orig_shape = x.shape
    C = orig_shape[-1]
    rows = x.size // C
    x2 = x.reshape(rows, C)
    rp = -(-rows // block_rows) * block_rows
    x2 = jnp.pad(x2, ((0, rp - rows), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(rp // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, C), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * rp * C,
            bytes_accessed=rp * C * (x.dtype.itemsize
                                     + jnp.dtype(out_dtype).itemsize),
            transcendentals=rp,
        ),
        interpret=interpret,
    )(x2, scale[None], bias[None])
    return out[:rows].reshape(*orig_shape[:-1], C)


@functools.lru_cache(maxsize=None)
def _fused_core(eps: float, out_dtype_name: str):
    out_dtype = jnp.dtype(out_dtype_name)

    @jax.custom_vjp
    def f(x, scale, bias):
        if (jax.default_backend() == "tpu" and x.shape[-1] % 128 == 0
                and x.ndim >= 2):
            return _ln_pallas(x, scale, bias, eps, out_dtype)
        return _ln_reference(x, scale, bias, eps, out_dtype)

    def fwd(x, scale, bias):
        return f(x, scale, bias), (x, scale, bias)

    def bwd(res, g):
        x, scale, bias = res
        _, vjp = jax.vjp(
            lambda x_, s_, b_: _ln_reference(x_, s_, b_, eps, out_dtype),
            x, scale, bias,
        )
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def layer_norm_fused(x, scale, bias, eps: float = 1e-6,
                     out_dtype=jnp.bfloat16):
    """LayerNorm with f32 stats and `out_dtype` output; Pallas forward on
    TPU (C a lane multiple, the trunk/GDINO shapes), XLA elsewhere.
    Differentiable (custom_vjp with the reference-math backward)."""
    return _fused_core(float(eps), jnp.dtype(out_dtype).name)(x, scale, bias)

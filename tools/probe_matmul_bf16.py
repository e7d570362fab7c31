#!/usr/bin/env python
"""Per-level deformable sampling: gather vs one-hot matmul at bf16.

In the full GDINO model the value tables are bf16 (compute_dtype). bf16 x
bf16 products accumulate exactly in f32 on the MXU, so splitting the f32
bilinear weights into hi + lo bf16 terms (2 passes) reconstructs ~16
mantissa bits — error ~1e-4 relative, far below bf16 activation noise —
at ~1/3 the cost of Precision.HIGHEST f32. This probe measures, per level
at encoder shapes, the current paths vs bf16 1-pass and 2-pass matmul
sampling, plus numeric error vs the f32 scalar reference.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")

from ovmono3d_tpu.models.gdino.deformable import (  # noqa: E402
    _bilinear_hw,
    _bilinear_matmul,
)
from tools.bench_util import bench_loop  # noqa: E402

B, H, D, P = 1, 8, 32, 4
Q = 13294


def _matmul_bf16(v, x, y, passes=2, chunk=2048):
    """One-hot separable matmul with bf16 weights (1 or 2 passes).
    Head-major: v [B, H, h, w, D]; x/y [B, H, Q, P]."""
    B, H, h, w, D = v.shape
    Qn, P = x.shape[2], x.shape[3]
    vt = v.reshape(B, H, h, w * D).astype(jnp.bfloat16)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    iy = jnp.arange(h)
    ix = jnp.arange(w)
    wy = (jnp.where(iy == y0i[..., None], (1 - ly)[..., None], 0.0)
          + jnp.where(iy == y0i[..., None] + 1, ly[..., None], 0.0))
    wx = (jnp.where(ix == x0i[..., None], (1 - lx)[..., None], 0.0)
          + jnp.where(ix == x0i[..., None] + 1, lx[..., None], 0.0))
    wy = wy.reshape(B, H, Qn * P, h)
    wx = wx.reshape(B, H, Qn * P, w)

    nt = Qn * P
    pad = (-nt) % chunk
    wy = jnp.pad(wy, ((0, 0), (0, 0), (0, pad), (0, 0)))
    wx = jnp.pad(wx, ((0, 0), (0, 0), (0, pad), (0, 0)))
    nc = (nt + pad) // chunk
    wy = wy.reshape(B, H, nc, chunk, h).transpose(2, 0, 1, 3, 4)
    wx = wx.reshape(B, H, nc, chunk, w).transpose(2, 0, 1, 3, 4)

    def dot(wc, tab):
        return jax.lax.dot_general(
            wc, tab, (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )

    def one_chunk(carry, ws):
        wyc, wxc = ws
        hi = wyc.astype(jnp.bfloat16)
        rows = dot(hi, vt)
        if passes == 2:
            lo = (wyc - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            rows = rows + dot(lo, vt)
        rows = rows.reshape(B, H, chunk, w, D)
        return carry, jnp.sum(rows * wxc[..., None], axis=3)

    _, outs = jax.lax.scan(one_chunk, 0, (wy, wx))
    outs = outs.transpose(1, 2, 0, 3, 4).reshape(B, H, nc * chunk, D)
    return outs[:, :, :nt].reshape(B, H, Qn, P, D)


def main():
    rng = np.random.RandomState(0)
    print("devices:", jax.devices())
    for h, w in [(100, 100), (50, 50), (25, 25), (13, 13)]:
        v32 = jnp.asarray(rng.randn(B, H, h, w, D), jnp.float32)
        v16 = v32.astype(jnp.bfloat16)
        x = jnp.asarray(rng.rand(B, H, Q, P) * w - 0.5, jnp.float32)
        y = jnp.asarray(rng.rand(B, H, Q, P) * h - 0.5, jnp.float32)

        # numeric error vs f32 window-gather reference. Arrays go in as jit
        # ARGUMENTS (closures would inline them as HLO literals and trip
        # the axon remote-compile upload cap — bench_util.py docstring).
        ref = np.asarray(jax.jit(_bilinear_hw)(v32, x, y), np.float64)
        scale = np.abs(ref).mean() + 1e-9
        for name, fn in [
            ("bf16 gather", jax.jit(_bilinear_hw)),
            ("bf16 mm 1p", jax.jit(lambda vv, xx, yy: _matmul_bf16(
                vv, xx, yy, passes=1))),
            ("bf16 mm 2p", jax.jit(lambda vv, xx, yy: _matmul_bf16(
                vv, xx, yy, passes=2))),
            ("f32 mm HIGHEST", jax.jit(
                lambda vv, xx, yy: _bilinear_matmul(
                    vv.astype(jnp.float32), xx, yy))),
        ]:
            got = np.asarray(fn(v16, x, y), np.float64)
            err = np.abs(got - ref).max() / scale
            print(f"  L{h}x{w} {name:16s} max-err/|v| = {err:.2e}")

        # timing
        for name, f in [
            ("gather", lambda vv, xx, yy: _bilinear_hw(vv, xx, yy)),
            ("mm bf16 1p", lambda vv, xx, yy: _matmul_bf16(vv, xx, yy, 1)),
            ("mm bf16 2p", lambda vv, xx, yy: _matmul_bf16(vv, xx, yy, 2)),
            ("mm f32 HI", lambda vv, xx, yy: _bilinear_matmul(
                vv.astype(jnp.float32), xx, yy)),
        ]:
            bench_loop(
                lambda vv, xx, yy, ff=f: ff(vv, xx, yy).astype(jnp.float32),
                v16, lambda o: o[0, 0, 0, 0, 0], iters=15, rounds=4,
                label=f"L{h}x{w} {name}", args=(x, y),
            )


if __name__ == "__main__":
    main()

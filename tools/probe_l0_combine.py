#!/usr/bin/env python
"""A/B probe: level-0 (100^2) window-gather CORNER COMBINE variants.

The deformable 100^2 level is served by a 2x2xD-window gather
(deformable._bilinear_hw). Profiling the full GDINO forward shows the
gather itself at the per-index floor (~4.8 ms/enc-layer) plus ~1.1 ms for
the weighted corner-combine fusion, whose [T, 2, 2, 32] operand occupies
only 32 of 128 lanes (4x VPU-slot waste). This probe times the
gather+combine pipeline with combine variants at exact encoder shapes:

- v0: current 4-slice weighted sum + P-reduce.
- v1: flat [*, P*4D] multiply with broadcast-expanded weights, reshape-sum.
- v2: flat multiply + one-hot R-matmul reduction (all-MXU reduce).

Numerics are checked against v0 (same gather, same weights; bf16).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")

B, H, Q, P, D = 1, 8, 13294, 4, 32
h = w = 100


def gather_windows(v, x, y):
    """The production 2x2xD window gather ([B,H,h,w,D] table)."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    xs = jnp.clip(x0i, 0, w - 2)
    ys = jnp.clip(y0i, 0, h - 2)
    starts = jnp.stack(
        [ys.reshape(B, H, Q * P), xs.reshape(B, H, Q * P)], axis=-1
    )

    def g(op, st):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1),
        )
        return jax.lax.gather(
            op, st, dn, slice_sizes=(2, 2, D),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    win = jax.vmap(jax.vmap(g))(v, starts)
    return win.reshape(B, H, Q, P, 2, 2, D), (x0, y0, x0i, y0i, xs, ys)


def weights4(meta, x, y, wgt):
    """[B,H,Q,P,4] f32 weights (wy0wx0, wy0wx1, wy1wx0, wy1wx1) * attw."""
    x0, y0, x0i, y0i, xs, ys = meta
    lx = (x - x0)[..., None]
    ly = (y - y0)[..., None]
    y0e = y0i[..., None]
    x0e = x0i[..., None]
    ya0, ya1 = ys[..., None], ys[..., None] + 1
    xa0, xa1 = xs[..., None], xs[..., None] + 1
    wy0 = jnp.where(ya0 == y0e, 1 - ly, 0.0) + jnp.where(ya0 == y0e + 1, ly, 0.0)
    wy1 = jnp.where(ya1 == y0e, 1 - ly, 0.0) + jnp.where(ya1 == y0e + 1, ly, 0.0)
    wx0 = jnp.where(xa0 == x0e, 1 - lx, 0.0) + jnp.where(xa0 == x0e + 1, lx, 0.0)
    wx1 = jnp.where(xa1 == x0e, 1 - lx, 0.0) + jnp.where(xa1 == x0e + 1, lx, 0.0)
    wq = wgt[..., None]
    return jnp.concatenate(
        [wy0 * wx0 * wq, wy0 * wx1 * wq, wy1 * wx0 * wq, wy1 * wx1 * wq],
        axis=-1,
    )  # [B,H,Q,P,4]


def v0(v, x, y, wgt):
    win, meta = gather_windows(v, x, y)
    w4 = weights4(meta, x, y, wgt)

    def cw(a):
        return a.astype(jnp.bfloat16)

    s = (
        win[..., 0, 0, :] * cw(w4[..., 0:1])
        + win[..., 0, 1, :] * cw(w4[..., 1:2])
        + win[..., 1, 0, :] * cw(w4[..., 2:3])
        + win[..., 1, 1, :] * cw(w4[..., 3:4])
    )
    return jnp.sum(s, axis=3)


def v1(v, x, y, wgt):
    win, meta = gather_windows(v, x, y)
    w4 = weights4(meta, x, y, wgt).astype(jnp.bfloat16)
    winf = win.reshape(B, H, Q, P * 4 * D)
    w4e = jnp.broadcast_to(
        w4.reshape(B, H, Q, P, 4, 1), (B, H, Q, P, 4, D)
    ).reshape(B, H, Q, P * 4 * D)
    prod = winf * w4e
    return prod.reshape(B, H, Q, P * 4, D).sum(axis=3)


def v2(v, x, y, wgt):
    win, meta = gather_windows(v, x, y)
    w4 = weights4(meta, x, y, wgt).astype(jnp.bfloat16)
    winf = win.reshape(B, H, Q, P * 4 * D)
    w4e = jnp.broadcast_to(
        w4.reshape(B, H, Q, P, 4, 1), (B, H, Q, P, 4, D)
    ).reshape(B, H, Q, P * 4 * D)
    prod = winf * w4e
    R = (
        jax.lax.broadcasted_iota(jnp.int32, (P * 4 * D, D), 0) % D
        == jax.lax.broadcasted_iota(jnp.int32, (P * 4 * D, D), 1)
    ).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        prod, R, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


def main():
    from tools.bench_util import bench_loop

    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.rand(B, H, h, w, D), jnp.bfloat16)
    x = jnp.asarray(rng.rand(B, H, Q, P) * (w - 1), jnp.float32)
    y = jnp.asarray(rng.rand(B, H, Q, P) * (h - 1), jnp.float32)
    wgt = jnp.asarray(rng.rand(B, H, Q, P), jnp.float32)

    ref = np.asarray(jax.jit(v0)(v, x, y, wgt), jnp.float32)
    for name, fn in (("v0 current", v0), ("v1 flat+reshape-sum", v1),
                     ("v2 flat+R-matmul", v2)):
        out = np.asarray(jax.jit(fn)(v, x, y, wgt), jnp.float32)
        err = np.abs(out - ref).max()
        dt = bench_loop(
            lambda xx, vv, yy, ww: fn(vv, xx, yy, ww),
            x, lambda o: jnp.sum(o.astype(jnp.float32)),
            iters=50, label=name, args=(v, y, wgt),
        )
        print(f"{name:<22} {dt*1e3:7.3f} ms   max|err| vs v0: {err:.2e}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Probe: per-level cost of the deformable 2x2-window gather, and a
separable one-hot-matmul sampler for the small levels.

Question 1: is XLA's gather cost flat per row-segment (so the 25^2 and 13^2
levels cost as much as the 100^2 level despite tiny tables)?
Question 2: what does a points-chunked separable matmul sampler cost for the
small levels, and what's its numeric error vs the exact bilinear gather?
"""
import functools
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
B, H, D, P = 1, 8, 32, 4  # per-level points, production geometry
Q = S


def bench(fn, *args, iters=20, rounds=4, label=""):
    """Chain iterations INSIDE one jitted fori_loop (bench.py protocol) so
    tunnel dispatch latency is paid once per round, not per iteration."""
    v0, rest = args[0], args[1:]

    @jax.jit
    def loop(v, *rest):
        def body(i, carry):
            o = fn(carry, *rest)
            return v * (1.0 + o.ravel()[0] * 1e-12)
        return jax.lax.fori_loop(0, iters, body, v)

    float(np.asarray(loop(v0, *rest)).ravel()[0])  # compile + warm

    def rt():
        t0 = time.perf_counter()
        float(np.asarray(loop(v0, *rest)).ravel()[0])
        return (time.perf_counter() - t0) / iters

    best = min(rt() for _ in range(rounds))
    print(f"{label}: {best*1e3:.3f} ms", flush=True)
    return best


def window_gather_level(v, x, y):
    """One level of the production 2x2xD window sampler.
    v: [B,h,w,H,D]; x,y: [B,Q,H,P] pixel coords -> [B,Q,H,P,D]."""
    Bv, h, w, Hh, Dd = v.shape
    Qq, Pp = x.shape[1], x.shape[3]
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    lx = (x - x0)[..., None]; ly = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    xs = jnp.clip(x0i, 0, w - 2); ys = jnp.clip(y0i, 0, h - 2)
    vt = v.transpose(0, 3, 1, 2, 4)
    starts = jnp.stack(
        [ys.transpose(0, 2, 1, 3).reshape(Bv, Hh, Qq * Pp),
         xs.transpose(0, 2, 1, 3).reshape(Bv, Hh, Qq * Pp)], -1)

    def g(op, st):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        return jax.lax.gather(
            op, st, dn, slice_sizes=(2, 2, Dd),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    win = jax.vmap(jax.vmap(g))(vt, starts)
    win = win.reshape(Bv, Hh, Qq, Pp, 2, 2, Dd).transpose(0, 2, 1, 3, 4, 5, 6)
    y0e = y0i[..., None]; x0e = x0i[..., None]
    ya0 = ys[..., None]; ya1 = ys[..., None] + 1
    xa0 = xs[..., None]; xa1 = xs[..., None] + 1
    wy0 = jnp.where(ya0 == y0e, 1 - ly, 0.) + jnp.where(ya0 == y0e + 1, ly, 0.)
    wy1 = jnp.where(ya1 == y0e, 1 - ly, 0.) + jnp.where(ya1 == y0e + 1, ly, 0.)
    wx0 = jnp.where(xa0 == x0e, 1 - lx, 0.) + jnp.where(xa0 == x0e + 1, lx, 0.)
    wx1 = jnp.where(xa1 == x0e, 1 - lx, 0.) + jnp.where(xa1 == x0e + 1, lx, 0.)
    return (win[..., 0, 0, :] * wy0 * wx0 + win[..., 0, 1, :] * wy0 * wx1
            + win[..., 1, 0, :] * wy1 * wx0 + win[..., 1, 1, :] * wy1 * wx1)


def separable_matmul_level(v, x, y, chunk=2048, precision=None):
    """Same contract via separable one-hot matmuls, chunked over queries.
    wy[t, y] has <=2 nonzeros from the UNCLIPPED corner indices, so
    out-of-bounds corners contribute exactly zero."""
    Bv, h, w, Hh, Dd = v.shape
    Qq, Pp = x.shape[1], x.shape[3]
    vt = v.transpose(0, 3, 1, 2, 4).reshape(Bv, Hh, h, w * Dd)

    x0 = jnp.floor(x); y0 = jnp.floor(y)
    lx = x - x0; ly = y - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)

    iy = jnp.arange(h); ix = jnp.arange(w)
    # [B, Q, H, P, h] / [B, Q, H, P, w] one-hot bilinear row/col weights.
    wy = (jnp.where(iy == y0i[..., None], (1 - ly)[..., None], 0.)
          + jnp.where(iy == y0i[..., None] + 1, ly[..., None], 0.))
    wx = (jnp.where(ix == x0i[..., None], (1 - lx)[..., None], 0.)
          + jnp.where(ix == x0i[..., None] + 1, lx[..., None], 0.))
    # [B, H, Q*P, h/w]
    wy = wy.transpose(0, 2, 1, 3, 4).reshape(Bv, Hh, Qq * Pp, h)
    wx = wx.transpose(0, 2, 1, 3, 4).reshape(Bv, Hh, Qq * Pp, w)

    nt = Qq * Pp
    pad = (-nt) % chunk
    wy = jnp.pad(wy, ((0, 0), (0, 0), (0, pad), (0, 0)))
    wx = jnp.pad(wx, ((0, 0), (0, 0), (0, pad), (0, 0)))
    nc = (nt + pad) // chunk
    wy = wy.reshape(Bv, Hh, nc, chunk, h).transpose(2, 0, 1, 3, 4)
    wx = wx.reshape(Bv, Hh, nc, chunk, w).transpose(2, 0, 1, 3, 4)

    def one_chunk(carry, ws):
        wyc, wxc = ws  # [B, H, c, h], [B, H, c, w]
        rows = jax.lax.dot_general(
            wyc, vt, (((3,), (2,)), ((0, 1), (0, 1))),
            precision=precision)                     # [B, H, c, w*D]
        rows = rows.reshape(Bv, Hh, chunk, w, Dd)
        out = jnp.sum(rows * wxc[..., None], axis=3)  # [B, H, c, D]
        return carry, out

    _, outs = jax.lax.scan(one_chunk, 0, (wy, wx))
    outs = outs.transpose(1, 2, 0, 3, 4).reshape(Bv, Hh, nc * chunk, Dd)
    outs = outs[:, :, :nt].reshape(Bv, Hh, Qq, Pp, Dd)
    return outs.transpose(0, 2, 1, 3, 4)             # [B, Q, H, P, D]


def main():
    rng = np.random.RandomState(0)
    for (h, w) in SHAPES:
        v = jnp.asarray(rng.rand(B, h, w, H, D), jnp.float32)
        x = jnp.asarray(rng.rand(B, Q, H, P) * (w * 1.1) - 0.05 * w,
                        jnp.float32)
        y = jnp.asarray(rng.rand(B, Q, H, P) * (h * 1.1) - 0.05 * h,
                        jnp.float32)
        g = jax.jit(window_gather_level)
        bench(g, v, x, y, label=f"gather level {h}x{w}")
        if h <= 50:
            for prec, pname in ((None, "default"),
                                (jax.lax.Precision.HIGHEST, "highest")):
                m = jax.jit(functools.partial(
                    separable_matmul_level, precision=prec))
                a = np.asarray(g(v, x, y))
                b = np.asarray(m(v, x, y))
                print(f"  matmul {pname}: max abs err {np.abs(a-b).max():.2e}")
                bench(m, v, x, y, label=f"  matmul level {h}x{w} {pname}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Probe 4: one-segment-per-point bilinear taps via space-to-depth parity
tables.

Hypothesis: XLA TPU gather cost is flat per gathered contiguous row-segment
(tools/probe_level_costs.py finding). The current 2x2xD-window gather
(deformable.py `_bilinear_hw`) fetches TWO row-segments per point (rows
ys and ys+1). If the level table is re-packed so that every possible 2x2
window is ONE contiguous row — four parity-shifted space-to-depth copies,
window (ys, xs) lives at flat row ((ys%2)*2+xs%2)*Cy*Cx + (ys//2)*Cx+xs//2
with content [v[y0,x0], v[y0,x1], v[y1,x0], v[y1,x1]] (4D elements) — the
same taps cost ONE segment per point: expect ~2x on the gather-bound 100^2
level, at bit-identical numerics (same values, same weight math).

Pack cost: 16 stride-2 slices + concat (~16x the level table written once
per layer; 100^2 x D32 x H8 bf16 = 20 MB ≈ tens of µs of dense traffic).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")

B, H, D, P = 1, 8, 32, 4
Q = 13294  # encoder query count at 800^2


def pack_s2d(v):
    """v: [B, H, h, w, D] -> ([B, H, 4*Cy*Cx, 4D], Cy, Cx)."""
    Bv, Hh, h, w, Dd = v.shape
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
    Cy, Cx = h // 2, w // 2
    rows = []
    for py in (0, 1):
        for px in (0, 1):
            cells = []
            for dy in (0, 1):
                for dx in (0, 1):
                    s = vp[:, :, py + dy::2, px + dx::2, :]
                    cells.append(s[:, :, :Cy, :Cx, :])
            rows.append(jnp.concatenate(cells, axis=-1))  # [B,H,Cy,Cx,4D]
    tt = jnp.stack(rows, axis=2)  # [B, H, 4, Cy, Cx, 4D]
    return tt.reshape(Bv, Hh, 4 * Cy * Cx, 4 * Dd), Cy, Cx


def bilinear_s2d(v, x, y):
    """v: [B, H, h, w, D]; x/y: [B, H, Q, P] -> [B, H, Q, P, D]."""
    Bv, Hh, h, w, Dd = v.shape
    Qq, Pp = x.shape[2], x.shape[3]
    tt, Cy, Cx = pack_s2d(v)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0)[..., None]
    ly = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    xs = jnp.clip(x0i, 0, w - 2)
    ys = jnp.clip(y0i, 0, h - 2)
    fi = (((ys % 2) * 2 + (xs % 2)) * Cy + ys // 2) * Cx + xs // 2
    fi = fi.reshape(Bv, Hh, Qq * Pp)

    def g(op, st):  # op: [R, 4D]; st: [T, 1] -> [T, 4D]
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,),
        )
        return jax.lax.gather(
            op, st, dn, slice_sizes=(1, 4 * Dd),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    win = jax.vmap(jax.vmap(g))(tt, fi[..., None])
    win = win.reshape(Bv, Hh, Qq, Pp, 2, 2, Dd)

    y0e, x0e = y0i[..., None], x0i[..., None]
    ya0, ya1 = ys[..., None], ys[..., None] + 1
    xa0, xa1 = xs[..., None], xs[..., None] + 1
    wy0 = jnp.where(ya0 == y0e, 1 - ly, 0.0) + jnp.where(ya0 == y0e + 1, ly, 0.0)
    wy1 = jnp.where(ya1 == y0e, 1 - ly, 0.0) + jnp.where(ya1 == y0e + 1, ly, 0.0)
    wx0 = jnp.where(xa0 == x0e, 1 - lx, 0.0) + jnp.where(xa0 == x0e + 1, lx, 0.0)
    wx1 = jnp.where(xa1 == x0e, 1 - lx, 0.0) + jnp.where(xa1 == x0e + 1, lx, 0.0)
    if v.dtype == jnp.bfloat16:
        def cw(a):
            return a.astype(jnp.bfloat16)
    else:
        def cw(a):
            return a
    return (
        win[..., 0, 0, :] * cw(wy0 * wx0)
        + win[..., 0, 1, :] * cw(wy0 * wx1)
        + win[..., 1, 0, :] * cw(wy1 * wx0)
        + win[..., 1, 1, :] * cw(wy1 * wx1)
    )


def pack_overlap(v):
    """v: [B, H, h, w, D] -> [B, H, h*w, 4D]: row (y*w+x) holds the full
    2x2 window anchored at (y, x) — four 1-shifted contiguous copies
    concatenated on the lane dim (no stride-2 slicing)."""
    Bv, Hh, h, w, Dd = v.shape
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
    win = jnp.concatenate(
        [vp[:, :, dy:dy + h, dx:dx + w, :]
         for dy in (0, 1) for dx in (0, 1)], axis=-1,
    )  # [B, H, h, w, 4D] rows: [v(y,x), v(y,x+1), v(y+1,x), v(y+1,x+1)]
    return win.reshape(Bv, Hh, h * w, 4 * Dd)


def bilinear_overlap(v, x, y, tt=None):
    """One-segment-per-point via the overlapping-window table."""
    Bv, Hh, h, w, Dd = v.shape
    Qq, Pp = x.shape[2], x.shape[3]
    if tt is None:
        tt = pack_overlap(v)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0)[..., None]
    ly = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    xs = jnp.clip(x0i, 0, w - 2)
    ys = jnp.clip(y0i, 0, h - 2)
    fi = (ys * w + xs).reshape(Bv, Hh, Qq * Pp)

    def g(op, st):  # op: [R, 4D]; st: [T, 1] -> [T, 4D]
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,),
        )
        return jax.lax.gather(
            op, st, dn, slice_sizes=(1, 4 * Dd),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    win = jax.vmap(jax.vmap(g))(tt, fi[..., None])
    # row layout: [c00, c01, c10, c11] each D wide
    win = win.reshape(Bv, Hh, Qq, Pp, 2, 2, Dd)

    y0e, x0e = y0i[..., None], x0i[..., None]
    ya0, ya1 = ys[..., None], ys[..., None] + 1
    xa0, xa1 = xs[..., None], xs[..., None] + 1
    wy0 = jnp.where(ya0 == y0e, 1 - ly, 0.0) + jnp.where(ya0 == y0e + 1, ly, 0.0)
    wy1 = jnp.where(ya1 == y0e, 1 - ly, 0.0) + jnp.where(ya1 == y0e + 1, ly, 0.0)
    wx0 = jnp.where(xa0 == x0e, 1 - lx, 0.0) + jnp.where(xa0 == x0e + 1, lx, 0.0)
    wx1 = jnp.where(xa1 == x0e, 1 - lx, 0.0) + jnp.where(xa1 == x0e + 1, lx, 0.0)
    if v.dtype == jnp.bfloat16:
        def cw(a):
            return a.astype(jnp.bfloat16)
    else:
        def cw(a):
            return a
    return (
        win[..., 0, 0, :] * cw(wy0 * wx0)
        + win[..., 0, 1, :] * cw(wy0 * wx1)
        + win[..., 1, 0, :] * cw(wy1 * wx0)
        + win[..., 1, 1, :] * cw(wy1 * wx1)
    )


def bench(fn, args, read, iters=20, rounds=5, label=""):
    out = fn(*args)
    float(np.asarray(read(out)))

    def rt():
        t0 = time.perf_counter()
        a0 = args[0]
        for _ in range(iters):
            o = fn(a0, *args[1:])
            a0 = args[0] + read(o) * 1e-9
        float(np.asarray(read(o)))
        return (time.perf_counter() - t0) / iters

    best = min(rt() for _ in range(rounds))
    print(f"{label}: best {best*1e3:.3f} ms", flush=True)
    return best


def main():
    from ovmono3d_tpu.models.gdino.deformable import _bilinear_hw

    rng = np.random.RandomState(0)
    for (h, w) in ((100, 100), (50, 50)):
        x = jnp.asarray(rng.rand(B, H, Q, P) * (w * 1.1) - 0.05 * w,
                        jnp.float32)
        y = jnp.asarray(rng.rand(B, H, Q, P) * (h * 1.1) - 0.05 * h,
                        jnp.float32)
        for dt in (jnp.bfloat16, jnp.float32):
            v = jnp.asarray(rng.rand(B, H, h, w, D), dt)
            ref = jax.jit(_bilinear_hw)
            new = jax.jit(bilinear_overlap)
            pre = jax.jit(lambda tt, x, y, v: bilinear_overlap(v, x, y, tt))
            a = np.asarray(ref(v, x, y), np.float32)
            b = np.asarray(new(v, x, y), np.float32)
            err = np.abs(a - b).max()
            print(f"{h}x{w} {dt.__name__}: max abs err window-vs-overlap = "
                  f"{err:.2e}", flush=True)
            bench(ref, (v, x, y), lambda o: o[0, 0, 0, 0, 0],
                  label=f"{h}x{w} {dt.__name__} window 2-seg")
            bench(new, (v, x, y), lambda o: o[0, 0, 0, 0, 0],
                  label=f"{h}x{w} {dt.__name__} overlap 1-seg (pack incl)")
            ttc = jax.jit(pack_overlap)(v)
            bench(pre, (ttc, x, y, v), lambda o: o[0, 0, 0, 0, 0],
                  label=f"{h}x{w} {dt.__name__} overlap 1-seg (pre-packed)")


if __name__ == "__main__":
    main()

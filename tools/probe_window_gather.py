#!/usr/bin/env python
"""Probe 3: bilinear taps via 2x2xD window slices in one lax.gather.

Hypothesis: XLA TPU gather cost is per-slice, so fetching each point's 2x2
bilinear support as one slice (instead of 4 fused corner rows) is ~4x faster
at identical numerics.
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
B, H, D, L, P = 1, 8, 32, 4, 4


def window_bilinear(v, x, y):
    """v: [B, h, w, H, D]; x/y: [B, Q, H, P] pixel coords.
    Returns [B, Q, H, P, D] bilinear samples, zero outside. One (2,2,D)
    gather slice per point."""
    Bv, h, w, Hh, Dd = v.shape
    Q, Pp = x.shape[1], x.shape[3]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0)[..., None]                      # [B, Q, H, P, 1]
    ly = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    xs = jnp.clip(x0i, 0, w - 2)
    ys = jnp.clip(y0i, 0, h - 2)

    vt = v.transpose(0, 3, 1, 2, 4)               # [B, H, h, w, D]
    # starts: [B, H, Q*P, 2] (y, x)
    starts = jnp.stack(
        [ys.transpose(0, 2, 1, 3).reshape(Bv, Hh, Q * Pp),
         xs.transpose(0, 2, 1, 3).reshape(Bv, Hh, Q * Pp)], axis=-1
    )

    def g(op, st):  # op: [h, w, D]; st: [T, 2]
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        )
        return jax.lax.gather(
            op, st, dn, slice_sizes=(2, 2, Dd),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            indices_are_sorted=False, unique_indices=False,
        )  # [T, 2, 2, D]

    win = jax.vmap(jax.vmap(g))(vt, starts)       # [B, H, T, 2, 2, D]
    win = win.reshape(Bv, Hh, Q, Pp, 2, 2, Dd).transpose(0, 2, 1, 3, 4, 5, 6)
    # [B, Q, H, P, 2, 2, D]

    # Row/col interpolation weights aligned to the CLIPPED window: window
    # row a has grid y = ys+a; weight = (1-ly) where it equals y0, ly where
    # y0+1, else 0 — out-of-bounds corners never match, so they drop out.
    ya0 = ys[..., None]                            # a=0 coordinate
    wy0 = jnp.where(ya0 == y0i[..., None], 1 - ly, 0.0) + jnp.where(
        ya0 == y0i[..., None] + 1, ly, 0.0
    )
    ya1 = ys[..., None] + 1
    wy1 = jnp.where(ya1 == y0i[..., None], 1 - ly, 0.0) + jnp.where(
        ya1 == y0i[..., None] + 1, ly, 0.0
    )
    xa0 = xs[..., None]
    wx0 = jnp.where(xa0 == x0i[..., None], 1 - lx, 0.0) + jnp.where(
        xa0 == x0i[..., None] + 1, lx, 0.0
    )
    xa1 = xs[..., None] + 1
    wx1 = jnp.where(xa1 == x0i[..., None], 1 - lx, 0.0) + jnp.where(
        xa1 == x0i[..., None] + 1, lx, 0.0
    )
    # Also guard fully-outside rows/cols (y0 <= -2 or >= h): weights already
    # zero because neither window row matches y0/y0+1 -- except y0=-1 where
    # row0 matches y0+1 (in bounds, correct) -- so nothing more needed.
    return (
        win[..., 0, 0, :] * wy0 * wx0
        + win[..., 0, 1, :] * wy0 * wx1
        + win[..., 1, 0, :] * wy1 * wx0
        + win[..., 1, 1, :] * wy1 * wx1
    )


def core_window(value, spatial_shapes, loc, wgt):
    Bv, Ss, Hh, Dd = value.shape
    _, Q, _, Ll, Pp, _ = loc.shape
    sizes = [h * w for h, w in spatial_shapes]
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    out = jnp.zeros((Bv, Q, Hh, Dd), value.dtype)
    for li, (h, w) in enumerate(spatial_shapes):
        v = jax.lax.dynamic_slice_in_dim(
            value, int(offsets[li]), sizes[li], axis=1
        ).reshape(Bv, h, w, Hh, Dd)
        x = loc[:, :, :, li, :, 0] * w - 0.5
        y = loc[:, :, :, li, :, 1] * h - 0.5
        sampled = window_bilinear(v, x, y)
        out = out + jnp.sum(sampled * wgt[:, :, :, li, :, None], axis=3)
    return out.reshape(Bv, Q, Hh * Dd)


def bench(fn, value, loc, wgt, iters=20, rounds=5, label=""):
    out = fn(value, loc, wgt)
    float(np.asarray(out[0, 0, 0]))

    def rt():
        t0 = time.perf_counter()
        v = value
        for _ in range(iters):
            o = fn(v, loc, wgt)
            v = value + o[0, 0, 0] * 1e-9
        float(np.asarray(o[0, 0, 0]))
        return (time.perf_counter() - t0) / iters

    best = min(rt() for _ in range(rounds))
    print(f"{label}: best {best*1e3:.3f} ms")
    return best


def main():
    from ovmono3d_tpu.models.gdino.deformable import (
        deformable_attention_core,
    )

    rng = np.random.RandomState(0)
    for Q, name in ((S, "encoder"), (900, "decoder")):
        value = jnp.asarray(rng.rand(B, S, H, D), jnp.float32)
        # locations spanning in & out of bounds
        loc = jnp.asarray(rng.rand(B, Q, H, L, P, 2) * 1.1 - 0.05,
                          jnp.float32)
        wgt = jnp.asarray(rng.rand(B, Q, H, L, P), jnp.float32)
        wgt = wgt / wgt.sum((-1, -2), keepdims=True)

        ref = jax.jit(lambda v, l, w: deformable_attention_core(
            v, SHAPES, l, w))
        new = jax.jit(lambda v, l, w: core_window(v, SHAPES, l, w))
        a = np.asarray(ref(value, loc, wgt))
        b = np.asarray(new(value, loc, wgt))
        err = np.abs(a - b).max()
        print(f"{name}: max abs err vs current core = {err:.2e}")
        bench(ref, value, loc, wgt, label=f"{name} Q={Q} current")
        bench(new, value, loc, wgt, label=f"{name} Q={Q} window ")


if __name__ == "__main__":
    main()


def window_bilinear_perhead(v, x, y):
    """Same as window_bilinear but one gather op PER HEAD (python loop), so
    each gather's operand is small enough for a VMEM-resident loop."""
    Bv, h, w, Hh, Dd = v.shape
    Q, Pp = x.shape[1], x.shape[3]
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    lx = (x - x0)[..., None]; ly = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    xs = jnp.clip(x0i, 0, w - 2); ys = jnp.clip(y0i, 0, h - 2)
    vt = v.transpose(0, 3, 1, 2, 4)  # [B, H, h, w, D]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    outs = []
    for hi in range(Hh):
        st = jnp.stack([ys[:, :, hi].reshape(Bv * Q * Pp),
                        xs[:, :, hi].reshape(Bv * Q * Pp)], -1)
        win = jax.lax.gather(
            vt[0, hi], st, dn, slice_sizes=(2, 2, Dd),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        outs.append(win.reshape(Bv, Q, Pp, 2, 2, Dd))
    win = jnp.stack(outs, axis=2)  # [B, Q, H, P, 2, 2, D]
    ya0 = ys[..., None]; ya1 = ys[..., None] + 1
    xa0 = xs[..., None]; xa1 = xs[..., None] + 1
    y0e = y0i[..., None]; x0e = x0i[..., None]
    wy0 = jnp.where(ya0 == y0e, 1 - ly, 0.) + jnp.where(ya0 == y0e + 1, ly, 0.)
    wy1 = jnp.where(ya1 == y0e, 1 - ly, 0.) + jnp.where(ya1 == y0e + 1, ly, 0.)
    wx0 = jnp.where(xa0 == x0e, 1 - lx, 0.) + jnp.where(xa0 == x0e + 1, lx, 0.)
    wx1 = jnp.where(xa1 == x0e, 1 - lx, 0.) + jnp.where(xa1 == x0e + 1, lx, 0.)
    return (win[..., 0, 0, :] * wy0 * wx0 + win[..., 0, 1, :] * wy0 * wx1
            + win[..., 1, 0, :] * wy1 * wx0 + win[..., 1, 1, :] * wy1 * wx1)


def core_perhead(value, spatial_shapes, loc, wgt):
    Bv, Ss, Hh, Dd = value.shape
    _, Q, _, Ll, Pp, _ = loc.shape
    sizes = [h * w for h, w in spatial_shapes]
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    out = jnp.zeros((Bv, Q, Hh, Dd), value.dtype)
    for li, (h, w) in enumerate(spatial_shapes):
        v = jax.lax.dynamic_slice_in_dim(
            value, int(offsets[li]), sizes[li], axis=1
        ).reshape(Bv, h, w, Hh, Dd)
        x = loc[:, :, :, li, :, 0] * w - 0.5
        y = loc[:, :, :, li, :, 1] * h - 0.5
        sampled = window_bilinear_perhead(v, x, y)
        out = out + jnp.sum(sampled * wgt[:, :, :, li, :, None], axis=3)
    return out.reshape(Bv, Q, Hh * Dd)


def main2():
    from ovmono3d_tpu.models.gdino.deformable import (
        deformable_attention_core,
    )
    rng = np.random.RandomState(0)
    for Q, name in ((S, "encoder"), (900, "decoder")):
        value = jnp.asarray(rng.rand(B, S, H, D), jnp.float32)
        loc = jnp.asarray(rng.rand(B, Q, H, L, P, 2) * 1.1 - 0.05,
                          jnp.float32)
        wgt = jnp.asarray(rng.rand(B, Q, H, L, P), jnp.float32)
        wgt = wgt / wgt.sum((-1, -2), keepdims=True)
        ref = jax.jit(lambda v, l, w: deformable_attention_core(
            v, SHAPES, l, w))
        ph = jax.jit(lambda v, l, w: core_perhead(v, SHAPES, l, w))
        ph16 = jax.jit(lambda v, l, w: core_perhead(
            v.astype(jnp.bfloat16), SHAPES, l, w.astype(jnp.bfloat16)
        ).astype(jnp.float32))
        a = np.asarray(ref(value, loc, wgt))
        bb = np.asarray(ph(value, loc, wgt))
        cc = np.asarray(ph16(value, loc, wgt))
        print(f"{name}: perhead err {np.abs(a-bb).max():.2e}  "
              f"bf16 err {np.abs(a-cc).max():.2e}")
        bench(ph, value, loc, wgt, label=f"{name} Q={Q} perhead f32")
        bench(ph16, value, loc, wgt, label=f"{name} Q={Q} perhead bf16")


if __name__ == "__main__":
    main2()

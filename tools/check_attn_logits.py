#!/usr/bin/env python
"""Audit attention-logit ranges for the clamped single-pass softmax.

The TPU flash kernel's default single-block path (ops/attention.py,
_flash_kernel_single) is exact only while every softmax row's max raw
logit q.k/sqrt(d) lies inside [clamp-87, clamp] (clamp=50 by default).
Random init keeps logits tiny, but converted REAL trunks (DINOv2-class
models have extreme-norm outlier tokens) can exceed the window — run this
after converting a checkpoint to verify before trusting the fast kernel:

    python tools/check_attn_logits.py --trunk-ckpt dinov2_vitb14.pth \
        [--image path.jpg] [model overrides...]

It monkeypatches ops.attention.dot_product_attention with a capturing XLA
implementation, runs one backbone forward, and prints per-call row-max
logit ranges plus a verdict against the window. Set
OVMONO3D_ATTN_CLAMP=none (or a custom float) if the audit fails.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", default=None)
    ap.add_argument("--trunk-ckpt", default=None,
                    help="torch trunk checkpoint (utils.checkpoint_convert)")
    ap.add_argument("--image", default=None,
                    help="image to run (default: random normal input)")
    ap.add_argument("--clamp", type=float, default=50.0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform (no TPU tunnel)")
    ap.add_argument("opts", nargs="*", default=[])
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")

    import jax.numpy as jnp
    import numpy as np

    from ovmono3d_tpu import config as config_lib
    from ovmono3d_tpu.ops import attention as attn_mod

    records = []

    def _record(lo, hi):
        records.append((float(lo), float(hi)))

    def capturing_attention(q, k, v):
        d = q.shape[-1]
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q.astype(jnp.float32),
            k.astype(jnp.float32),
        ) / jnp.sqrt(jnp.float32(d))
        row_max = jnp.max(logits, axis=-1)
        # host capture works under jit (model.init is jitted)
        jax.debug.callback(_record, jnp.min(row_max), jnp.max(row_max))
        return attn_mod.attention_xla(q, k, v)

    # Patch both the module attribute and the vit import site.
    attn_mod.dot_product_attention = capturing_attention
    from ovmono3d_tpu.models import vit as vit_mod

    if hasattr(vit_mod, "dot_product_attention"):
        vit_mod.dot_product_attention = capturing_attention

    cfg = config_lib.load_config(args.config_file, overrides=args.opts)
    from ovmono3d_tpu.models.rcnn3d import build_model

    model = build_model(cfg.model)
    S = cfg.model.backbone.square_pad
    rng = np.random.RandomState(0)
    if args.image:
        import cv2

        im = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
        canvas = np.zeros((S, S, 3), np.float32)
        scale = min(S / im.shape[0], S / im.shape[1])
        nh, nw = int(im.shape[0] * scale), int(im.shape[1] * scale)
        canvas[:nh, :nw] = cv2.resize(im, (nw, nh)).astype(np.float32)
        image = canvas[None]
    else:
        image = (rng.rand(1, S, S, 3) * 255).astype(np.float32)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(image), jnp.eye(3)[None],
        jnp.full((1, 2), S, jnp.int32), jnp.ones((1,)),
    )
    if args.trunk_ckpt:
        from ovmono3d_tpu.utils.cnn_convert import load_cnn_trunk

        params = load_cnn_trunk(params, args.trunk_ckpt,
                                cfg.model.backbone.name)
        print(f"loaded trunk from {args.trunk_ckpt}")

    model.apply(params, jnp.asarray(image), method=type(model).features)

    lo = min(r[0] for r in records)
    hi = max(r[1] for r in records)
    print(f"attention calls captured: {len(records)}")
    print(f"row-max raw logit range: [{lo:.2f}, {hi:.2f}]")
    win_lo, win_hi = args.clamp - 87.0, args.clamp
    ok = lo >= win_lo and hi <= win_hi
    print(f"clamped-kernel exactness window: [{win_lo:.1f}, {win_hi:.1f}] "
          f"-> {'OK' if ok else 'VIOLATED - set OVMONO3D_ATTN_CLAMP'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

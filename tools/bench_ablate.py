#!/usr/bin/env python
"""Ablation timing of the flagship oracle path @896^2 b1 on one TPU chip.

Stages: ViT trunk / trunk+SFP / full model; plus the attention kernel alone
at backbone shapes. Chained-dependency best-of-N protocol (CLAUDE.md).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")


def bench(fn, feed, probe, iters=15, rounds=4, label="", args=()):
    """In-graph chained iterations (tools/bench_util.py protocol).
    Params go through `args` (bench_util docstring: closures inline them
    as HLO literals and overflow the axon remote-compile upload)."""
    from tools.bench_util import bench_loop

    return bench_loop(fn, feed, probe, iters=iters, rounds=rounds,
                      label=label, args=args)


def main():
    from __graft_entry__ import _flagship_config
    from ovmono3d_tpu.models.backbones import build_backbone
    from ovmono3d_tpu.models.rcnn3d import build_model
    from ovmono3d_tpu.models.vit import VisionTransformer
    from ovmono3d_tpu.ops.attention import dot_product_attention

    cfg = _flagship_config(square_pad=896)
    bb = cfg.model.backbone
    S = 896
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, S, S, 3) * 255, jnp.float32)

    # 1. attention kernel alone at backbone shape
    q = jnp.asarray(rng.rand(1, 4097, 12, 64), jnp.bfloat16)
    att = jax.jit(lambda x: dot_product_attention(x, x, x))
    bench(att, q, lambda o: o[0, 0, 0, 0].astype(jnp.bfloat16),
          label="attention kernel (B1 N4097 H12 D64), ONE call")

    # 2. ViT trunk alone
    vit = VisionTransformer(
        patch_size=bb.patch_size, embed_dim=bb.embed_dim, depth=bb.depth,
        num_heads=bb.num_heads, pretrain_grid=bb.pretrain_grid,
        layerscale=bb.layerscale, use_depth_fusion=bb.use_depth_fusion,
    )
    vp = jax.jit(vit.init)(jax.random.PRNGKey(0), image)
    bench(lambda x, p: vit.apply(p, x), image,
          lambda o: o["last_feat"][0, 0, 0, 0],
          label="ViT-B/14 trunk @896^2", args=(vp,))

    # 3. full backbone (trunk + SFP)
    full_bb = build_backbone(bb)
    bp = jax.jit(full_bb.init)(jax.random.PRNGKey(0), image)
    bench(lambda x, p: full_bb.apply(p, x), image,
          lambda o: o["p2"][0, 0, 0, 0],
          label="backbone trunk+SFP @896^2", args=(bp,))

    # 4. full model oracle path (the bench.py measurement)
    model = build_model(cfg.model)
    N = 64
    K = jnp.broadcast_to(
        jnp.array([[1000.0, 0, S / 2], [0, 1000.0, S / 2], [0, 0, 1]]),
        (1, 3, 3))
    im_hw = jnp.full((1, 2), S, jnp.int32)
    ratio = jnp.ones((1,), jnp.float32)
    boxes = jnp.tile(jnp.array([[50.0, 50.0, 400.0, 400.0]]), (1, N, 1))
    classes = jnp.zeros((1, N), jnp.int32)
    scores = jnp.full((1, N), 0.9, jnp.float32)
    valid = jnp.ones((1, N), bool)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1), image, K, im_hw, ratio,
        oracle_boxes=boxes, oracle_classes=classes, oracle_scores=scores,
        oracle_valid=valid)

    bench(lambda x, p: model.apply(
              p, x, K, im_hw, ratio, oracle_boxes=boxes,
              oracle_classes=classes, oracle_scores=scores,
              oracle_valid=valid),
          image, lambda o: o.scores[0, 0],
          label="full model oracle @896^2", args=(params,))


if __name__ == "__main__":
    main()

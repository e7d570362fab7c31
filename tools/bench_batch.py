#!/usr/bin/env python
"""Full oracle model @896^2: batch-size throughput sweep."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")
from __graft_entry__ import _flagship_config
from ovmono3d_tpu.models.rcnn3d import build_model

cfg = _flagship_config(square_pad=896)
model = build_model(cfg.model)
S, N = 896, 64
rng = np.random.RandomState(0)

for B in (1, 2, 4, 8):
    image = jnp.asarray(rng.rand(B, S, S, 3) * 255, jnp.float32)
    K = jnp.broadcast_to(
        jnp.array([[1000.0, 0, S / 2], [0, 1000.0, S / 2], [0, 0, 1]]),
        (B, 3, 3))
    im_hw = jnp.full((B, 2), S, jnp.int32)
    ratio = jnp.ones((B,), jnp.float32)
    boxes = jnp.tile(jnp.array([[[50.0, 50.0, 400.0, 400.0]]]), (B, N, 1))
    classes = jnp.zeros((B, N), jnp.int32)
    scores = jnp.full((B, N), 0.9, jnp.float32)
    valid = jnp.ones((B, N), bool)
    if B == 1:
        params = jax.jit(model.init)(
            jax.random.PRNGKey(1), image, K, im_hw, ratio,
            oracle_boxes=boxes, oracle_classes=classes,
            oracle_scores=scores, oracle_valid=valid)
    jm = jax.jit(lambda p, x, bx: model.apply(
        p, x, K, im_hw, ratio, oracle_boxes=bx, oracle_classes=classes,
        oracle_scores=scores, oracle_valid=valid))
    out = jm(params, image, boxes)
    float(np.asarray(out.scores[0, 0]))

    def rt(iters=12):
        t0 = time.perf_counter(); x = image
        for _ in range(iters):
            out = jm(params, x, boxes)
            x = image + out.scores[0, 0] * 1e-9
        float(np.asarray(out.scores[0, 0]))
        return (time.perf_counter() - t0) / iters
    dt = min(rt() for _ in range(4))
    print(f"B={B}: {dt*1e3:.2f} ms/iter -> {B/dt:.1f} img/s/chip "
          f"(p50-ish lat {dt*1e3/1:.1f} ms)", flush=True)

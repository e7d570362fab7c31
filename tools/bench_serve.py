#!/usr/bin/env python
"""Multi-chip GDINO serving throughput, measured on the real chip(s).

Round-2 VERDICT: serve.py's "no cross-chip collectives" design had CPU
parity tests but no measured per-chip number under the SERVING function
(bench_gdino times the raw forward). This times the serving graph's exact
body (model.apply + vmapped postprocess_grounding, the same computation
`make_gdino_serving_fn` jits — sharding comes from the committed input
shardings, identical program on this no-collective path) on the available
mesh — one image per chip per step — through tools/bench_util.bench_loop's
chained scalar-carry protocol (in-graph fori_loop data dependency + one
forced host scalar read per round; block_until_ready alone can return
early on the tunneled TPU). Reports img/s/chip. With data parallelism and
no cross-chip collectives in the hot path, N chips project to N x this
number; the CPU-mesh parity test (tests/test_serve.py) covers the N>1
correctness half.

Prints ONE JSON line (SERVE_r style).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")

REF_GPU_IMG_PER_S = 4.6  # BASELINE.md GDINO-SwinB GPU anchor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--topk", type=int, default=100)
    args = ap.parse_args()

    from ovmono3d_tpu.models.gdino.inference import build_text_inputs
    from ovmono3d_tpu.models.gdino.model import GroundingDINO
    from ovmono3d_tpu.models.gdino.swin import expand_rel_pos_biases
    from ovmono3d_tpu.models.gdino.tokenizer import BertTokenizer
    from ovmono3d_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicated,
    )

    mesh = make_mesh()
    n_data = mesh.shape["data"]
    S = args.size
    print(f"mesh data={n_data}, serving {n_data} x {S}^2/step", flush=True)

    cats = ["chair", "table", "sofa", "bottle", "cup", "laptop", "book",
            "clock", "vase", "lamp"]
    words = sorted({w for c in cats for w in c.lower().split()})
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, ".": 4}
    for w in words:
        vocab[w] = len(vocab)
    tok = BertTokenizer(vocab)

    model = GroundingDINO()
    text = build_text_inputs(tok, cats, max_len=model.max_text_len,
                             max_phrases=64)
    text_args = tuple(
        jnp.asarray(text[k])
        for k in ("input_ids", "text_mask", "text_self_mask",
                  "position_ids", "span_matrix", "span_valid")
    )

    rng = np.random.RandomState(0)
    images = rng.randn(n_data, S, S, 3).astype(np.float32)
    im_hw = np.full((n_data, 2), S, np.float32)

    t0 = time.time()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, S, S, 3)),
        jnp.asarray(text["input_ids"]),
        jnp.asarray(text["text_mask"]),
        jnp.asarray(text["text_self_mask"]),
        jnp.asarray(text["position_ids"]),
    )
    print(f"init: {time.time() - t0:.1f}s", flush=True)

    from ovmono3d_tpu.models.gdino.inference import (
        BOX_THRESHOLD,
        NMS_THRESHOLD,
        postprocess_grounding,
    )
    from bench_util import bench_loop

    data = batch_sharding(mesh)
    repl = replicated(mesh)
    params_d = jax.device_put(params, repl)
    biases = jax.device_put(
        expand_rel_pos_biases(params["params"]["backbone"],
                              window=model.swin_window), repl)
    images_d = jax.device_put(images, data)
    im_hw_d = jax.device_put(im_hw, data)
    # The serving-fn body (parallel/serve.py make_gdino_serving_fn.run),
    # expressed as fn(feed, *args) for the chained timing loop. Probe is
    # the score sum: depends on the full forward through the matmul stack,
    # so XLA cannot dead-code the model (bench_util pitfall #1).
    def serve_body(images, params, im_hw, rel_biases):
        (input_ids, text_mask, self_mask, pos_ids, span_matrix,
         span_valid) = text_args
        B = images.shape[0]
        out = model.apply(
            params, images,
            jnp.broadcast_to(input_ids, (B,) + input_ids.shape[1:]),
            jnp.broadcast_to(text_mask, (B,) + text_mask.shape[1:]),
            jnp.broadcast_to(self_mask, (B,) + self_mask.shape[1:]),
            jnp.broadcast_to(pos_ids, (B,) + pos_ids.shape[1:]),
            rel_biases,
        )
        return jax.vmap(
            lambda lg, bx, hw: postprocess_grounding(
                lg, bx, span_matrix, span_valid, hw, topk=args.topk,
                box_threshold=BOX_THRESHOLD, nms_threshold=NMS_THRESHOLD,
            )
        )(out["pred_logits"], out["pred_boxes"], im_hw)

    best = bench_loop(
        serve_body, images_d,
        probe=lambda o: jnp.sum(o[1]),   # scores
        iters=args.iters, rounds=args.rounds,
        label=f"serving fn @{S}^2 x{n_data}",
        args=(params_d, im_hw_d, biases),
    )

    per_chip = 1.0 / best  # one image per chip per step
    print(
        f"serving @{S}^2 x{n_data} chips: {best * 1e3:.1f} ms/step = "
        f"{per_chip:.2f} img/s/chip ({n_data / best:.2f} img/s total)",
        flush=True,
    )
    print(json.dumps({
        "metric": f"gdino_serving_{S}_img_per_s_per_chip",
        "value": round(per_chip, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip / REF_GPU_IMG_PER_S, 3),
        "n_chips": n_data,
        "p50_latency_ms": round(best * 1e3, 2),
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Sub-stage timing of the open-vocab lift pipeline (tools/bench_lift.py).

Separates, for the detect stage: host prep (cv2 + normalize), feed upload,
the jitted forward+postprocess graph with PRE-STAGED device inputs
(chained best-of-N, scalar probe), and the result readback; and for the
lift stage: canvas prep, upload, jitted graph with staged inputs.
Identifies which part of the e2e 333 ms is graph vs host vs tunnel.
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


def main():
    from __graft_entry__ import _flagship_config
    from ovmono3d_tpu.models.gdino.tokenizer import BertTokenizer
    from ovmono3d_tpu.models.gdino.inference import build_text_inputs
    from ovmono3d_tpu.models.ovmono3d import OVMono3DLift, default_focal_K
    from tools.bench_lift import CATEGORIES
    from tools.bench_util import bench_loop

    cfg = _flagship_config(square_pad=896)
    words = sorted({w for c in CATEGORIES for w in c.lower().split()})
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, ".": 4}
    for w in words:
        vocab[w] = len(vocab)
    tok = BertTokenizer(vocab)

    t0 = time.time()
    pipe = OVMono3DLift.build(cfg, tok)
    print(f"init: {time.time() - t0:.1f}s", flush=True)

    h, w = 480, 640
    rng = np.random.RandomState(0)
    image = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    K = default_focal_K(h, w)

    # ---- host prep cost
    t0 = time.perf_counter()
    for _ in range(10):
        tensor, gscale = pipe._prep_gdino_image(image)
    prep_gdino = (time.perf_counter() - t0) / 10
    t0 = time.perf_counter()
    for _ in range(10):
        canvas, hw, lscale = pipe._prep_lift_canvas(image)
    prep_lift = (time.perf_counter() - t0) / 10
    print(f"host prep: gdino {prep_gdino * 1e3:.1f} ms, "
          f"lift {prep_lift * 1e3:.1f} ms", flush=True)

    # ---- tokenization cost
    full = pipe.gdino.max_text_len
    t0 = time.perf_counter()
    for _ in range(10):
        text = build_text_inputs(tok, CATEGORIES, max_len=full,
                                 max_phrases=max(64, len(CATEGORIES)))
    print(f"tokenize: {(time.perf_counter() - t0) / 10 * 1e3:.1f} ms",
          flush=True)

    n_tok = int(text["text_mask"][0].sum())
    T = 32
    while T < n_tok and T < full:
        T *= 2
    T = min(T, full)
    print(f"text bucket T={T}", flush=True)

    # ---- upload cost (9.6 MB canvas + text arrays), isolated
    feed_np = {
        "tensor": tensor.astype(np.float32),
        "ids": text["input_ids"][:, :T],
        "mask": text["text_mask"][:, :T],
        "self_mask": text["text_self_mask"][:, :T, :T],
        "pos": text["position_ids"][:, :T],
        "span_m": text["span_matrix"],
        "span_v": text["span_valid"],
    }
    for _ in range(3):
        t0 = time.perf_counter()
        staged = jax.device_put(feed_np)
        jax.block_until_ready(staged)
        up = time.perf_counter() - t0
    print(f"detect feed upload: {up * 1e3:.1f} ms "
          f"({sum(v.nbytes for v in feed_np.values()) / 1e6:.1f} MB)",
          flush=True)

    # ---- jitted detect graph with staged inputs (chained protocol)
    biases = pipe._swin_rel_biases()
    fn = pipe._jitted("gdino_detect", pipe._detect_fn)

    def chained(tensor_dev):
        out = fn(pipe.gdino_params, tensor_dev, staged["ids"],
                 staged["mask"], staged["self_mask"], staged["pos"],
                 biases, staged["span_m"], staged["span_v"])
        return out

    # warm
    out = chained(staged["tensor"])
    jax.block_until_ready(out)
    iters = 10
    best = None
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = chained(staged["tensor"])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(f"detect graph (staged inputs): {best * 1e3:.1f} ms", flush=True)

    # ---- result readback
    t0 = time.perf_counter()
    for _ in range(5):
        _ = tuple(np.asarray(x) for x in out)
    print(f"detect readback: {(time.perf_counter() - t0) / 5 * 1e3:.2f} ms",
          flush=True)

    # ---- lift graph with staged inputs
    lift_feed = jax.device_put({
        "canvas": canvas[None],
        "K": np.asarray(K, np.float32)[None],
        "hw": np.asarray([[hw[0], hw[1]]], np.int32),
        "ratio": np.asarray([1.0 / lscale], np.float32),
        "scale": np.asarray(lscale / gscale, np.float32),
    })
    lfn = pipe._jitted("rcnn_lift", pipe._lift_fn)

    def lift_once(boxes, classes, scores, valid):
        return lfn(pipe.rcnn_params, lift_feed["canvas"], lift_feed["K"],
                   lift_feed["hw"], lift_feed["ratio"], None,
                   boxes, classes, scores, valid, lift_feed["scale"])

    det = lift_once(out[0], out[2], out[1], out[3])
    jax.block_until_ready(det)
    best = None
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(iters):
            det = lift_once(out[0], out[2], out[1], out[3])
        jax.block_until_ready(det)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(f"lift graph (staged inputs): {best * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

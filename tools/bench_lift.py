#!/usr/bin/env python
"""End-to-end open-vocabulary LIFT benchmark on one TPU chip.

The pipeline users actually run (reference demo protocol,
/root/reference/demo/demo.py:31-118): original image -> GroundingDINO
open-vocab 2D detection on the square canvas -> square-pad RCNN trunk +
cube head lifting of every surviving box -> 3D cuboids, via
`OVMono3DLift.predict` (models/ovmono3d.py:311).

Unlike bench.py / bench_gdino.py (single jitted graphs timed with the
chained-dependency protocol), predict() crosses the host per image (prep +
feed upload), so two numbers matter:

- THROUGHPUT: two sustained protocols. (a) `--stream N`: the
  predict_stream chunked-scan driver — each dispatch runs `--chunk`
  images through the fused program via lax.scan, so the relay sync is
  paid once per chunk BY CONSTRUCTION (the chained device-floor
  protocol below is this driver minus the real data I/O). (b)
  `--depth`-deep per-image submit-ahead (block on predict i-depth
  before dispatching i). Host prep overlaps device execution in both;
  the tunnel's per-sync completion latency (~30 ms best, 100-250 ms
  tail that GROWS over a sustained run — measured round 3; an artifact
  of the axon relay, not the TPU) amortizes 1/chunk in (a), partially
  in (b).
- LATENCY: p50/mean of fully-blocking sequential predict() calls — what a
  single caller sees, tunnel tail included.

Headline = best per-image time under either protocol (the repo's best-of
convention for this link); device graph total is ~155 ms/img
(tools/probe_lift_stages.py: detect 135 + lift 19), the floor.
Prints ONE JSON line like bench.py.

Reference anchor: the demo pipeline shares GDINO's GPU cost profile —
BASELINE.md records 4.6 img/s for GDINO-SwinB detection alone on the
reference GPU, with the cube lift adding trunk+heads on top; no official
end-to-end number is published, so vs_baseline uses the GDINO anchor.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")

REF_GPU_IMG_PER_S = 4.6  # BASELINE.md GDINO anchor (detect stage alone)

# The reference demo's example vocabulary scale: coco_examples labels.json
# prompts ~10-30 categories per image.
CATEGORIES = [
    "chair", "table", "sofa", "bed", "television", "laptop", "keyboard",
    "mouse", "bottle", "cup", "bowl", "book", "clock", "vase", "potted plant",
    "lamp", "cabinet", "refrigerator", "oven", "sink",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--depth", type=int, default=4,
                    help="pipeline depth for the throughput measurement")
    ap.add_argument("--image-hw", type=int, nargs=2, default=(480, 640),
                    help="original image size fed to the pipeline")
    ap.add_argument("--stream", type=int, default=48,
                    help="images in the streaming-driver measurement "
                         "(0 disables)")
    ap.add_argument("--chunk", default="2,4",
                    help="streaming-driver chunk (images per dispatch); "
                         "comma list sweeps, best is reported. Measured "
                         "2026-08-21: chunk-2 123.3 ms/img == the device "
                         "floor; larger chunks pay slightly more readback "
                         "latency per sync (4: 126.7, 8: 130.3, 16: 137.9)")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_config
    from ovmono3d_tpu.models.gdino.tokenizer import BertTokenizer
    from ovmono3d_tpu.models.ovmono3d import OVMono3DLift, default_focal_K

    cfg = _flagship_config(square_pad=896)

    # Word-level fallback vocab over the prompt words (random-weight bench;
    # real runs ship bert vocab with the checkpoint) — same construction as
    # tools/demo.py's no-vocab path.
    words = sorted({w for c in CATEGORIES for w in c.lower().split()})
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, ".": 4}
    for w in words:
        vocab[w] = len(vocab)
    tok = BertTokenizer(vocab)

    t0 = time.time()
    pipe = OVMono3DLift.build(cfg, tok)
    print(f"init: {time.time() - t0:.1f}s", flush=True)

    h, w = args.image_hw
    rng = np.random.RandomState(0)
    image = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    K = default_focal_K(h, w)

    print("[compiling] detect_2d + lift_3d", flush=True)
    t0 = time.time()
    for _ in range(args.warmup):
        det = pipe.predict(image, K, CATEGORIES)
        jax.block_until_ready(det)
    print(f"warmup: {time.time() - t0:.1f}s", flush=True)

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        det = pipe.predict(image, K, CATEGORIES)
        jax.block_until_ready(det)
        times.append(time.perf_counter() - t0)
    times = np.array(times)

    # Throughput: `depth` predicts in flight (see module docstring).
    # Best-of-3 rounds, like every chained bench in this repo.
    best_tp = None
    for _ in range(3):
        inflight = []
        t0 = time.perf_counter()
        for i in range(args.iters):
            inflight.append(pipe.predict(image, K, CATEGORIES))
            if len(inflight) >= args.depth:
                jax.block_until_ready(inflight.pop(0))
        for det in inflight:
            jax.block_until_ready(det)
        dt = (time.perf_counter() - t0) / args.iters
        best_tp = dt if best_tp is None else min(best_tp, dt)

    # STREAMING DRIVER (round-4 VERDICT item 1): predict_stream runs the
    # fused program over chunk-of-K image stacks via lax.scan — one
    # upload + one relay sync + one small readback per chunk, so the
    # per-image sync cost is 1/chunk by construction. Distinct images
    # (fresh host prep each) over a >=32-image stream; best-of-3 rounds.
    stream_s = None
    stream_chunk = None
    if args.stream:
        imgs = [
            (rng.randint(0, 256, (h, w, 3)).astype(np.uint8), K)
            for _ in range(args.stream)
        ]
        for chunk in [int(c) for c in str(args.chunk).split(",")]:
            # compile the chunk program (a padded-tail chunk never
            # appears when stream % chunk == 0 — same trace throughout)
            for _ in pipe.predict_stream(iter(imgs[:chunk]),
                                         CATEGORIES, chunk=chunk):
                pass
            best_c = None
            for _ in range(3):
                t0 = time.perf_counter()
                n_out = sum(
                    1 for _ in pipe.predict_stream(iter(imgs), CATEGORIES,
                                                   chunk=chunk)
                )
                dt = (time.perf_counter() - t0) / n_out
                best_c = dt if best_c is None else min(best_c, dt)
            print(f"stream chunk-{chunk}: {best_c * 1e3:.1f} ms/img "
                  f"({1 / best_c:.2f} img/s)", flush=True)
            if stream_s is None or best_c < stream_s:
                stream_s, stream_chunk = best_c, chunk

    # Device floor: the fused detect+postprocess+lift program timed with
    # the chained scalar-carry protocol (one dispatch + one scalar read per
    # round) — what predict() costs with the relay taken out. Round-4
    # measurement: 123.4 ms/img = 8.10 img/s (vs ~126 ms for the old
    # two-program floor), with the same-session A/B showing the fused path
    # saves ~66 ms of blocking p50 (one sync + one canvas upload).
    import jax.numpy as jnp

    from tools.bench_util import bench_loop

    canvas, (nh, nw), scale = pipe._prep_lift_canvas(image)
    text = pipe._text_device_inputs(CATEGORIES)

    def fused_fn(canvas_b, gp, rp, K_, hw, ratio, *rest):
        (ids, tmask, smask, pids, biases, span_m, span_v) = rest
        return pipe._fused_fn(gp, rp, canvas_b, K_, hw, ratio, None,
                              ids, tmask, smask, pids, biases,
                              span_m, span_v)

    floor_s = bench_loop(
        fused_fn, jnp.asarray(canvas)[None],
        lambda det: det.scores[0, 0],
        iters=10, rounds=3, label="fused graph (chained device floor)",
        args=(pipe.gdino_params, pipe.rcnn_params,
              jnp.asarray(K, jnp.float32)[None],
              jnp.asarray([[nh, nw]], jnp.int32),
              jnp.asarray([1.0 / scale], jnp.float32),
              text[0], text[1], text[2], text[3],
              pipe._swin_rel_biases(), text[4], text[5]),
    )

    p50 = float(np.percentile(times, 50))
    mean = float(times.mean())
    # Headline: best sustained per-image time under either protocol — the
    # repo's best-of convention (CLAUDE.md: the relay adds random 100-250 ms
    # completion-latency tails that grow over a sustained run; best-of is
    # the only stable estimator on this link). The chained fused-graph
    # device floor above bounds it from below.
    best = min(best_tp, float(times.min()))
    if stream_s is not None:
        best = min(best, stream_s)
    img_per_s = 1.0 / best
    stream_txt = (
        f"stream chunk-{stream_chunk} {stream_s * 1e3:.1f} ms/img "
        f"({1 / stream_s:.2f} img/s) | " if stream_s else ""
    )
    print(
        f"lift e2e @{h}x{w} (gdino {pipe.gdino_size}^2, rcnn "
        f"{cfg.model.backbone.square_pad}^2, {len(CATEGORIES)} cats): "
        f"best {best * 1e3:.1f} ms/img | {stream_txt}"
        f"pipelined depth-{args.depth} {best_tp * 1e3:.1f} ms | "
        f"blocking p50 {p50 * 1e3:.1f} ms, "
        f"mean {mean * 1e3:.1f} ms | fused-graph device floor "
        f"{floor_s * 1e3:.1f} ms = {1 / floor_s:.2f} img/s",
        flush=True,
    )
    out = {
        "metric": "ovmono3d_lift_e2e_openvocab_img_per_s",
        "value": round(img_per_s, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / REF_GPU_IMG_PER_S, 3),
        "best_ms_per_img": round(best * 1e3, 2),
        "pipelined_ms_per_img": round(best_tp * 1e3, 2),
        "blocking_p50_latency_ms": round(p50 * 1e3, 2),
        "fused_device_floor_ms": round(floor_s * 1e3, 2),
    }
    if stream_s is not None:
        out["stream_ms_per_img"] = round(stream_s * 1e3, 2)
        out["stream_chunk"] = stream_chunk
        out["stream_images"] = args.stream
    print(json.dumps(out))


if __name__ == "__main__":
    main()

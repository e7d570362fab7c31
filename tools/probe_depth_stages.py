#!/usr/bin/env python
"""Depth-Pro in-situ stage attribution at the released 1536² geometry.

Round-3 VERDICT weak item 4: Depth-Pro was the last unprofiled hot model —
230.5 ms @1536² bf16 attributed only "by elimination". This times each
stage of models/depth.py (refactored into apply(method=...)-addressable
stages whose composition IS __call__) with the chained scalar-carry
protocol, and reports XLA cost-analysis FLOPs per stage so each number
carries its achieved TF/s against the v5e bf16 peak (~197 TF/s):

  pyramid   image pyramid resize + overlapping crop split (35 crops)
  patches   the batched 35-crop ViT-L/16@384 pass (the FLOPs bulk)
  image     global-view ViT-L pass (1 crop)
  fov       FOV-encoder ViT-L pass (1 crop)
  decode    merge/reassembly + neck + DPT fusion + heads
  full      the composed forward (sanity: ~= sum of the stages)

Reference comparison: the reference runs Depth-Pro fp16 per image on GPU
(/root/reference/tools/ovmono3d_geo.py:266-297); no published anchor.
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

PEAK_TFS = 197.0  # v5e bf16


def _flops(fn, *args) -> float | None:
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1536)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--dtype", default="bf16", choices=("bf16", "f32"))
    ap.add_argument("--quant", default="none", choices=("none", "int8"),
                    help="A/B the W8A8 dynamic-quant serving path "
                         "(ops/quant.py) in the ViT trunks")
    args = ap.parse_args()

    from ovmono3d_tpu.models.depth import DepthPro, _resize
    from tools.bench_util import bench_loop

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = DepthPro(dtype=dtype, quant=args.quant)
    H = args.size
    img = jnp.asarray(
        np.random.RandomState(0).rand(1, H, H, 3).astype(np.float32))
    print(f"init DepthPro @{H}^2 {args.dtype}", flush=True)
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    print(f"init: {time.time()-t0:.0f}s", flush=True)

    E = model.encoder_size

    # Stage inputs (device-resident, produced once).
    def prep(p, im):
        patches, _ = model.apply(p, im, method=DepthPro.pyramid_patches)
        return patches

    patches = jax.jit(prep)(params, img)
    counts = model.apply(params, img, method=DepthPro.pyramid_patches)[1]
    global_img = jax.jit(lambda im: _resize(im, (E, E)))(img)
    enc = jax.jit(lambda p, x: model.apply(
        p, x, method=DepthPro.encode_patches))(params, patches)
    img_feat = jax.jit(lambda p, x: model.apply(
        p, x, method=DepthPro.encode_image))(params, global_img)
    fov_feat = jax.jit(lambda p, x: model.apply(
        p, x, method=DepthPro.encode_fov_trunk))(params, global_img)
    jax.block_until_ready((patches, enc, img_feat, fov_feat))
    print(f"patches: {patches.shape}, counts {counts}", flush=True)

    results = {}

    def stage(name, fn, feed, probe, fargs):
        sec = bench_loop(fn, feed, probe, iters=args.iters,
                         rounds=args.rounds, label=name, args=fargs)
        fl = _flops(fn, feed, *fargs)
        tfs = fl / sec / 1e12 if fl else None
        results[name] = {
            "ms": round(sec * 1e3, 2),
            "gflops": round(fl / 1e9, 1) if fl else None,
            "tf_s": round(tfs, 1) if tfs else None,
            "pct_peak": round(100 * tfs / PEAK_TFS, 1) if tfs else None,
        }
        print(f"{name:>8}: {results[name]}", flush=True)

    stage("pyramid",
          lambda im, p: model.apply(p, im,
                                    method=DepthPro.pyramid_patches)[0],
          img, lambda o: jnp.sum(o.astype(jnp.float32)), (params,))
    stage("patches",
          lambda x, p: model.apply(p, x, method=DepthPro.encode_patches),
          patches, lambda o: o["last_feat"][0, 0, 0, 0], (params,))
    stage("image",
          lambda x, p: model.apply(p, x, method=DepthPro.encode_image),
          global_img, lambda o: o[0, 0, 0, 0], (params,))
    stage("fov",
          lambda x, p: model.apply(p, x, method=DepthPro.encode_fov_trunk),
          global_img, lambda o: o[0, 0, 0, 0], (params,))

    def decode_fn(last, p, enc_rest, imf, fvf):
        e = dict(enc_rest, last_feat=last)
        out = model.apply(p, e, imf, fvf, 1, tuple(counts),
                          method=DepthPro.decode_features)
        return out["canonical_inverse_depth"]

    enc_rest = {k: v for k, v in enc.items() if k != "last_feat"}
    stage("decode", decode_fn, enc["last_feat"],
          lambda o: o[0, 0, 0], (params, enc_rest, img_feat, fov_feat))

    stage("full",
          lambda im, p: model.apply(p, im),
          img, lambda o: o["canonical_inverse_depth"][0, 0, 0], (params,))

    total = sum(v["ms"] for k, v in results.items() if k != "full")
    print(json.dumps({
        "metric": "depth_pro_stage_split",
        "size": H,
        "dtype": args.dtype,
        "stages": results,
        "stage_sum_ms": round(total, 1),
    }), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""TPU throughput of the OVMono3D-GEO model stack (SAM + Depth-Pro).

The GEO pipeline (reference tools/ovmono3d_geo.py: SAM ViT-H masks ->
Depth-Pro metric depth -> geometric box fit) is dominated by its two
foundation models; bench.py / bench_gdino.py never measure them. This
benches, with the chained best-of protocol (tools/bench_util.bench_loop):

  - SAM image encoder @1024^2 (windowed + rel-pos ViT, 256-ch neck) at the
    arch given by --sam-arch (vit_h = reference, vit_b for quick runs)
  - SAM prompt/mask decode for a 32-box batch on the cached embedding
    (the per-object cost once the image embedding exists)
  - Depth-Pro @1536^2 (multi-scale patchwork, ViT-L dual encoders + FOV)
    in f32 (numerics-validated) and bf16 (the --depth-bf16 CLI path)

Each model benches alone (params freed between) so the v5e's HBM fits the
f32 ViT-H. Prints one JSON line for the full per-image GEO model cost
(encoder + decode + depth, the --depth-bf16 configuration) like bench.py.

No reference GPU anchor exists for GEO (BASELINE.md publishes none), so
vs_baseline reports against the reference's only throughput anchor
(4.6 img/s GPU for the LIFT pipeline) purely for scale.
"""
from __future__ import annotations

import argparse
import gc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")

REF_GPU_IMG_PER_S = 4.6  # BASELINE.md LIFT anchor (scale only; GEO has none)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sam-arch", default="vit_h",
                    choices=("vit_b", "vit_l", "vit_h"))
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--boxes", type=int, default=32,
                    help="prompt boxes per image for the decode stage")
    ap.add_argument("--quant", default="none", choices=("none", "int8"),
                    help="A/B the W8A8 dynamic-quant serving path "
                         "(ops/quant.py) in the SAM/Depth-Pro ViT trunks")
    ap.add_argument("--gelu", default="erf", choices=("erf", "tanh"),
                    help="A/B the tanh approximate-gelu serving epilogue "
                         "(models/vit.py Mlp.gelu — erf costs ~1.2 ms per "
                         "ViT-L fc1 fusion, tanh is free)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny models + sizes: CPU plumbing check only")
    args = ap.parse_args()

    from ovmono3d_tpu.models.backbones import VIT_PRESETS
    from ovmono3d_tpu.models.depth import DepthPro
    from ovmono3d_tpu.models.sam import SamSegmenter
    from ovmono3d_tpu.models.vit import VisionTransformer
    from tools.bench_util import bench_loop

    S_SAM, S_DEPTH = 1024, 1536
    # encoder_global_attn_indexes per arch (tools/ovmono3d_geo.py:248-259)
    arch = {
        "vit_b": dict(embed_dim=768, depth=12, num_heads=12,
                      global_blocks=(2, 5, 8, 11)),
        "vit_l": dict(embed_dim=1024, depth=24, num_heads=16,
                      global_blocks=(5, 11, 17, 23)),
        "vit_h": dict(embed_dim=1280, depth=32, num_heads=16,
                      global_blocks=(7, 15, 23, 31)),
    }[args.sam_arch]
    depth_kwargs: dict = {}
    if args.smoke:
        S_SAM, S_DEPTH = 128, 192
        arch = dict(embed_dim=32, depth=2, num_heads=2, global_blocks=(1,))
        depth_kwargs = dict(encoder_size=48, vit_dim=32, vit_depth=2,
                            vit_heads=2, scaled_dims=(32, 32, 16),
                            hook_ids=(1, 0), hook_dims=(16, 16),
                            fusion_dim=16)
        args.iters, args.rounds = 2, 1
    rng = np.random.RandomState(0)
    results = {}

    # ---- SAM image encoder
    enc = VisionTransformer(use_depth_fusion=False, quant=args.quant,
                            gelu=args.gelu,
                            **{**VIT_PRESETS["sam"], **arch})
    img = jnp.asarray(rng.rand(1, S_SAM, S_SAM, 3), jnp.float32)
    t0 = time.time()
    enc_params = jax.jit(enc.init)(jax.random.PRNGKey(0), img)
    print(f"sam encoder init: {time.time() - t0:.1f}s", flush=True)
    results["sam_encoder"] = bench_loop(
        lambda im, p: enc.apply(p, im)["last_feat"],
        img, lambda out: out[0, 0, 0, 0],
        iters=args.iters, rounds=args.rounds,
        label=f"SAM {args.sam_arch} encoder @{S_SAM}^2", args=(enc_params,),
    )
    print(f"sam encoder: {results['sam_encoder'] * 1e3:.1f} ms", flush=True)
    del enc_params
    gc.collect()

    # ---- SAM prompt/mask decode (cached embedding, B boxes)
    seg = SamSegmenter()
    g = S_SAM // 16
    embed = jnp.asarray(rng.rand(1, g, g, 256), jnp.float32)
    pts = rng.rand(args.boxes, 2, 2) * S_SAM
    boxes = jnp.asarray(
        np.concatenate([pts.min(1), pts.max(1)], -1), jnp.float32
    )  # xyxy
    seg_params = jax.jit(seg.init)(
        jax.random.PRNGKey(1), embed, jnp.zeros((1, 4)), float(S_SAM)
    )
    emb_t = jnp.tile(embed, (args.boxes, 1, 1, 1))
    results["sam_decode"] = bench_loop(
        lambda e, p, b: seg.apply(p, e, b, float(S_SAM)),
        emb_t, lambda out: out[0].reshape(-1)[0],
        iters=args.iters * 4, rounds=args.rounds,
        label=f"SAM decode x{args.boxes} boxes", args=(seg_params, boxes),
    )
    print(f"sam decode ({args.boxes} boxes): "
          f"{results['sam_decode'] * 1e3:.1f} ms", flush=True)
    del seg_params, emb_t
    gc.collect()

    # ---- Depth-Pro
    dimg = jnp.asarray(rng.rand(1, S_DEPTH, S_DEPTH, 3), jnp.float32)
    for dt_name, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        model = DepthPro(dtype=dtype, quant=args.quant, gelu=args.gelu,
                         **depth_kwargs)
        t0 = time.time()
        params = jax.jit(model.init)(jax.random.PRNGKey(2), dimg)
        print(f"depth_pro {dt_name} init: {time.time() - t0:.1f}s",
              flush=True)
        results[f"depth_pro_{dt_name}"] = bench_loop(
            lambda im, p: model.apply(p, im)["canonical_inverse_depth"],
            dimg, lambda out: out.reshape(-1)[0],
            iters=args.iters, rounds=args.rounds,
            label=f"Depth-Pro @{S_DEPTH}^2 {dt_name}", args=(params,),
        )
        print(f"depth_pro {dt_name}: "
              f"{results[f'depth_pro_{dt_name}'] * 1e3:.1f} ms", flush=True)
        del params
        gc.collect()

    total = (results["sam_encoder"] + results["sam_decode"]
             + results["depth_pro_bf16"])
    print("\n--- GEO model stack (ms/image) ---")
    for k, v in results.items():
        print(f"{k:<18} {v * 1e3:8.1f}")
    print(f"{'total (bf16 depth)':<18} {total * 1e3:8.1f}")
    print(json.dumps({
        "metric": f"geo_models_{args.sam_arch}_img_per_s",
        "value": round(1.0 / total, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(1.0 / total / REF_GPU_IMG_PER_S, 3),
        "sam_encoder_ms": round(results["sam_encoder"] * 1e3, 1),
        "sam_decode_ms": round(results["sam_decode"] * 1e3, 1),
        "depth_pro_bf16_ms": round(results["depth_pro_bf16"] * 1e3, 1),
        "depth_pro_f32_ms": round(results["depth_pro_f32"] * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
